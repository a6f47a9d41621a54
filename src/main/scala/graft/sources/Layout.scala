package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout maintenance for parquet directories — the ops side of
  * running a 100 TB lakehouse. Small files are the classic failure mode of
  * incremental pipelines (every micro-batch/block appends a few files;
  * after a month the listing, scheduling, and footer-read overhead dwarfs
  * the data), and the fix is periodic compaction into scan-sized files.
  */
object Layout {

  /** All parquet data files under `dir`, recursive — the single walk both
    * metrics derive from. listFiles() returns null (not empty) for
    * unreadable or vanished dirs; surface those as empty rather than NPE
    * mid-walk, and reject a nonexistent root up front (a silent 0 would
    * make compact() compute n=1 and fail later, confusingly, in the
    * Spark read). */
  private def parquetFiles(dir: String): Seq[java.io.File] = {
    require(new java.io.File(dir).isDirectory,
      s"not a readable directory: $dir")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty).flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f)
      else Seq.empty
    walk(new java.io.File(dir))
  }

  /** Total on-disk bytes of a parquet directory's data files. */
  def dataBytes(dir: String): Long = parquetFiles(dir).map(_.length).sum

  /** Depth-first recursive delete (files before their parents) — the one
    * shared spelling of the walk-reverse-delete idiom (Vacuum sweeps,
    * query scratch wipes). No-op on a nonexistent path. */
  def deleteRecursively(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      } finally walk.close()
    }

  /** Number of parquet data files under `dir` (recursive). */
  def dataFiles(dir: String): Int = parquetFiles(dir).size

  /** Compact a parquet directory to ~`targetFileBytes` files: reads, then
    * rewrites to `outDir` with ceil(bytes/target) output files.
    *
    * `coalesce` (default) merges partitions WITHOUT a shuffle — each
    * output task reads several input files sequentially, which is exactly
    * what compaction wants; set `shuffle=true` only when the input is
    * skewed enough (a few huge files among many tiny ones) that balanced
    * outputs are worth one repartition pass. On a real deployment this
    * runs per partition directory (dt=…) so compaction parallelizes over
    * partitions and never rewrites cold ones. */
  def compact(spark: SparkSession, dir: String, outDir: String,
      targetFileBytes: Long = 128L << 20, shuffle: Boolean = false): Int = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val bytes = dataBytes(dir)
    val n = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(dir)
    val out = if (shuffle) df.repartition(n) else df.coalesce(n)
    out.write.mode("overwrite").parquet(outDir)
    n
  }

  /** Spread the low 16 bits of `c` to even bit positions (0,2,4,…,30) —
    * the classic magic-number Morton spreading, one shift-or-mask ladder,
    * all codegen'd bitwise built-ins. */
  private def spread16(c: Column): Column = {
    val x0 = c.cast("bigint").bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Z-order (Morton) value interleaving the low 16 bits of `x`
    * and `y`: bit i of x lands at position 2i, bit i of y at 2i+1.
    * Sorting by z clusters rows that are close in BOTH dimensions, so a
    * 2-D range predicate prunes most files via parquet min/max footers —
    * a single-column sort can only prune along one dimension. The
    * standard multi-dimensional clustering key for lakehouse layouts
    * (Morton 1966; the curve behind Delta/Iceberg Z-ORDER). */
  def zValue(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Range-partition `df` on `key` and sort within partitions — the
    * SORTED-TABLE layout (the lakehouse ORDER BY / sort-key table): every
    * output file covers a disjoint key interval, so any reader that
    * consults min/max metadata (parquet footers, lakehouse manifests)
    * skips whole files on key predicates, and key-merge consumers
    * (as-of joins, range joins) get pre-sorted runs. Boundaries come
    * from Spark's deterministic reservoir sample (seeded by partition
    * index), so output sizes stay balanced under key skew — the reason
    * this beats hash layouts for sorted access. Equal keys land in one
    * partition, making per-file ranges STRICTLY disjoint — the invariant
    * q_sorted_layout pins into its oracled row. One shuffle, the same
    * cost class as any repartition-and-write maintenance pass. */
  def sortedBy(df: DataFrame, partitions: Int, key: Column): DataFrame = {
    require(partitions > 0, "partitions must be positive")
    df.repartitionByRange(partitions, key).sortWithinPartitions(key)
  }

  /** Cluster `df` by the Z-curve over (x, y): one range partition on z
    * (balanced output files from the sampled range bounds) + an in-
    * partition sort — so every output file covers a compact z-interval
    * and its parquet min/max stats prune 2-D range scans. One shuffle,
    * same cost class as any repartition-and-write maintenance pass. */
  def zorderBy(df: DataFrame, partitions: Int, x: Column, y: Column): DataFrame = {
    require(partitions > 0, "partitions must be positive")
    df.withColumn("__z", zValue(x, y))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
