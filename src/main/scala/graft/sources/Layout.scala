package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-layout maintenance for parquet directories — the ops side of
  * running a 100 TB lakehouse. Small files are the classic failure mode of
  * incremental pipelines (every micro-batch/block appends a few files;
  * after a month the listing, scheduling, and footer-read overhead dwarfs
  * the data), and the fix is periodic compaction into scan-sized files.
  */
object Layout {

  // listFiles() returns null (not empty) for unreadable or vanished dirs —
  // surface those as empty rather than NPE mid-walk
  private def children(f: java.io.File): Seq[java.io.File] =
    Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty)

  private def requireDir(dir: String): Unit =
    require(new java.io.File(dir).isDirectory,
      s"not a readable directory: $dir")

  /** Total on-disk bytes of a parquet directory's data files. */
  def dataBytes(dir: String): Long = {
    requireDir(dir)
    def walk(f: java.io.File): Long =
      if (f.isDirectory) children(f).map(walk).sum
      else if (f.getName.endsWith(".parquet")) f.length
      else 0L
    walk(new java.io.File(dir))
  }

  /** Number of parquet data files under `dir` (recursive). */
  def dataFiles(dir: String): Int = {
    requireDir(dir)
    def walk(f: java.io.File): Int =
      if (f.isDirectory) children(f).map(walk).sum
      else if (f.getName.endsWith(".parquet")) 1 else 0
    walk(new java.io.File(dir))
  }

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
}
