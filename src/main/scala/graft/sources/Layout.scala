package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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
}
