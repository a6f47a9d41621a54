package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer: `runMain graft.Time q_x q_y` runs each named
  * query (after one warmup at sf0.001) against SPARK_GRAFT_SF_DIR and
  * prints per-run seconds — the iteration loop for chasing one query's
  * regression without paying a full Bench pass. */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    // warmup against the small fixture when present, else the timed dir
    // itself — a hardcoded warmup path would crash on any other layout
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      if (java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get("/root/testdata/sf0.001")))
        "/root/testdata/sf0.001"
      else sfDir)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // match Bench: generated classes survive across queries/reps
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { q =>
      SparkEntry.queries(q)(spark, warmDir).count() // warmup
      (1 to reps).foreach { r =>
        // mirror Bench's isolation: drop persisted blocks (iterative
        // queries localCheckpoint per round) and take a full GC before
        // the timed window, or later reps absorb earlier reps' storage
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(q)(spark, sfDir).count()
        println(f"TIME $q run$r ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }
    spark.stop()
  }
}
