package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print plans for named queries. Env knobs:
  *  - SPARK_GRAFT_EXPLAIN_SF: data dir (default sf0.001)
  *  - SPARK_GRAFT_EXPLAIN_MODE: "formatted" (default) or "simple"
  *  - SPARK_GRAFT_EXPLAIN_CHARS: truncation (default 20000)
  *  - SPARK_GRAFT_EXPLAIN_CPUS: master local[n] (default 4; use the bench
  *    core count when the plan under inspection is parallelism-sensitive,
  *    e.g. the adaptive Spread repartitions)
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_SF", "/root/testdata/sf0.001")
    val mode = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_MODE", "formatted")
    val chars = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_CHARS", "20000").toInt
    args.foreach { q =>
      println(s"===== $q =====")
      val df = graft.queries.Queries.all(q)(spark, sf)
      val txt =
        if (mode == "simple") df.queryExecution.executedPlan.toString
        else df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString(mode))
      println(txt.take(chars))
    }
    spark.stop()
  }
}
