package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    args.foreach { q =>
      println(s"===== $q =====")
      println(graft.queries.Queries.all(q)(spark, sf).queryExecution.executedPlan.toString.take(
        sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_CHARS", "3500").toInt))
    }
    spark.stop()
  }
}
