package graft.sources

import graft.SparkSpec
import java.nio.file.Files

/** JDBC storage round-trip against embedded Derby (the only JDBC engine
  * on the test classpath — stands in for the Postgres-style table
  * storages; the API is engine-agnostic). */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val dbDir = Files.createTempDirectory("graftderby").toString
  private val url = s"jdbc:derby:$dbDir/db;create=true"
  private val opts = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  test("writeJdbc/readJdbc round-trip values and schema") {
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", -0.5))
      .toDF("id", "name", "score")
    Tables.writeJdbc(df, url, "t_round", options = opts)
    val back = Tables.readJdbc(spark, url, "t_round", opts)
    assert(back.columns.map(_.toLowerCase).toSeq == Seq("id", "name", "score"))
    assert(back.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", -0.5)))
  }

  test("append mode accumulates rows") {
    val df = Seq((1L, "x")).toDF("id", "v")
    Tables.writeJdbc(df, url, "t_app", options = opts)
    Tables.writeJdbc(Seq((2L, "y")).toDF("id", "v"), url, "t_app",
      mode = "append", options = opts)
    assert(Tables.readJdbc(spark, url, "t_app", opts).count() == 2)
  }

  test("partitioned read splits into parallel range scans") {
    val df = (0L until 100L).map(i => (i, s"r$i")).toDF("id", "v")
    Tables.writeJdbc(df, url, "t_part", options = opts)
    val back = Tables.readJdbc(spark, url, "t_part", opts ++ Map(
      "partitionColumn" -> "id", "lowerBound" -> "0",
      "upperBound" -> "100", "numPartitions" -> "4"))
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == 100)
  }
}
