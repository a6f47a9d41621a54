package graft

/** Driver-contract smoke: flagship entry returns rows; approx-distinct
  * (no-oracle) is bounded against the exact count. */
class EntrySpec extends SparkSpec {

  test("entry (flagship) returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("approx_count_distinct within 5% of exact per event_type") {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.table(spark, sf001, "events")
    val approx = SparkEntry.queries("q_approx_distinct")(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy("event_type").agg(countDistinct("user_id").as("du"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k) - e).toDouble / e < 0.05, s"$k: ${approx(k)} vs $e")
    }
  }

  test("csv and json round-trip with schema inference (ingest pipes)") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graftio").toString
    val df = spark.range(5).selectExpr("id", "concat('n', id) AS name", "id * 1.5 AS v")
    df.write.option("header", "true").csv(s"$dir/csv")
    df.write.json(s"$dir/json")
    val csv = spark.read.option("header", "true").option("inferSchema", "true").csv(s"$dir/csv")
    val json = spark.read.json(s"$dir/json")
    assert(csv.count() == 5 && json.count() == 5)
    assert(csv.schema("v").dataType.typeName == "double")
    assert(json.schema("id").dataType.typeName == "long")
  }
}
