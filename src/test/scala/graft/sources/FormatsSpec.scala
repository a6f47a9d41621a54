package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Storage formats beyond parquet/csv/json: ORC round-trip (the other
  * columnar format big estates carry), line-delimited text, and binaryFile
  * (the raw-payload ingestion path multimodal pipelines start from). */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  test("ORC round-trips schema and values, with predicate pushdown") {
    val dir = Files.createTempDirectory("graftorc").toString
    val df = Tables.table(spark, sf001, "nation")
    df.write.orc(s"$dir/nation")
    val back = spark.read.orc(s"$dir/nation")
    assert(back.schema == df.schema)
    assert(back.count() == df.count())
    val filtered = back.filter(col("n_regionkey") === 0)
    assert(filtered.count() == df.filter(col("n_regionkey") === 0).count())
    // ORC scans support pushdown like parquet — the filter must reach the scan
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan)
  }

  test("csv and json write→read round-trips preserve values (csv types via header+inference)") {
    val dir = Files.createTempDirectory("fmtrt").toString
    val df = Seq((1L, "a,b", 2.5), (2L, "c\"d", -1.0), (3L, null, 0.0))
      .toDF("id", "s", "v")
    // csv: delimiter and quote characters in data must survive quoting
    df.write.option("header", "true").csv(s"$dir/c")
    val c = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$dir/c")
    assert(c.as[(Long, String, Double)].collect().toSet ===
      df.as[(Long, String, Double)].collect().toSet)
    // json: self-describing values, null field absent from its record
    df.write.json(s"$dir/j")
    val j = spark.read.json(s"$dir/j")
      .select(col("id"), col("s"), col("v")) // json reader orders fields alphabetically
    assert(j.as[(Long, String, Double)].collect().toSet ===
      df.as[(Long, String, Double)].collect().toSet)
  }

  test("text source reads line-delimited corpora as a value column") {
    val dir = Files.createTempDirectory("grafttext").toString
    Seq("line one", "line two", "line three").toDF("value")
      .coalesce(1).write.text(s"$dir/t")
    val back = spark.read.text(s"$dir/t")
    assert(back.columns.toSeq == Seq("value"))
    assert(back.as[String].collect().toSet ==
      Set("line one", "line two", "line three"))
  }

  test("PERMISSIVE json ingestion captures malformed records instead of failing") {
    val dir = Files.createTempDirectory("fmtbad").toString
    Files.write(java.nio.file.Paths.get(dir, "in.json"), java.util.Arrays.asList(
      """{"id": 1, "v": "ok"}""",
      """{"id": 2, "v": """,                 // truncated — malformed
      """{"id": 3, "v": "also ok"}"""))
    // Spark refuses projections touching ONLY the corrupt column on a raw
    // json scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache the parse first
    val df = spark.read
      .schema("id LONG, v STRING, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(s"$dir/in.json")
      .cache()
    try {
      val good = df.filter(col("_corrupt_record").isNull)
        .select("id").as[Long].collect().toSet
      val bad = df.filter(col("_corrupt_record").isNotNull)
        .select("_corrupt_record").as[String].collect()
      assert(good === Set(1L, 3L))
      // the raw malformed line is preserved for quarantine/debugging
      assert(bad.length == 1 && bad.head.contains(""""id": 2"""))
    } finally df.unpersist()
  }

  test("binaryFile source exposes payload bytes + metadata for media ingestion") {
    val dir = Files.createTempDirectory("graftbin").toString
    val payload = Array[Byte](1, 2, 3, 4, 5)
    Files.write(java.nio.file.Paths.get(dir, "blob.bin"), payload)
    val back = spark.read.format("binaryFile").load(dir)
    val row = back.select("path", "length", "content").collect().head
    assert(row.getAs[Long]("length") == 5L)
    assert(row.getAs[Array[Byte]]("content").toSeq == payload.toSeq)
    assert(row.getAs[String]("path").endsWith("blob.bin"))
  }
}
