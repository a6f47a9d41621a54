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
