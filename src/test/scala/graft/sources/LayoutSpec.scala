package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("compact merges a many-small-files layout into few files, same rows") {
    val dir = java.nio.file.Files.createTempDirectory("layout").toString
    // simulate 16 micro-batch appends of a block each
    (1L to 16L).toDF("b").repartition(16)
      .withColumn("v", col("b") * 10)
      .write.mode("overwrite").parquet(s"$dir/in")
    assert(Layout.dataFiles(s"$dir/in") >= 8)

    val n = Layout.compact(spark, s"$dir/in", s"$dir/out",
      targetFileBytes = 1L << 30)
    assert(n === 1)
    assert(Layout.dataFiles(s"$dir/out") === 1)
    val in = spark.read.parquet(s"$dir/in").as[(Long, Long)].collect().toSet
    val out = spark.read.parquet(s"$dir/out").as[(Long, Long)].collect().toSet
    assert(out === in)
  }

  test("target size controls output file count; shuffle variant balances") {
    val dir = java.nio.file.Files.createTempDirectory("layout2").toString
    (1L to 1000L).toDF("b").repartition(20)
      .write.mode("overwrite").parquet(s"$dir/in")
    val bytes = Layout.dataBytes(s"$dir/in")
    val n = Layout.compact(spark, s"$dir/in", s"$dir/out",
      targetFileBytes = bytes / 3, shuffle = true)
    assert(n === 3 || n === 4, s"n=$n") // ceil(bytes / floor(bytes/3))
    assert(Layout.dataFiles(s"$dir/out") === n)
    assert(spark.read.parquet(s"$dir/out").count() === 1000L)
  }
}
