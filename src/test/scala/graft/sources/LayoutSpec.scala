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

  test("zValue interleaves bits exactly (vs a scalar reference)") {
    def ref(x: Int, y: Int): Long = {
      var z = 0L
      for (i <- 0 until 16)
        z |= (((x >> i) & 1).toLong << (2 * i)) |
          (((y >> i) & 1).toLong << (2 * i + 1))
      z
    }
    val cases = Seq((0, 0), (1, 0), (0, 1), (65535, 65535), (43690, 21845),
      (12345, 54321), (65536 + 7, 3)) // 17-bit x truncates to low 16
    val df = cases.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y")).as("z"))
    df.collect().foreach { r =>
      assert(r.getLong(2) == ref(r.getInt(0) & 0xFFFF, r.getInt(1) & 0xFFFF),
        s"x=${r.getInt(0)} y=${r.getInt(1)}")
    }
  }

  test("zorderBy clusters files into disjoint z-ranges (2-D pruning)") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val df = (0L until 4000L).map(i => (i, (i * 37) % 1000, (i * 91) % 1000))
      .toDF("id", "x", "y")
    Layout.zorderBy(df, 4, col("x"), col("y"))
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 4000L)
    // each output file's [min, max] z-interval must not overlap another's
    // (range partitioning on z guarantees it) — that disjointness is what
    // lets parquet min/max stats prune 2-D range predicates
    val ranges = back
      .select(input_file_name().as("f"),
        Layout.zValue(col("x"), col("y")).as("z"))
      .groupBy("f").agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length >= 3)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, ranges.mkString(","))
      case _ =>
    }
  }

  test("sortedBy plans a range exchange; a metadata skipper needs few files") {
    val dir = java.nio.file.Files.createTempDirectory("sorted").toString
    // skewed keys: half the rows share key 0 — range boundaries come from
    // the sample, so files stay balanced AND the hot key co-locates
    val df = (0L until 8000L).map(i => (if (i % 2 == 0) 0L else i, i))
      .toDF("k", "v")
    val planned = Layout.sortedBy(df, 8, col("k"))
    assert(planned.queryExecution.executedPlan.toString
      .contains("rangepartitioning"), "expected a range exchange")
    planned.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 8000L)
    // per-file [min, max] key ranges are STRICTLY disjoint (equal keys
    // co-locate), so a min/max-consulting reader prunes whole files
    val ranges = back.groupBy(input_file_name().as("f"))
      .agg(min("k").as("lo"), max("k").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length >= 3)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2, ranges.mkString(","))
      case _ =>
    }
    // the skipping arithmetic a manifest-based reader runs: a narrow key
    // predicate's candidate set (files whose range overlaps it) is a
    // strict minority of the layout
    val probe = (5001L, 5400L)
    val needed = ranges.count { case (lo, hi) =>
      hi >= probe._1 && lo <= probe._2 }
    assert(needed >= 1 && needed < ranges.length / 2,
      s"needed=$needed of ${ranges.length}")
    // and rows inside each file arrive key-sorted (the merge-consumer
    // contract). A file can be SPLIT across input partitions, and split
    // read order is not id-ordered across partitions — so the sound
    // check is per (file, input partition): within one, rows come in
    // file order and monotonically_increasing_id increases
    val mono = back
      .withColumn("f", input_file_name())
      .withColumn("pid", spark_partition_id())
      .withColumn("prev", lag("k", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("f", "pid")
          .orderBy(monotonically_increasing_id())))
      .filter(col("prev").isNotNull && col("prev") > col("k"))
    assert(mono.count() == 0L, "rows within a file must be key-sorted")
  }
}
