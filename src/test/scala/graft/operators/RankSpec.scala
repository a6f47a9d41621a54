package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[Rank]] — the two-pass distributed rank/ntile — must be VALUE-identical
  * to the single-partition window spelling on any total order; the window
  * form is the executable specification. */
class RankSpec extends SparkSpec {

  private def custFrame = {
    import graft.sources.Tables
    Tables.table(spark, sf001, "orders").groupBy("o_custkey")
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("c"))
  }

  test("rowNumbered matches the global window rank + running sum") {
    val sp = custFrame.localCheckpoint(true)
    val order = Seq(col("c").desc, col("o_custkey"))
    val got = Rank.rowNumbered(sp, order, rankCol = "r", sumOf = Some("c"),
        cumCol = "cum", totCol = "tot", nCol = "n")
      .select(col("o_custkey"), col("r"), col("cum"), col("tot"), col("n"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4))).sortBy(_._1)
    val w = Window.orderBy(order: _*)
    val cw = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n = sp.count()
    val tot = sp.agg(sum("c")).head.getLong(0)
    val want = sp.withColumn("r", row_number().over(w).cast("long"))
      .withColumn("cum", sum("c").over(cw))
      .select(col("o_custkey"), col("r"), col("cum"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), tot, n))
      .sortBy(_._1)
    assert(got.length == want.length && got.length > 100)
    assert(got.sameElements(want))
  }

  test("ntiled matches window ntile for k = 3, 7, 10 (remainder buckets)") {
    val sp = custFrame.localCheckpoint(true)
    val order = Seq(col("c"), col("o_custkey"))
    for (k <- Seq(3, 7, 10)) {
      val got = Rank.ntiled(sp, order, k, "dc")
        .select(col("o_custkey"), col("dc"))
        .collect().map(x => (x.getLong(0), x.getInt(1))).sortBy(_._1)
      val want = sp.withColumn("dc", ntile(k).over(Window.orderBy(order: _*)))
        .select(col("o_custkey"), col("dc"))
        .collect().map(x => (x.getLong(0), x.getInt(1))).sortBy(_._1)
      assert(got.sameElements(want), s"k=$k diverges from window ntile")
    }
  }

  test("ntiled with fewer rows than buckets assigns bucket = rank") {
    import spark.implicits._
    val tiny = Seq((1L, 10L), (2L, 30L), (3L, 20L)).toDF("id", "v")
    val got = Rank.ntiled(tiny, Seq(col("v"), col("id")), 10, "dc")
      .select(col("id"), col("dc"))
      .collect().map(x => (x.getLong(0), x.getInt(1))).toMap
    assert(got == Map(1L -> 1, 3L -> 2, 2L -> 3))
  }

  test("rowNumbered running sums are exact for NEGATIVE values too") {
    import spark.implicits._
    // the per-partition sum must be a real sum, not max-of-running-sum —
    // a mixed-sign column whose running sum peaks mid-partition is the
    // case that distinguishes them
    val df = (1 to 200).map(i =>
      (i.toLong, if (i % 3 == 0) -2L * i else i.toLong)).toDF("id", "v")
    val got = Rank.rowNumbered(df, Seq(col("id")), rankCol = "r",
        sumOf = Some("v"), cumCol = "cum", totCol = "tot", partitions = 8)
      .select(col("id"), col("cum"), col("tot"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .sortBy(_._1)
    val w = Window.orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = df.agg(sum("v")).head.getLong(0)
    val want = df.withColumn("cum", sum("v").over(w))
      .select(col("id"), col("cum"))
      .collect().map(x => (x.getLong(0), x.getLong(1), tot)).sortBy(_._1)
    assert(got.sameElements(want))
  }

  test("rowNumbered spans partitions: ranks are contiguous across the range split") {
    val sp = custFrame
    val ranked = Rank.rowNumbered(sp, Seq(col("c"), col("o_custkey")),
      rankCol = "r", partitions = 8)
    val rs = ranked.select("r").collect().map(_.getLong(0)).sorted
    assert(rs.head == 1L && rs.last == rs.length.toLong)
    assert(rs.toSet.size == rs.length) // dense, no duplicates across splits
  }
}
