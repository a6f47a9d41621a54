package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.{Encoders, functions => F}

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private val agg = new TopKAgg(3)

  test("reduce keeps the k best with (score desc, id asc) order") {
    val buf = Seq(Scored(5.0, 1), Scored(3.0, 2), Scored(1.0, 9), Scored(4.0, 7))
      .foldLeft(agg.zero)(agg.reduce)
    assert(buf.toSeq === Seq(Scored(5.0, 1), Scored(4.0, 7), Scored(3.0, 2)))
  }

  test("equal scores tie-break by ascending id") {
    val buf = Seq(Scored(2.0, 9), Scored(2.0, 3), Scored(2.0, 5), Scored(2.0, 1))
      .foldLeft(agg.zero)(agg.reduce)
    assert(buf.toSeq === Seq(Scored(2.0, 1), Scored(2.0, 3), Scored(2.0, 5)))
  }

  test("merge of two partial buffers equals single-pass reduce") {
    val xs = Seq(Scored(1.0, 1), Scored(9.0, 2), Scored(4.0, 3))
    val ys = Seq(Scored(8.0, 4), Scored(2.0, 5), Scored(6.0, 6))
    val merged = agg.merge(
      xs.foldLeft(agg.zero)(agg.reduce), ys.foldLeft(agg.zero)(agg.reduce))
    val single = (xs ++ ys).foldLeft(agg.zero)(agg.reduce)
    assert(merged.toSeq === single.toSeq)
  }

  test("fewer than k inputs yield all of them, ordered") {
    val buf = Seq(Scored(1.0, 1), Scored(2.0, 2)).foldLeft(agg.zero)(agg.reduce)
    assert(buf.toSeq === Seq(Scored(2.0, 2), Scored(1.0, 1)))
  }

  test("group result is partition-count independent") {
    val rows = (1L to 100L).map(i => ((i % 4).toString, (i % 13).toDouble, i))
    val topk = F.udaf(new TopKAgg(3), Encoders.product[Scored])
    def run(parts: Int) =
      rows.toDF("g", "score", "id").repartition(parts)
        .groupBy("g").agg(topk(F.col("score"), F.col("id")).as("tk"))
        .select(F.col("g"), F.explode(F.col("tk")).as("e"))
        .select("g", "e.score", "e.id")
        .as[(String, Double, Long)].collect().toSet
    assert(run(1) === run(7))
  }
}
