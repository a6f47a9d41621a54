package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.{Encoders, functions => F}
import org.apache.spark.sql.functions.{col, udaf}

class CmsAggSpec extends SparkSpec {
  import spark.implicits._

  private val words =
    Seq.fill(40)("alpha") ++ Seq.fill(15)("beta") ++ Seq.fill(15)("gamma") ++
      (1 to 30).map(i => s"tail$i")

  private def estimate(sk: Array[Long], term: String, d: Int, w: Int): Long =
    (0 until d).map(j => sk(j * w + CmsAgg.cell(j, term, w))).min

  test("estimates dominate exact counts for every term (never undercount)") {
    val d = 3; val w = 8 // tiny grid -> heavy collisions
    val sk = words.toDF("w").agg(udaf(new CmsAgg(d, w), Encoders.STRING)(col("w")))
      .head.getSeq[Long](0).toArray
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong)
    exact.foreach { case (term, c) =>
      assert(estimate(sk, term, d, w) >= c, s"undercounted $term")
    }
    assert(sk.sum == d.toLong * words.size) // every arrival lands d times
  }

  test("merge is an elementwise sum: split-fold equals whole-fold") {
    val d = 2; val w = 16
    val (l, r) = words.splitAt(37)
    val agg = udaf(new CmsAgg(d, w), Encoders.STRING)
    def sketch(ws: Seq[String]) =
      ws.toDF("w").repartition(4).agg(agg(col("w"))).head.getSeq[Long](0).toArray
    val whole = sketch(words)
    val summed = sketch(l).zip(sketch(r)).map { case (a, b) => a + b }
    assert(whole.toSeq == summed.toSeq)
  }

  test("cell arithmetic matches the Spark SQL md5 formula (the oracle identity)") {
    val terms = Seq("the", "scan", "zzzz", "a", "merge")
    val sqlCells = terms.toDF("w").select(
      F.expr("CAST(conv(substr(md5(concat('2:', w)), 1, 15), 16, 10) AS BIGINT) % 64").as("h"),
      col("w")).collect().map(r => r.getString(1) -> r.getLong(0)).toMap
    terms.foreach { t =>
      assert(CmsAgg.cell(2, t, 64).toLong == sqlCells(t), s"cell mismatch for $t")
    }
  }
}
