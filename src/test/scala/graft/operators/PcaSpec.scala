package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Power-iteration dominant direction: alignment on planted data,
  * determinism, fixed-point contract, degenerate guard. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  // corpus whose variance lives along (3, 4): points t·(0.3, 0.4) for
  // t in ±{1..4}, plus tiny off-axis jitter so the covariance is full
  // rank (the jitter axis carries ~1e4× less variance)
  private def planted = Seq(
    (1L, Array(0.3f, 0.4f)), (2L, Array(-0.3f, -0.4f)),
    (3L, Array(0.6f, 0.8f)), (4L, Array(-0.6f, -0.8f)),
    (5L, Array(0.9f, 1.2f)), (6L, Array(-0.9f, -1.2f)),
    (7L, Array(0.31f, 0.39f)), (8L, Array(-0.29f, -0.41f))
  ).toDF("vec_id", "embedding")

  test("planted dominant direction is recovered: components in 3:4 " +
      "ratio, max-abs coordinate renormalized to the scale") {
    val v = Pca.dominantDirection(planted, "vec_id", "embedding", iters = 3)
      .orderBy("i").as[(Int, Long)].collect()
    assert(v.map(_._1).toSeq === Seq(1, 2))
    val Array(x1, x2) = v.map(_._2)
    // renorm contract: the max-abs coordinate IS ±scale
    assert(math.max(math.abs(x1), math.abs(x2)) === 1000L)
    // direction ∝ (3,4): x1/x2 = 750/1000 within fixed-point slack
    assert(math.abs(x2) === 1000L)
    assert(math.abs(math.abs(x1) - 750L) <= 3L, s"($x1, $x2)")
    // same sign (both positive or both negative — the direction, not
    // its orientation, is the semantic)
    assert(x1 * x2 > 0)
  }

  test("deterministic across repartitionings") {
    val a = Pca.dominantDirection(planted.repartition(5), "vec_id",
      "embedding", 3).orderBy("i").as[(Int, Long)].collect().toSeq
    val b = Pca.dominantDirection(planted.coalesce(1), "vec_id",
      "embedding", 3).orderBy("i").as[(Int, Long)].collect().toSeq
    assert(a === b)
  }

  test("an all-constant corpus (zero covariance) raises, not NaN/garbage") {
    val const = Seq((1L, Array(0.5f, 0.5f)), (2L, Array(0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      Pca.dominantDirection(const, "vec_id", "embedding", 1)
    }
    assert(ex.getMessage.contains("degenerate"))
  }

  test("matches the same integer recurrence computed locally") {
    // independent reimplementation of the exact arithmetic over the
    // planted corpus — the in-JVM oracle for the driver-side algebra
    val rows = planted.orderBy("vec_id").as[(Long, Array[Float])].collect()
    val qs = rows.map(_._2.map(f => math.floor(f.toDouble * 1000 + 0.5).toLong))
    val n = qs.length.toLong
    val dim = 2
    val s = Array.tabulate(dim)(i => qs.map(_(i)).sum)
    val g = Array.tabulate(dim, dim) { (i, j) =>
      (n * qs.map(q => q(i) * q(j)).sum - s(i) * s(j)) / (n * n)
    }
    var v = Array(1000L, 0L)
    for (_ <- 1 to 3) {
      val w = Array.tabulate(dim)(i => (0 until dim).map(j => g(i)(j) * v(j)).sum)
      val m = w.map(math.abs).max
      v = w.map(x => x * 1000 / m)
    }
    val got = Pca.dominantDirection(planted, "vec_id", "embedding", 3)
      .orderBy("i").as[(Int, Long)].collect().map(_._2).toSeq
    assert(got === v.toSeq)
  }
}
