package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Direct unit pins for the mergeable Gram buffer: layout, merge
  * associativity across arbitrary splits, ragged rejection, loud
  * overflow. (The Spark-side equivalence to the join-form Gram is
  * PcaSpec's "one-pass GramAgg path ≡ the join-form fallback".) */
class GramAggSpec extends AnyFunSuite {

  private val agg = new GramAgg

  private def fold(vs: Seq[Seq[Long]]): Array[Long] =
    vs.foldLeft(agg.zero)(agg.reduce)

  test("buffer layout: [dim, n, sums, row-major products]") {
    val b = fold(Seq(Seq(1L, 2L), Seq(3L, 4L)))
    assert(b.toSeq === Seq(
      2L, 2L, // dim, n
      4L, 6L, // Σv1, Σv2
      1L * 1 + 3L * 3, 1L * 2 + 3L * 4, // p11 p12
      2L * 1 + 4L * 3, 2L * 2 + 4L * 4)) // p21 p22
  }

  test("merge ≡ single fold for every split point, empties included") {
    val vs = (1 to 7).map(i => Seq(i.toLong, (i * i).toLong, -i.toLong))
    val whole = fold(vs)
    for (cut <- 0 to vs.length) {
      val merged = agg.merge(fold(vs.take(cut)), fold(vs.drop(cut)))
      assert(merged.toSeq === whole.toSeq, s"cut=$cut")
    }
  }

  test("ragged rows are rejected by name") {
    val ex = intercept[IllegalArgumentException] {
      fold(Seq(Seq(1L, 2L), Seq(1L)))
    }
    assert(ex.getMessage.contains("ragged"))
    val ex2 = intercept[IllegalArgumentException] {
      agg.merge(fold(Seq(Seq(1L, 2L))), fold(Seq(Seq(1L, 2L, 3L))))
    }
    assert(ex2.getMessage.contains("ragged"))
  }

  test("product-sum overflow fails loudly (addExact), never wraps") {
    val huge = Seq(Seq(3100000000L, 0L), Seq(3100000000L, 0L))
    assertThrows[ArithmeticException](fold(huge))
  }
}
