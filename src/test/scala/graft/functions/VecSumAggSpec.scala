package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Unit contract of the vector-sum buffer (the Spark-side train
  * equivalence lives in IvfSpec; these pin the aggregator algebra). */
class VecSumAggSpec extends AnyFunSuite {

  private val agg = new VecSumAgg

  private def fold(rows: Seq[Seq[Float]]): Array[Double] =
    rows.foldLeft(agg.zero)(agg.reduce)

  test("buffer = [n, elementwise double sums]; mean = sum/n reproduces " +
      "the per-coordinate average") {
    val rows = Seq(Seq(1.0f, 2.0f), Seq(3.0f, -1.0f), Seq(0.5f, 0.5f))
    val buf = fold(rows)
    assert(buf(0) === 3.0)
    assert(buf(1) === 4.5 && buf(2) === 1.5)
    assert(buf(1) / buf(0) === 1.5 && buf(2) / buf(0) === 0.5)
  }

  test("merge is elementwise and order-independent; empty buffers are " +
      "identities") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(40)(Seq.fill(5)(rnd.nextFloat() - 0.5f))
    val whole = fold(rows)
    val (a, b) = rows.splitAt(17)
    val merged = agg.merge(agg.merge(agg.zero, fold(a)),
      agg.merge(fold(b), agg.zero))
    assert(merged.toSeq === whole.toSeq)
  }

  test("ragged rows are rejected by name, in reduce and merge") {
    val e1 = intercept[IllegalArgumentException] {
      agg.reduce(fold(Seq(Seq(1.0f, 2.0f))), Seq(1.0f))
    }
    assert(e1.getMessage.contains("ragged"))
    val e2 = intercept[IllegalArgumentException] {
      agg.merge(fold(Seq(Seq(1.0f, 2.0f))), fold(Seq(Seq(1.0f))))
    }
    assert(e2.getMessage.contains("ragged"))
    val e3 = intercept[IllegalArgumentException] {
      agg.reduce(agg.zero, Seq.empty[Float])
    }
    assert(e3.getMessage.contains("empty"))
  }
}
