package graft.functions

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Direct unit pins for the bottom-k sketch: distinct-k-smallest
  * semantics, merge ≡ single fold over every split, dedup in both paths,
  * and the integer estimator (exact below k, (k−1)·M div u_k above).
  * The Spark-side oracle identity (ORDER BY h LIMIT k + the same div)
  * is q_kmv_overlap's CORRECTNESS row. */
class KmvAggSpec extends AnyFunSuite {

  private def fold(agg: KmvAgg, xs: Seq[Long]): Array[Long] =
    xs.foldLeft(agg.zero)(agg.reduce)

  private def brute(xs: Seq[Long], k: Int): Seq[Long] =
    xs.distinct.sorted.take(k)

  test("sketch = the k smallest DISTINCT values, duplicates collapsed") {
    val rnd = new Random(7)
    val agg = new KmvAgg(16)
    for (trial <- 1 to 50) {
      val n = rnd.nextInt(200)
      // small value range forces real duplicates through reduce()
      val xs = Seq.fill(n)(rnd.nextInt(60).toLong)
      assert(fold(agg, xs).toSeq === brute(xs, 16), s"trial=$trial")
    }
  }

  test("merge ≡ single fold for every split point, empties included") {
    val rnd = new Random(11)
    val agg = new KmvAgg(8)
    val xs = Seq.fill(64)(rnd.nextInt(40).toLong)
    val whole = fold(agg, xs).toSeq
    for (cut <- 0 to xs.length by 4) {
      val merged = agg.merge(fold(agg, xs.take(cut)), fold(agg, xs.drop(cut)))
      assert(merged.toSeq === whole, s"cut=$cut")
    }
  }

  test("merge dedups values present on both sides") {
    val agg = new KmvAgg(8)
    val m = agg.merge(fold(agg, Seq(1L, 3L, 5L)), fold(agg, Seq(3L, 4L, 5L)))
    assert(m.toSeq === Seq(1L, 3L, 4L, 5L))
  }

  test("estimate is EXACT while the set fits the sketch") {
    val agg = new KmvAgg(32)
    val sk = fold(agg, (1L to 20L) ++ (1L to 20L))
    assert(KmvAgg.estimate(sk, 32, 1L << 48) === 20L)
  }

  test("estimator tracks the true cardinality once the sketch spills") {
    // 48-bit-style uniform hashes, k = 256 (the q_kmv_overlap shape):
    // the (k−1)·M div u_k estimate should land within ~4·(1/√k) ≈ 25%
    // of the truth — deterministic under the fixed seed, so pinnable
    val rnd = new Random(42)
    val k = 256
    val m = 1L << 48
    val agg = new KmvAgg(k)
    for (trueN <- Seq(2000, 20000)) {
      val xs = Seq.fill(trueN)(math.abs(rnd.nextLong()) % m).distinct
      val est = KmvAgg.estimate(fold(agg, xs), k, m)
      assert(math.abs(est - xs.length) <= xs.length / 4,
        s"trueN=${xs.length} est=$est")
    }
  }

  test("union of sketches is a valid sketch of the union") {
    // k smallest of (k-smallest(A) ∪ k-smallest(B)) = k smallest of A∪B
    val rnd = new Random(5)
    val agg = new KmvAgg(16)
    for (trial <- 1 to 20) {
      val a = Seq.fill(100)(rnd.nextInt(500).toLong)
      val b = Seq.fill(100)(rnd.nextInt(500).toLong)
      val viaSketches = agg.merge(fold(agg, a), fold(agg, b))
      assert(viaSketches.toSeq === brute(a ++ b, 16), s"trial=$trial")
    }
  }
}
