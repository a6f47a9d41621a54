package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Unit contract of the tiled Gram buffer (the Spark-side equivalences —
  * tiled ≡ GramAgg ≡ join through the public API — live in PcaSpec;
  * these pin the aggregator algebra itself). */
class GramTileAggSpec extends AnyFunSuite {

  private val agg = new GramTileAgg

  private def fold(rows: Seq[(Seq[Long], Seq[Long])],
      diag: Boolean = false): Array[Long] =
    rows.foldLeft(agg.zero)((b, v) => agg.reduce(b, (v._1, v._2, diag)))

  test("a diagonal tile over full vectors reproduces GramAgg's buffer " +
      "content (n, sums, products)") {
    val rnd = new scala.util.Random(11)
    val vecs = Seq.fill(25)(Seq.fill(4)(rnd.nextInt(2001).toLong - 1000))
    val tile = fold(vecs.map(v => (v, v)))
    val mono = vecs.foldLeft(new GramAgg().zero)(new GramAgg().reduce)
    // tile layout [li, lj, n, si, sj, p]; mono [dim, n, s, p]
    assert(tile(0) === 4L && tile(1) === 4L)
    assert(tile(2) === mono(1)) // n
    assert(tile.slice(3, 7).toSeq === mono.slice(2, 6).toSeq)  // si = s
    assert(tile.slice(7, 11).toSeq === mono.slice(2, 6).toSeq) // sj = s
    assert(tile.slice(11, 27).toSeq === mono.slice(6, 22).toSeq) // products
  }

  test("diag=true fills ONLY the upper triangle, matching the full " +
      "form's upper triangle exactly (the mirror is the driver's job)") {
    val rnd = new scala.util.Random(17)
    val vecs = Seq.fill(20)(Seq.fill(5)(rnd.nextInt(401).toLong - 200))
    val full = fold(vecs.map(v => (v, v)))
    val half = fold(vecs.map(v => (v, v)), diag = true)
    // header + sums identical
    assert(half.slice(0, 13).toSeq === full.slice(0, 13).toSeq)
    for (i <- 0 until 5; j <- 0 until 5) {
      val p = 13 + i * 5 + j
      if (j >= i) assert(half(p) === full(p), s"upper cell ($i,$j)")
      else assert(half(p) === 0L, s"lower cell ($i,$j) must stay 0")
    }
    // a diagonal flag with unequal block lengths is a caller bug — named
    val e = intercept[IllegalArgumentException] {
      agg.reduce(agg.zero, (Seq(1L, 2L), Seq(3L), true))
    }
    assert(e.getMessage.contains("diag"))
  }

  test("merge is elementwise and order-independent; empty buffers are " +
      "identities") {
    val rnd = new scala.util.Random(23)
    val rows = Seq.fill(30)((Seq.fill(3)(rnd.nextInt(100).toLong),
      Seq.fill(2)(rnd.nextInt(100).toLong)))
    val whole = fold(rows)
    val (a, b) = rows.splitAt(13)
    val merged = agg.merge(agg.merge(agg.zero, fold(a)),
      agg.merge(fold(b), agg.zero))
    assert(merged.toSeq === whole.toSeq)
    val swapped = agg.merge(fold(b), fold(a))
    assert(swapped.toSeq === whole.toSeq)
  }

  test("ragged block lengths are rejected by name, in reduce and merge") {
    val buf = fold(Seq((Seq(1L, 2L), Seq(3L))))
    val e1 = intercept[IllegalArgumentException] {
      agg.reduce(buf, (Seq(1L), Seq(3L), false))
    }
    assert(e1.getMessage.contains("ragged"))
    val other = fold(Seq((Seq(1L), Seq(3L))))
    val e2 = intercept[IllegalArgumentException] {
      agg.merge(fold(Seq((Seq(1L, 2L), Seq(3L)))), other)
    }
    assert(e2.getMessage.contains("ragged"))
    // an empty (trailing) block slice names the ragged contract too
    val e3 = intercept[IllegalArgumentException] {
      agg.reduce(agg.zero, (Seq.empty[Long], Seq(1L), false))
    }
    assert(e3.getMessage.contains("ragged"))
  }

  test("accumulation overflows loudly (addExact), never wraps") {
    val big = Seq(3037000499L) // floor(sqrt(Long.MaxValue)): v*v just fits
    val buf = fold(Seq((big, big)))
    intercept[ArithmeticException] {
      // the product cell is already ~Long.MaxValue; one more row overflows
      agg.reduce(buf, (big, big, false))
    }
  }
}
