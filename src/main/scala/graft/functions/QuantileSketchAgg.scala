package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** A serialized, RE-AGGREGATABLE quantile sketch: weighted value points
  * (`weights(i)` is always a power of two — the compaction level), the
  * total count `n` (= Σ weights, exactly), and `err` — the sketch's OWN
  * worst-case rank-error bound, accumulated as the sketch was built.
  * For every value x: |Σ_{items ≤ x} w − #{inputs ≤ x}| ≤ err (and the
  * same for strict <), so any consumer can certify its own estimates. */
final case class QSketch(items: Array[Double], weights: Array[Long],
                         n: Long, err: Long)

/** Mutable compactor state: `lvl0` is a fixed-capacity insert scratch
  * (weight-1 items, O(1) hot-path append); `data`/`offs` hold the
  * compacted levels 1.. flattened (level l ≥ 1 occupies
  * `data[offs(l−1), offs(l))`, every item there weighing `2^l`);
  * `compsL(l)` counts the compactions LEVEL l has fired (its parity
  * picks the kept offset AND drives the pair-charging — see
  * [[QSketchOps]]). */
final case class QBuf(var n: Long, var err: Long, compsL: Array[Long],
                      var fill0: Int, lvl0: Array[Double],
                      data: Array[Double], offs: Array[Int])

/** Shared compactor core for [[QSketchAgg]] / [[QSketchMergeAgg]]. The
  * algorithm is the KLL compactor shape (Karnin–Lang–Liberty FOCS 2016)
  * made DETERMINISTIC and SELF-CERTIFYING: a level holding ≥ cap items
  * of weight w is sorted, every second item is promoted at weight 2w
  * (kept offset = the level's compaction-count parity — no RNG) and the
  * odd leftover stays. Each compaction shifts the weighted rank of ANY
  * query point x by e = ±w·(c mod 2) where c = #compacted items ≤ x:
  * keeping EVEN offsets biases +w·(c mod 2), ODD offsets −w·(c mod 2).
  * Because the offset alternates PER LEVEL, consecutive same-level
  * compactions have opposite bias signs, so a pair's combined shift is
  * in [−w, +w] — and the certificate charges `err += w` only when a
  * pair OPENS (even per-level count), nothing when it closes. That is
  * KLL's derandomized pairing argument (KLL §4) turned into a carried
  * worst-case bound: ~ceil(mₗ/2)·2^l per level instead of the naive
  * mₗ·2^l — measured ~2× tighter at equal state (SCALING.md), still
  * deterministic, still valid under ANY merge order or partitioning
  * (merging sums the per-level counters; each side's open pair stays
  * fully charged, a cross-boundary closer pairs against an open opener
  * with the opposite sign, and every closer matches an opener
  * injectively — the invariant the charge total bounds). Re-entering a
  * STORED sketch ([[addSketch]]) adds its carried err wholesale: its
  * compaction history is summarized by its own certificate, so it
  * interacts with no open pair. Total state is O(cap · log(n/cap)). */
private[functions] object QSketchOps {

  /** Levels ≥ 1 as growable buffers, level0 items appended to `l0`. */
  private def explode(buf: QBuf, levels: ArrayBuffer[ArrayBuffer[Double]])
      : Unit = {
    var i = 0
    while (i < buf.fill0) { levels(0) += buf.lvl0(i); i += 1 }
    var l = 1
    while (l < buf.offs.length + 1) {
      if (levels.length <= l) levels += new ArrayBuffer[Double]
      val from = if (l == 1) 0 else buf.offs(l - 2)
      val to = buf.offs(l - 1)
      var p = from
      while (p < to) { levels(l) += buf.data(p); p += 1 }
      l += 1
    }
  }

  /** Compact every level holding ≥ cap items, bottom-up; mutates the
    * per-level compaction counters and returns the added err under the
    * PAIR-CHARGING rule (charge w when a level's count is even — the
    * pair opener; its odd-count closer promotes the opposite offset and
    * charges nothing). Growable levels make promotion overflow-proof
    * regardless of how lopsided a merge was. */
  private def sweep(levels: ArrayBuffer[ArrayBuffer[Double]], cap: Int,
                    comps: ArrayBuffer[Long]): Long = {
    var err = 0L
    var l = 0
    while (l < levels.length) {
      val lv = levels(l)
      if (lv.length >= cap) {
        val arr = lv.toArray
        java.util.Arrays.sort(arr)
        val pairs = arr.length / 2
        while (comps.length <= l) comps += 0L
        val parity = (comps(l) & 1L).toInt
        if (parity == 0) err += 1L << l // pair opener; the closer is free
        comps(l) += 1
        if (levels.length <= l + 1) levels += new ArrayBuffer[Double]
        val up = levels(l + 1)
        var i = 0
        while (i < pairs) { up += arr(2 * i + parity); i += 1 }
        lv.clear()
        if (arr.length % 2 == 1) lv += arr(arr.length - 1)
      }
      l += 1
    }
    err
  }

  /** Rebuild the flat QBuf from swept levels (level 0 holds < cap items
    * by the sweep invariant, so it fits the scratch). */
  private def rebuild(levels: ArrayBuffer[ArrayBuffer[Double]], cap: Int,
                      n: Long, err: Long, comps: ArrayBuffer[Long]): QBuf = {
    val l0 = new Array[Double](cap)
    var i = 0
    while (i < levels(0).length) { l0(i) = levels(0)(i); i += 1 }
    val upper = levels.drop(1)
    val offs = new Array[Int](upper.length)
    var tot = 0
    var l = 0
    while (l < upper.length) { tot += upper(l).length; offs(l) = tot; l += 1 }
    val data = new Array[Double](tot)
    var p = 0
    l = 0
    while (l < upper.length) {
      var q = 0
      while (q < upper(l).length) { data(p) = upper(l)(q); p += 1; q += 1 }
      l += 1
    }
    QBuf(n, err, comps.toArray, levels(0).length, l0, data, offs)
  }

  def empty(cap: Int): QBuf =
    QBuf(0L, 0L, Array.empty, 0, new Array[Double](cap),
      Array.empty, Array.empty)

  /** O(1) append; a full scratch triggers one O(state) sweep — amortized
    * O(state/cap) = O(log) per insert. */
  def insert(buf: QBuf, x: Double, cap: Int): QBuf = {
    buf.lvl0(buf.fill0) = x
    buf.fill0 += 1
    buf.n += 1
    if (buf.fill0 < cap) buf
    else {
      val levels = ArrayBuffer(new ArrayBuffer[Double])
      explode(buf, levels)
      val comps = ArrayBuffer.from(buf.compsL)
      val de = sweep(levels, cap, comps)
      rebuild(levels, cap, buf.n, buf.err + de, comps)
    }
  }

  def mergeBufs(a: QBuf, b: QBuf, cap: Int): QBuf = {
    if (a.n == 0) return b
    if (b.n == 0) return a
    val levels = ArrayBuffer(new ArrayBuffer[Double])
    explode(a, levels)
    explode(b, levels)
    // per-level counters SUM: each side's pairs were charged internally;
    // a post-merge closer (odd summed count) pairs against whichever
    // side left an opener — opposite sign by the parity rule, so the
    // charge invariant carries through (Scaladoc proof sketch above)
    val comps = ArrayBuffer.fill(
      math.max(a.compsL.length, b.compsL.length))(0L)
    var i = 0
    while (i < comps.length) {
      comps(i) = (if (i < a.compsL.length) a.compsL(i) else 0L) +
        (if (i < b.compsL.length) b.compsL(i) else 0L)
      i += 1
    }
    val de = sweep(levels, cap, comps)
    rebuild(levels, cap, a.n + b.n, a.err + b.err + de, comps)
  }

  /** Fold one serialized sketch into a buffer: each item re-enters at
    * the level its weight encodes (weights are powers of two by
    * construction), and the carried `err` adds — re-aggregating stored
    * sketches certifies exactly like building from raw values. */
  def addSketch(buf: QBuf, sk: QSketch, cap: Int): QBuf = {
    val levels = ArrayBuffer(new ArrayBuffer[Double])
    explode(buf, levels)
    var i = 0
    var wsum = 0L
    while (i < sk.items.length) {
      val w = sk.weights(i)
      require(w > 0 && (w & (w - 1)) == 0,
        s"QSketch weights must be powers of two (got $w at $i)")
      wsum += w
      val l = java.lang.Long.numberOfTrailingZeros(w)
      while (levels.length <= l) levels += new ArrayBuffer[Double]
      levels(l) += sk.items(i)
      i += 1
    }
    // a sketch whose weights don't account for its n is corrupt (or the
    // caller wired the struct fields in the wrong order) — the rank
    // certificate would silently void, so refuse loudly instead
    require(wsum == sk.n,
      s"QSketch weights sum to $wsum but n=${sk.n} — corrupt sketch " +
        "or misordered fields (expected items, weights, n, err)")
    // the stored sketch's compaction history is summarized by its own
    // carried err (added wholesale) — it contributes no open pair, so
    // the buffer's per-level counters continue unchanged
    val comps = ArrayBuffer.from(buf.compsL)
    val de = sweep(levels, cap, comps)
    rebuild(levels, cap, buf.n + sk.n, buf.err + sk.err + de, comps)
  }

  def toSketch(buf: QBuf): QSketch = {
    val items = new ArrayBuffer[Double]
    val weights = new ArrayBuffer[Long]
    var i = 0
    while (i < buf.fill0) { items += buf.lvl0(i); weights += 1L; i += 1 }
    var l = 1
    while (l < buf.offs.length + 1) {
      val from = if (l == 1) 0 else buf.offs(l - 2)
      var p = from
      while (p < buf.offs(l - 1)) {
        items += buf.data(p); weights += 1L << l; p += 1
      }
      l += 1
    }
    QSketch(items.toArray, weights.toArray, buf.n, buf.err)
  }
}

/** Build a [[QSketch]] from raw doubles — the per-day (per-partition,
  * per-file) STORED artifact. Spark has no persistable quantile sketch
  * (`approx_percentile` yields only final numbers), so "p95 this week
  * from stored day sketches, without rescanning the event log" — the
  * quantile analog of q_hll_rollup — needs this aggregate. */
class QSketchAgg(cap: Int) extends Aggregator[Double, QBuf, QSketch] {
  require(cap >= 8, s"cap must be >= 8 (got $cap)")
  override def zero: QBuf = QSketchOps.empty(cap)
  override def reduce(buf: QBuf, x: Double): QBuf =
    QSketchOps.insert(buf, x, cap)
  override def merge(a: QBuf, b: QBuf): QBuf = QSketchOps.mergeBufs(a, b, cap)
  override def finish(buf: QBuf): QSketch = QSketchOps.toSketch(buf)
  override def bufferEncoder: Encoder[QBuf] = ExpressionEncoder[QBuf]()
  override def outputEncoder: Encoder[QSketch] = ExpressionEncoder[QSketch]()
}

/** Merge STORED [[QSketch]]es (the rollup side: day → week → quarter);
  * `n` and `err` carry through, so the merged sketch still certifies
  * its own rank bounds. */
class QSketchMergeAgg(cap: Int) extends Aggregator[QSketch, QBuf, QSketch] {
  require(cap >= 8, s"cap must be >= 8 (got $cap)")
  override def zero: QBuf = QSketchOps.empty(cap)
  override def reduce(buf: QBuf, sk: QSketch): QBuf =
    QSketchOps.addSketch(buf, sk, cap)
  override def merge(a: QBuf, b: QBuf): QBuf = QSketchOps.mergeBufs(a, b, cap)
  override def finish(buf: QBuf): QSketch = QSketchOps.toSketch(buf)
  override def bufferEncoder: Encoder[QBuf] = ExpressionEncoder[QBuf]()
  override def outputEncoder: Encoder[QSketch] = ExpressionEncoder[QSketch]()
}
