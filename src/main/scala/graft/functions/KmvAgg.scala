package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV ("k minimum values" / bottom-k) distinct-value sketch (Bar-Yossef
  * et al. RANDOM 2002; Beyer et al. SIGMOD 2007) as a mergeable typed
  * [[Aggregator]]: the buffer is the sorted array of the k smallest
  * DISTINCT hash values seen, and `D ≈ (k−1)·M / h_(k)` where `h_(k)` is
  * the k-th smallest hash over a domain of size `M` — the classic
  * "k-th order statistic estimates density" argument.
  *
  * What this adds over HLL ([[graft.queries]] q_hll_rollup): a bottom-k
  * sketch is a uniform SAMPLE of the distinct set, so two sketches
  * support SET operations — `k smallest of (A ∪ B)` is a valid sketch of
  * the union, and the fraction ρ/k of those union-mins present in BOTH
  * input sketches estimates the Jaccard similarity, giving
  * `|A ∩ B| ≈ ρ/k · |A ∪ B|` (Beyer et al. §4). HLL registers support
  * union only; intersection via inclusion–exclusion loses all precision
  * when the overlap is small.
  *
  * The hash is the library's portable-md5 convention (the caller feeds
  * `conv(substr(md5(key), 1, 12), 16, 10)` — 48 bits, so `(k−1)·M` fits
  * int64 at any k ≤ 2¹⁵), which makes the whole sketch, and therefore
  * every ESTIMATE, bit-identical across engines: the DuckDB oracle
  * rebuilds it with `ORDER BY h LIMIT k` and the same integer division.
  *
  * Mergeability is exact, not approximate: any h among the k smallest of
  * `∪ᵢ Hᵢ` is among the k smallest of its own Hᵢ, so re-aggregating
  * stored per-partition (or per-day) sketches yields exactly the sketch
  * of the union — the same pre-aggregation contract as q_hll_rollup's
  * day→week rollup. Scale shape: map tasks carry ≤ k longs per group,
  * the shuffle carries one array per task, merge is a sorted-merge-dedup.
  *
  * Per-row cost: once the buffer is full, a row whose hash clears the
  * bar is O(1) with zero allocation; below-bar inserts copy O(k). Under
  * any hash worth the name inserts decay as k/i (O(k·log n) copies over
  * a stream) — only an ADVERSARIALLY descending hash stream stays at
  * O(n·k), and the md5 feed precludes ordering attacks by construction.
  */
class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  // k = 1 is degenerate for the estimator (the (k−1)·M numerator is 0,
  // and a retained hash of 0 would make it 0/0) — make the configuration
  // unrepresentable rather than guard every estimate call site
  require(k > 1, s"k must be > 1 (got $k) — the (k-1)*M/h_(k) estimator " +
    "degenerates at k=1")

  override def zero: Array[Long] = Array.empty

  override def reduce(buf: Array[Long], h: Long): Array[Long] =
    if (buf.length == k && h >= buf(k - 1)) buf // above the bar
    else {
      val pos = java.util.Arrays.binarySearch(buf, h)
      if (pos >= 0) buf // already present — the sketch is a SET
      else {
        val ins = -pos - 1
        val n = math.min(buf.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
        out
      }
    }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0
      var j = 0
      var o = 0
      while (o < out.length && (i < a.length || j < b.length)) {
        val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
        val v = if (takeA) { val x = a(i); i += 1; x }
                else { val x = b(j); j += 1; x }
        if (o == 0 || out(o - 1) != v) { out(o) = v; o += 1 }
      }
      if (o == out.length) out else java.util.Arrays.copyOf(out, o)
    }

  override def finish(r: Array[Long]): Array[Long] = r
  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

object KmvAgg {

  /** Distinct-count estimate from a sketch over hash domain `[0, m)`:
    * exact (= the sketch size) while the set still fits the sketch,
    * `(k−1)·m div h_(k)` once it spills — the same integer-division
    * spelling the SQL side uses, so estimates are oracle-exact. */
  def estimate(sketch: Array[Long], k: Int, m: Long): Long =
    if (sketch.length < k) sketch.length.toLong
    else (k - 1).toLong * m / sketch(k - 1)
}
