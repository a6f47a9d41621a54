package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count–Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) as a
  * mergeable typed [[Aggregator]]: a fixed `d × w` counter grid; each
  * term increments cell `(j, h_j(term))` for `d` independent hashes, and
  * `estimate(t) = min_j grid(j, h_j(t))` — always ≥ the true count
  * (counters only ever over-count), within `2n/w` of it with probability
  * `1 − 2^−d`. The companion to [[MisraGriesAgg]]: Misra–Gries answers
  * "which terms are frequent", CMS answers "how often is THIS term" in
  * O(d·w) state with no key set at all.
  *
  * Hashes are md5-derived (`md5("j:term")`, leading 60 bits, mod w) —
  * the library's portable-hash convention — so the whole grid, and
  * therefore every estimate, is bit-identical across engines and the
  * DuckDB oracle can rebuild it with plain GROUP BYs.
  *
  * Scale shape: map tasks fold their partitions into local `d·w`-long
  * arrays (partial aggregation), the shuffle carries ONE array per task
  * regardless of vocabulary, and merging is elementwise sum. Estimating
  * frequencies over 100 TB of tokens costs a fixed few KB of state per
  * task where an exact GROUP BY shuffles the vocabulary. */
class CmsAgg(d: Int, w: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {
  require(d > 0 && w > 0, s"need positive grid (got d=$d w=$w)")

  override def zero: Array[Long] = Array.fill(d * w)(0L)

  override def reduce(buf: Array[Long], term: String): Array[Long] = {
    var j = 0
    while (j < d) {
      buf(j * w + CmsAgg.cell(j, term, w)) += 1
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

object CmsAgg {

  // MessageDigest is stateful and not thread-safe; reduce() runs once per
  // token, so the instance is reused per task thread rather than
  // re-created (getInstance + hex formatting per call was the hot-path
  // allocation the aggregator's fixed-state pitch forbids)
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Row-`j` cell of `term`: leading 60 bits of md5("j:term") mod w —
    * exactly `conv(substr(md5(concat('j:', term)), 1, 15), 16, 10) % w`
    * in Spark SQL and `CAST(concat('0x', substr(md5(...),1,15)) AS
    * BIGINT) % w` in DuckDB (the oracle identity, pinned in CmsAggSpec).
    * The first 15 hex chars are the top 60 bits of the big-endian first
    * 8 digest bytes, read directly — no hex-string round-trip. */
  def cell(j: Int, term: String, w: Int): Int = {
    val d = md5.get()
    d.reset()
    val b = d.digest(s"$j:$term".getBytes("UTF-8"))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (b(i) & 0xffL); i += 1 }
    ((h >>> 4) % w).toInt
  }
}
