package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bloom filter (Bloom, CACM 1970) as a mergeable typed [[Aggregator]]:
  * a fixed `64·mWords`-bit array; each input row contributes `k` set bits
  * and membership is "all k bits set" — no false negatives ever, false
  * positives at the classic `(1 − e^{−kn/m})^k` rate.
  *
  * The aggregator itself never hashes: its INPUT is the per-row array of
  * k 64-bit hashes, computed in-plan with the codegen'd `xxhash64(key, i)`
  * ([[graft.operators.Bloom.keyHashes]]). Build side and probe side share
  * those expressions, so bit positions agree by construction —
  * `floorMod(h, 64·mWords)` here is exactly `pmod(h, m)` in the probe
  * plan. Merging is bitwise OR (idempotent and commutative, so retries
  * and any partition order produce the same filter).
  *
  * Scale shape: the companion to [[CmsAgg]]/[[MisraGriesAgg]] on the JOIN
  * side — map tasks fold their partitions into one local bit array,
  * the shuffle carries ONE `mWords`-long array per task regardless of key
  * cardinality, and the finished filter broadcasts to prune a fact scan
  * BEFORE its shuffle ([[graft.operators.Bloom.filteredSemiJoin]]): the
  * runtime-filter pattern that turns a 100 TB shuffle join into a
  * scan-side narrow filter plus a join over survivors. */
class BloomAgg(mWords: Int)
    extends Aggregator[Array[Long], Array[Long], Array[Long]] {
  require(mWords > 0, s"need a positive word count (got $mWords)")
  private val mBits = mWords * 64L

  override def zero: Array[Long] = new Array[Long](mWords)

  override def reduce(buf: Array[Long], hs: Array[Long]): Array[Long] = {
    var i = 0
    while (i < hs.length) {
      val b = java.lang.Math.floorMod(hs(i), mBits)
      buf((b >>> 6).toInt) |= 1L << (b & 63)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
