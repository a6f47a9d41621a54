package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import graft.functions.BloomAgg

/** Bloom-filter join pruning — the runtime-filter shape for selective
  * joins at scale: build a fixed-size bit-array over the small (build)
  * side's join keys with the mergeable [[BloomAgg]], broadcast it, and
  * prune the large (probe) side with a NARROW in-plan bit test BEFORE the
  * join's shuffle. The filter admits every true match (no false
  * negatives) plus a small false-positive tail, and the exact join over
  * the survivors restores exactness — so the composed operator's result
  * IS the plain join's, which is also its oracle (the q_skew_join
  * pattern: physical routing changes, semantics don't).
  *
  * Why this matters at 100 TB: a semi join against a selective dimension
  * otherwise shuffles the full fact table on the join key. Here the fact
  * scan drops non-matching rows at scan speed (xxhash64 + two bitwise ops
  * per probe, all codegen'd, no UDF), and only survivors — matches plus
  * the fp tail — enter the shuffle. Filter state is `64·mWords` bits
  * total per task regardless of build-side cardinality; the default
  * 1024 words = 8 KB gives fp ≈ (1 − e^{−kn/m})^k ≈ 0.1% at n=4k keys.
  *
  * (Spark's own AQE injects runtime bloom filters for some shuffle-join
  * shapes; this operator makes the pattern a first-class, plannable
  * library primitive — usable on any boolean-prunable pipeline stage,
  * not just where the optimizer happens to fire.) */
object Bloom {

  /** Per-row array of k 64-bit hashes of `key` — the shared hash family
    * of build and probe sides (`xxhash64(key, i)`, i = 0..k−1). */
  def keyHashes(key: Column, k: Int): Column =
    array((0 until k).map(i => xxhash64(key, lit(i))): _*)

  /** One-row DataFrame holding the finished filter as column `bloom`
    * (array of `mWords` longs). One partial-agg pass over `df` — the
    * shuffle carries one array per map task. */
  def build(df: DataFrame, key: Column, k: Int, mWords: Int): DataFrame = {
    val agg = udaf(new BloomAgg(mWords), ExpressionEncoder[Array[Long]]())
    df.select(keyHashes(key, k).as("hs")).agg(agg(col("hs")).as("bloom"))
  }

  /** Membership probe: all k bits set. Pure built-in expressions
    * (xxhash64, pmod, shiftright, bitwise AND) — codegen'd, no UDF;
    * `pmod(h, 64·mWords)` matches [[BloomAgg]]'s `floorMod` bit index. */
  def mightContain(bloom: Column, key: Column, k: Int, mWords: Int): Column =
    (0 until k).map { i =>
      val b = pmod(xxhash64(key, lit(i)), lit(mWords * 64L))
      val word = element_at(bloom, shiftright(b, 6).cast("int") + 1)
      call_function("shiftright", word, (b % 64).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)

  /** `left` rows whose `leftKey` appears in `right`'s `rightKey` —
    * exactly `left SEMI JOIN right`, executed as: bloom over the right
    * keys (one aggregate), broadcast, narrow probe-side pre-filter, then
    * the exact semi join over survivors. False positives are removed by
    * the final join; false negatives cannot exist. */
  def filteredSemiJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      k: Int = 3, mWords: Int = 1024): DataFrame = {
    val pruned = prune(left, right, leftKey, rightKey, k, mWords)
    // the probe side's key is renamed so leftKey == rightKey (the common
    // self-named semi join) resolves unambiguously; semi output carries
    // only left columns, so the rename never leaks
    val probe = right.select(col(rightKey).as(ProbeKey)).distinct()
    pruned.join(probe, pruned(leftKey) === probe(ProbeKey), "left_semi")
  }

  /** The pre-filter stage alone (admits matches + fp tail) — exposed so
    * callers composing their own join, and tests measuring the pruning
    * rate, can use the scan-side filter directly. */
  def prune(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      k: Int = 3, mWords: Int = 1024): DataFrame = {
    require(!left.columns.contains(FilterCol),
      s"prune: left side already has a '$FilterCol' column — rename it")
    left.crossJoin(broadcast(
        build(right, canonKey(right, rightKey, left, leftKey), k, mWords)
          .withColumnRenamed("bloom", FilterCol)))
      .filter(mightContain(col(FilterCol),
        canonKey(left, leftKey, right, rightKey), k, mWords))
      .drop(FilterCol)
  }

  /** The hash family ([[keyHashes]]) dispatches on the key's PHYSICAL
    * type — `xxhash64(42: INT)` ≠ `xxhash64(42L: BIGINT)` — so build and
    * probe keys of different integral widths would silently produce
    * false NEGATIVES (dropped true matches), violating the operator's
    * contract. Integral keys are therefore canonicalized to bigint on
    * BOTH sides; any other cross-type pairing raises loudly instead of
    * pruning wrongly. */
  private def canonKey(df: DataFrame, key: String,
      other: DataFrame, otherKey: String): Column = {
    import org.apache.spark.sql.types._
    val (t, ot) = (df.schema(key).dataType, other.schema(otherKey).dataType)
    def integral(d: DataType) = d match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (integral(t) && integral(ot)) col(key).cast("bigint")
    else {
      require(t == ot, s"bloom join keys must share one hashable type — " +
        s"got $key: $t vs $otherKey: $ot (xxhash64 is type-sensitive; " +
        "cast both sides to a common type first)")
      col(key)
    }
  }

  // internal column names; prefixed so user schemas can't collide silently
  private val FilterCol = "__graft_bloom"
  private val ProbeKey = "__graft_bloom_probe_key"
}
