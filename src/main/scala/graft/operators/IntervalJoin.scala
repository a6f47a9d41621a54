package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval join without an equi key.
  *
  * Spark plans a plain `p.t >= i.start AND p.t < i.end` join as a
  * BroadcastNestedLoopJoin (or cartesian): every point is tested against
  * every interval — O(N·M) predicate evaluations, which is exactly the
  * shape that dies first at scale. This operator restores an equi key by
  * BINNING the shared numeric domain: each interval is exploded to the
  * fixed-width bins it overlaps, each point falls in exactly one bin, and
  * the pair join becomes a hash equi-join on the bin id plus a residual
  * range filter. Work drops to O(N + M·spread + candidates), where
  * `spread` = avg interval length / binWidth and `candidates` is the true
  * output size plus same-bin near-misses.
  *
  * Scale shape (100 TB posture): both sides shuffle-hash on the bin id —
  * fully partition-parallel, no nested loop, no broadcast of a big side.
  * Because a point has exactly one bin, every (point, interval) pair meets
  * at most once — no post-join dedup. Hot bins (many intervals overlapping
  * one bin) are ordinary join skew: AQE's skew-join split applies, and
  * callers can add real equi keys via `extraKeys` to sharpen partitioning.
  *
  * `binWidth` tuning: ≈ the median interval length. Much smaller → interval
  * fan-out (M·spread rows); much larger → more same-bin false candidates
  * for the residual filter. Both degrade gracefully, never to O(N·M).
  *
  * Domain: integral columns (e.g. epoch micros via `unix_micros`). Exact
  * long arithmetic — no doubles anywhere in the bin math.
  */
object IntervalJoin {

  /** Exact floor-division of an integral column by a positive constant:
    * `pmod` keeps it correct for negative values, the subtraction makes
    * the numerator exactly divisible, and subtraction AND division run in
    * DECIMAL — Spark's `/` on longs is double division (silently rounds
    * above 2^53), and a long subtraction underflows ANSI-fatally at
    * c = Long.MinValue (pmod is positive), which a corrupt sentinel bound
    * must not be able to trigger. */
  private def floorDiv(c: Column, w: Long): Column =
    ((c.cast("decimal(38,0)") - pmod(c, lit(w))) / lit(w)).cast("long")

  /** Join `points` to the intervals of `intervals` that contain them:
    * emits one row per (point, interval) pair with `startCol <= pointCol <
    * endCol` (half-open), carrying all columns of both inputs.
    *
    * @param pointCol  integral column on `points` (e.g. epoch micros)
    * @param startCol  integral inclusive lower bound on `intervals`
    * @param endCol    integral exclusive upper bound on `intervals`
    * @param binWidth  bin size in the columns' units; ≈ median interval
    *                  length is a good default
    * @param extraKeys optional (pointsCol, intervalsCol) equi-key pairs
    *                  ANDed into the join (e.g. a tenant or user id)
    * @param maxBinsPerInterval fan-out cap: an interval spanning more bins
    *                  than this is EXCLUDED from the join (default 65536).
    *                  One corrupt sentinel row (`end = Long.MaxValue`)
    *                  would otherwise explode into a multi-billion-element
    *                  `sequence` and kill the whole query; audit candidates
    *                  beforehand with `end - start >= cap * binWidth` if
    *                  dropped rows matter, or raise the cap deliberately.
    */
  def pointInInterval(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binWidth: Long,
      extraKeys: Seq[(String, String)] = Nil,
      maxBinsPerInterval: Int = 65536): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(maxBinsPerInterval > 0,
      s"maxBinsPerInterval must be positive, got $maxBinsPerInterval")
    val p = points.withColumn("__pbin", floorDiv(col(pointCol), binWidth))
    // Empty intervals (end <= start) match nothing; dropping them first
    // also keeps `sequence` ascending (Spark would happily descend).
    val startBin = floorDiv(col(startCol), binWidth)
    val endBin = floorDiv(col(endCol) - 1, binWidth)
    val iv = intervals
      .where(col(endCol) > col(startCol))
      // Span check in DECIMAL: with both bounds corrupt (start near
      // Long.MinValue, end near Long.MaxValue) the long subtraction
      // endBin - startBin wraps NEGATIVE, passes a `< cap` filter, and the
      // `sequence` then explodes — the exact failure this cap exists to
      // prevent. end > start already guarantees endBin >= startBin
      // mathematically, so the only way the long form goes negative is
      // overflow; exact decimal arithmetic closes it.
      .where(endBin.cast("decimal(38,0)") - startBin.cast("decimal(38,0)")
        < lit(maxBinsPerInterval).cast("decimal(38,0)"))
      .withColumn("__ibin", explode(sequence(startBin, endBin)))
    val keys = ("__pbin", "__ibin") +: extraKeys
    val cond = keys.map { case (pk, ik) => p(pk) === iv(ik) }.reduce(_ && _) &&
      p(pointCol) >= iv(startCol) && p(pointCol) < iv(endCol)
    p.join(iv, cond).drop("__pbin", "__ibin")
  }
}
