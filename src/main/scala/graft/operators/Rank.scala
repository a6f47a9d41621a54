package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking — the two-pass rank/ntile that replaces a
  * single-partition `Window.orderBy(...)` over an unbounded frame.
  *
  * A partition-less window is correct but serializes the whole frame into
  * ONE task ("No Partition Defined for Window"); fine on a bounded grid
  * (months, deciles, a ≤10⁴-cell score grid), a scale-killer on an entity
  * grain (per-customer / per-user aggregates), where at 100× the data that
  * one task is the job. The classic distributed spelling used here:
  *
  *  1. `repartitionByRange` on the FULL sort key (caller must make the
  *     order total — include a unique tiebreaker — so every row's rank is
  *     well-defined and range partitioning cannot split a tie group
  *     nondeterministically);
  *  2. per-partition `row_number` / running sum, windowed BY PARTITION ID
  *     (distributed: as many concurrent window tasks as partitions);
  *  3. per-partition counts/sums — ≤ `partitions` rows, the bounded grid a
  *     partition-less window IS fine for — cumulated into offsets and
  *     broadcast-joined back: global rank = local rank + rows before this
  *     partition, global running sum likewise.
  *
  * Cost: one range shuffle + one pid shuffle of the input frame + a
  * broadcast of ≤ `partitions` offset rows — every stage distributed, no
  * single-task barrier at any scale. The frame is `localCheckpoint`ed
  * between pass 1 and pass 2 so the offset aggregate and the final join
  * consume one pinned computation (also pins `spark_partition_id`).
  */
object Rank {

  private val PID = "_gr_pid"
  private val LR = "_gr_lr"
  private val LS = "_gr_ls"

  /** `df` + `rankCol` = global 1-based row number over the total `order`,
    * and `nCol` = total row count (same on every row, broadcast-joined).
    * With `sumOf=Some(c)`: `cumCol` = running sum of `c` inclusive of the
    * current row, `totCol` = grand total of `c`. */
  def rowNumbered(df: DataFrame, order: Seq[Column], rankCol: String = "r",
      sumOf: Option[String] = None, cumCol: String = "cum",
      totCol: String = "tot", nCol: String = "n_total",
      partitions: Int = 0): DataFrame = {
    val nPart = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val w = Window.partitionBy(PID).orderBy(order: _*)
    val cw = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var local = df.repartitionByRange(nPart, order: _*)
      .withColumn(PID, spark_partition_id())
      .withColumn(LR, row_number().over(w).cast("long"))
    sumOf.foreach(c => local = local.withColumn(LS, sum(col(c)).over(cw)))
    val localCp = local.localCheckpoint(true) // offsets + final join share it
    // Per-partition row count = the last row's row_number (max is safe:
    // row_number is strictly increasing); the per-partition SUM is a real
    // sum — max of the running sum would only equal it for non-negative
    // inputs, and nothing in this API restricts the summed column's sign.
    // ≤ nPart offset rows, so the windows below run on a bounded grid by
    // construction.
    val aggs = max(col(LR)).as("_gr_pc") ::
      sumOf.map(c => sum(col(c)).as("_gr_ps")).toList
    val gw = Window.orderBy(PID)
    val prevW = gw.rowsBetween(Window.unboundedPreceding, -1)
    val allW = gw.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    var offs = localCp.groupBy(PID).agg(aggs.head, aggs.tail: _*)
      .withColumn("_gr_roff", coalesce(sum("_gr_pc").over(prevW), lit(0L)))
      .withColumn(nCol, sum("_gr_pc").over(allW))
    sumOf.foreach { _ =>
      offs = offs
        .withColumn("_gr_soff", coalesce(sum("_gr_ps").over(prevW), lit(0)))
        .withColumn(totCol, sum("_gr_ps").over(allW))
    }
    val offCols = Seq(PID, "_gr_roff", nCol) ++
      sumOf.toSeq.flatMap(_ => Seq("_gr_soff", totCol))
    var out = localCp.join(broadcast(offs.select(offCols.map(col): _*)), PID)
      .withColumn(rankCol, col(LR) + col("_gr_roff"))
    sumOf.foreach(_ => out = out.withColumn(cumCol, col(LS) + col("_gr_soff")))
    out.drop(PID, LR, LS, "_gr_roff", "_gr_soff")
  }

  /** `df` + `tileCol` = ntile(`k`) bucket over the total `order`, computed
    * from the distributed global rank by the SQL-standard closed form
    * (first n mod k buckets hold ⌈n/k⌉ rows) — value-identical to
    * `ntile(k) OVER (ORDER BY order)` under the same total order, with no
    * single-partition window. Also leaves `nCol` (total rows) and, when
    * `sumOf` is set, `totCol` (grand total) on every row so callers get
    * their share denominators without a second pass over `df`. */
  def ntiled(df: DataFrame, order: Seq[Column], k: Int, tileCol: String,
      sumOf: Option[String] = None, totCol: String = "tot",
      nCol: String = "n_total", partitions: Int = 0): DataFrame = {
    require(k > 0, s"ntile bucket count must be positive, got $k")
    val r = "_gr_r"
    rowNumbered(df, order, r, sumOf, cumCol = "_gr_cum", totCol, nCol,
        partitions)
      .withColumn("_gr_q", expr(s"`$nCol` DIV $k"))
      .withColumn("_gr_rem", expr(s"`$nCol` % $k"))
      .withColumn("_gr_cut", expr("_gr_rem * (_gr_q + 1)"))
      // greatest(_,1): the ELSE branch is unreachable when _gr_q = 0
      // (cut = n there), but ANSI mode must never see a DIV 0
      .withColumn(tileCol, expr(
        s"CAST(CASE WHEN `$r` <= _gr_cut THEN (`$r` - 1) DIV (_gr_q + 1) + 1 " +
        s"ELSE _gr_rem + (`$r` - _gr_cut - 1) DIV greatest(_gr_q, 1) + 1 " +
        "END AS INT)"))
      .drop(r, "_gr_cum", "_gr_q", "_gr_rem", "_gr_cut")
  }
}
