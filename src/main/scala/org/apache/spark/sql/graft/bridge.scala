package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the `private[sql]` Column↔Expression converters —
  * the standard mechanism for Spark extension libraries that define custom
  * Catalyst expressions with a Column-API surface. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Bridge to `private[sql]` plan surgery: re-declare the hash
  * partitioning of a checkpointed frame. `Dataset.localCheckpoint` /
  * `checkpoint` capture the executed plan's partitioning, but under AQE
  * the adaptive root reports `UnknownPartitioning`, so the resulting
  * `LogicalRDD` forgets a layout the RDD physically HAS — and every
  * downstream join re-shuffles a frame that is already clustered. This
  * helper is only sound when the checkpoint materialized an EXPLICIT
  * `repartition(num, keys)` (a REPARTITION_BY_NUM shuffle, which AQE
  * never coalesces): then partition i of the RDD holds exactly the rows
  * with `pmod(murmur3(keys), num) == i`, which is precisely what the
  * declared `HashPartitioning(keys, num)` promises. Declaring anything
  * else mis-routes joins silently — hence the narrow, named entry point
  * rather than a general setter. */
object PlanBridge {
  import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
  import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
  import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}
  import org.apache.spark.sql.execution.LogicalRDD

  /** `sorted = true` additionally declares ascending-nulls-first ordering
    * on `keys` — only sound when the checkpoint materialized a
    * `sortWithinPartitions(keys)` over the explicit repartition. */
  def declareHashPartitioned(df: DataFrame, num: Int, keys: Seq[String],
      sorted: Boolean = false): DataFrame = df.queryExecution.analyzed match {
    case lr: LogicalRDD =>
      val attrs = keys.map(k => lr.output.find(_.name == k).getOrElse(
        throw new IllegalArgumentException(
          s"declareHashPartitioned: no column '$k' in ${lr.output.map(_.name)}")))
      val ordering =
        if (sorted) attrs.map(a => SortOrder(a, Ascending)) else Nil
      val spark = df.sparkSession.asInstanceOf[CSparkSession]
      CDataset.ofRows(spark,
        LogicalRDD(lr.output, lr.rdd, HashPartitioning(attrs, num), ordering,
          lr.isStreaming, lr.stream)(
          spark, Some(lr.computeStats()), Some(lr.constraints)))
    case other => throw new IllegalArgumentException(
      "declareHashPartitioned expects a checkpointed frame (LogicalRDD), " +
        s"got ${other.getClass.getSimpleName}")
  }
}
