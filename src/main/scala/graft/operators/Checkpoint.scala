package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage cut for iterative loops ([[Components]], [[Iterate]]): each
  * round must eagerly materialize its frame, or the plan re-grows a deeper
  * tree every round (the classic iterative-DataFrame trap).
  *
  * Two postures, selected per session:
  *  - DEFAULT `localCheckpoint(eager = true)`: blocks live in executor
  *    storage (memory, spilling to local disk). Fast, no configuration —
  *    but blocks die with their executor, so a lost executor aborts the
  *    job mid-loop. Right for local mode and short loops.
  *  - RELIABLE `checkpoint(eager = true)` when
  *    `spark.conf.set("graft.checkpoint.reliable", "true")` AND a
  *    `sparkContext.setCheckpointDir(...)` are both set: blocks go to the
  *    checkpoint directory (HDFS/object store on a cluster), surviving
  *    executor loss — the 100×-scale deployment posture for multi-round
  *    loops on preemptible fleets, at the cost of a write per round.
  *
  * A flag without a directory is a configuration error and RAISES (falling
  * back silently to local would let an operator believe it is durable when
  * it is not).
  */
object Checkpoint {

  /** Session conf key enabling reliable (durable) checkpointing. */
  val ReliableKey = "graft.checkpoint.reliable"

  def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.getOption(ReliableKey).contains("true")) {
      require(df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableKey=true but no checkpoint directory is set — call " +
          "sparkContext.setCheckpointDir(<durable path>) first")
      df.checkpoint(eager = true)
    } else df.localCheckpoint(eager = true)

  /** Fluent syntax: `df.cut` ≡ `Checkpoint.cut(df)`. */
  implicit final class CutOps(private val df: DataFrame) extends AnyVal {
    def cut: DataFrame = Checkpoint.cut(df)
  }
}
