package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import Checkpoint.CutOps

/** Generic distributed fixpoint iteration — the engine's iterative /
  * recursive surface (what a recursive CTE compiles to in engines that
  * have one): repeatedly apply a DataFrame→DataFrame step until the frame
  * stops changing, eagerly materializing each round.
  *
  * [[Components.connectedComponents]] is the specialised ancestor (its
  * monotone labels admit a cheaper sum-based convergence test); `fixpoint`
  * generalises the loop shape to any step whose result reaches a fixed
  * point: hierarchy flattening ([[treeDepth]]), closure computations,
  * iterative refinement. Per round: lineage is truncated with
  * [[Checkpoint.cut]] (an iterative plan otherwise re-plans a growing tree
  * every round — the classic iterative-DataFrame trap); on a cluster with
  * executor-loss risk set `graft.checkpoint.reliable=true` + a checkpoint
  * dir for durable cuts.
  *
  * Convergence = unchanged (count, Σ xxhash64(row)) digest: one cheap
  * aggregate per round instead of a two-sided anti-join diff. The digest
  * is order-insensitive and exact in decimal; a false fixpoint needs two
  * DIFFERENT row multisets with equal count and equal 64-bit-hash sums —
  * ≈2⁻⁶⁴ adversarial, not a realistic failure mode for data pipelines
  * (Components keeps its exact monotone test; use that shape where
  * monotonicity holds).
  */
object Iterate {

  /** Iterate `step` from `init` until the digest stops changing; returns
    * the fixed frame. Throws if `maxIter` rounds pass without
    * convergence — like [[Components.connectedComponents]], one extra
    * observation round is allowed so maxIter == true round count works. */
  def fixpoint(init: DataFrame, maxIter: Int)(
      step: DataFrame => DataFrame): DataFrame = {
    require(maxIter >= 0, s"maxIter must be >= 0 (got $maxIter)")
    def digest(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(
        count(lit(1)),
        coalesce(sum(xxhash64(struct(df.columns.map(col): _*))
          .cast("decimal(38,0)")), lit(java.math.BigDecimal.ZERO))).head
      (r.getLong(0), r.getDecimal(1))
    }
    var cur = init.cut
    var last = digest(cur)
    var iter = 0
    var converged = false
    while (iter <= maxIter && !converged) {
      val next = step(cur).cut
      val d = digest(next)
      converged = d._1 == last._1 && d._2.compareTo(last._2) == 0
      last = d
      cur = next
      iter += 1
    }
    require(converged, s"fixpoint did not converge within maxIter=$maxIter " +
      "rounds — raise maxIter, or check that `step` is actually contracting")
    cur
  }

  /** Depth of every node in a forest given by (idCol, parentCol), roots
    * marked parent == id — hierarchy flattening, the canonical recursive-
    * CTE workload, done in O(log depth) rounds by POINTER DOUBLING: state
    * (id, anc, d) starts at each node's parent and each round jumps
    * `anc → anc's current ancestor`, doubling the distance covered until
    * every pointer rests at a root. A depth-1000 chain needs ~10 rounds —
    * each one shuffle self-join — where naive parent-at-a-time iteration
    * (or a recursive CTE) needs 1000.
    *
    * Precondition: every parent id occurs as a node id and the structure
    * is acyclic (a cycle never converges and trips maxIter). Returns
    * (idCol, depth), roots at depth 0. */
  def treeDepth(nodes: DataFrame, idCol: String, parentCol: String,
      maxIter: Int = 40): DataFrame = {
    val init = nodes.select(col(idCol).cast("long").as("id"),
        col(parentCol).cast("long").as("anc"))
      .withColumn("d", when(col("id") === col("anc"), 0L).otherwise(1L))
    fixpoint(init, maxIter) { cur =>
      val jump = cur.select(col("id").as("jid"), col("anc").as("janc"),
        col("d").as("jd"))
      cur.join(jump, col("anc") === col("jid"))
        .select(col("id"), col("janc").as("anc"), (col("d") + col("jd")).as("d"))
    }.select(col("id").as(idCol), col("d").as("depth"))
  }
}
