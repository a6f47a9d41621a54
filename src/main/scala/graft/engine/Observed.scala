package graft.engine

import scala.collection.concurrent.TrieMap
import scala.concurrent.Await
import scala.concurrent.duration.Duration
import java.util.concurrent.TimeUnit

import org.apache.spark.sql.{Column, Observation}
import org.apache.spark.sql.functions.{count, lit}

/** Per-node pipeline observability — the reference's per-pipe run stats
  * (row counts, volume gauges) re-expressed on Spark's own metrics
  * channel: every node output is wrapped in `Dataset.observe`, which
  * plants a `CollectMetrics` barrier in the Catalyst plan. The metric
  * aggregates are evaluated INSIDE the same whole-stage-codegen pass
  * that materializes the sink — partial per task, merged via an
  * accumulator on the driver — so a six-stage pipeline reports six
  * stages' counts for the cost of ONE action.
  *
  * That is the 100 TB posture: the naive alternative (`df.count()` per
  * stage) re-scans every stage's full lineage once per gauge — six
  * stages ≈ 21 extra stage-scans of a 100 TB corpus — while observation
  * metrics ride the materializing job for free: no extra scan, no extra
  * shuffle, no second action.
  *
  * PLACEMENT, the one scale trade-off: a gauge PINS the rows crossing
  * its boundary. Catalyst will not move a downstream filter through a
  * CollectMetrics barrier (doing so would change the observed count —
  * that is the metric's meaning, not a limitation), so observing a
  * pre-gate node forfeits that gate's scan pushdown: you asked to count
  * the ungated rows, so they must be read. Instrument selectively
  * (`only=`) — gauges on post-gate nodes leave the gate free to land in
  * the parquet scan. Both behaviors are plan-asserted in ObservedSpec.
  *
  * Constraints inherited from `observe`: metric columns must be
  * aggregates without DISTINCT, and only nodes that are ancestors of a
  * materialized output ever fire (a node outside the action's lineage
  * stays pending — read it with [[Handle.metricsOrEmpty]] or a timeout).
  * An observation's execution listener is unregistered only when its
  * metrics row is DELIVERED, so an instrumented graph that is wired but
  * never materialized (e.g. plan inspection) parks its listeners on the
  * session for the session's life — bounded (one per gauged node, no-op
  * on dispatch) but cumulative; don't instrument plan-inspection-only
  * wiring in a long-lived session.
  *
  * EMPTY-STAGE quirk, normalized here: a gauge whose subtree the
  * optimizer folds to a statically-empty relation (e.g. a filter over a
  * local relation that keeps nothing) executes as an RDD with ZERO
  * partitions, so no task ever merges a partial into the metrics
  * accumulator and Spark delivers an EMPTY row (no fields) instead of
  * the aggregates-over-empty-input values. [[Handle]] detects the
  * zero-field delivery and re-evaluates the same metric columns over
  * `limit(0)` of the node's output — count gauges read 0, sum/min/max
  * gauges read NULL, exactly what an aggregate over an empty stage
  * means. (A runtime-empty stage with real input partitions doesn't hit
  * this: its tasks run and merge genuine empty-input partials.)
  */
object Observed {

  /** The default gauge: row count only. */
  val rowCount: String => Seq[Column] = _ => Seq(count(lit(1)).as("n_rows"))

  /** Read-side of one instrumented run. */
  final class Handle private[engine] (
      private val obs: Map[String, Observation],
      private val emptyStage: TrieMap[String, () => Map[String, Any]]) {
    def nodeIds: Set[String] = obs.keySet

    /** This node's metrics; blocks (up to `timeoutMs`) until the action
      * that materializes the node's plan completes and the execution
      * listener delivers the metrics row. Throws on timeout — reaching it
      * means nothing materialized this node (wrong output, or a node off
      * the sink's lineage). */
    def metrics(nodeId: String, timeoutMs: Long = 120000L): Map[String, Any] = {
      val o = lookup(nodeId)
      Await.ready(o.future, Duration(timeoutMs, TimeUnit.MILLISECONDS))
      normalize(nodeId, o.get)
    }

    /** Non-blocking read: empty until the metrics row has been delivered.
      * (One caveat: the FIRST read of an empty-stage gauge runs the tiny
      * limit(0) substitution action below — cached for later reads.) */
    def metricsOrEmpty(nodeId: String): Map[String, Any] = {
      val o = lookup(nodeId)
      if (o.future.isCompleted) normalize(nodeId, o.get) else Map.empty
    }

    private val normalized = TrieMap.empty[String, Map[String, Any]]

    /** Zero-field delivery = zero-partition subtree (see EMPTY-STAGE in
      * the object doc): substitute aggregates-over-empty-input, computed
      * once per node and cached (the substitution is a driver-local
      * limit(0) action — cheap, but not free on a polling path). Metric
      * columns are required nonEmpty at instrument time, so a genuine
      * delivery always has fields. */
    private def normalize(nodeId: String, m: Map[String, Any]): Map[String, Any] =
      if (m.nonEmpty) m
      else emptyStage.get(nodeId) match {
        case None => m
        case Some(eval) => normalized.getOrElseUpdate(nodeId, eval())
      }

    private def lookup(nodeId: String): Observation =
      obs.getOrElse(nodeId, throw new IllegalArgumentException(
        s"no observation for node '$nodeId' — instrumented nodes: " +
          obs.keys.toSeq.sorted.mkString(", ")))
  }

  /** Instrument `g`: each chosen node's output gains an observation named
    * `graft.<nodeId>` carrying `metrics(nodeId)` (at least one column).
    * `only` selects the nodes to gauge (empty = all — fine for audits;
    * at scale prefer naming the stages you need, see PLACEMENT above).
    * Returns the instrumented graph plus the [[Handle]] to read results.
    *
    * Single-use by construction: each call mints fresh `Observation`s and
    * Spark binds an Observation to exactly one Dataset — run the returned
    * graph once ([[Graph.run]] or [[Graph.runIncremental]]), materialize,
    * read the handle; instrument again for the next run. */
  def instrument(g: Graph, metrics: String => Seq[Column] = rowCount,
      only: Set[String] = Set.empty): (Graph, Handle) = {
    val unknown = only.filterNot(id => g.nodes.exists(_.id == id))
    require(unknown.isEmpty, s"only= names unknown nodes: ${unknown.mkString(", ")}")
    val picked = if (only.isEmpty) g.nodes.map(_.id).toSet else only
    val obs = picked.map(id => id -> new Observation(s"graft.$id")).toMap
    val emptyStage = TrieMap.empty[String, () => Map[String, Any]]
    val wrapped = g.nodes.map { n =>
      if (!picked(n.id)) n
      else n.copy(fn = upstream => {
        val ms = metrics(n.id)
        require(ms.nonEmpty, s"node ${n.id}: metrics() returned no columns")
        val out = n.fn(upstream)
        emptyStage.put(n.id, () => {
          val r = out.limit(0).agg(ms.head, ms.tail: _*).head()
          r.getValuesMap[Any](r.schema.fieldNames)
        })
        out.observe(obs(n.id), ms.head, ms.tail: _*)
      })
    }
    (new Graph(wrapped), new Handle(obs, emptyStage))
  }
}
