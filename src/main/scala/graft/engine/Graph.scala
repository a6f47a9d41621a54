package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** The dags-shaped orchestration layer (SURVEY §1.1, §3.2.4): nodes are
  * configured compute functions over upstream DataFrames; the graph runs
  * them in topological order. Pure driver-side wiring — executors only ever
  * see the Catalyst plans the node functions declare, so the layer adds no
  * distributed cost at any scale.
  */
final case class Node(id: String, deps: Seq[String],
    fn: Map[String, DataFrame] => DataFrame)

object Node {
  /** A SQL pipe (the reference's signature node kind): upstream frames are
    * registered as temp views named after their node ids, then the SQL text
    * runs against them — Catalyst plans it like any DataFrame node. */
  def sql(id: String, deps: Seq[String], query: String): Node =
    Node(id, deps, upstream => {
      require(upstream.nonEmpty, s"sql node $id needs at least one upstream")
      val spark = upstream.values.head.sparkSession
      upstream.foreach { case (name, df) => df.createOrReplaceTempView(name) }
      spark.sql(query)
    })
}

final class CycleException(msg: String) extends RuntimeException(msg)

final class Graph(val nodes: Seq[Node]) {
  private val byId: Map[String, Node] = nodes.map(n => n.id -> n).toMap
  require(byId.size == nodes.size, "duplicate node ids")

  /** Kahn topological order; throws CycleException on a cycle. */
  def topoOrder: Seq[Node] = {
    val inDeg = scala.collection.mutable.Map[String, Int]()
    nodes.foreach(n => inDeg(n.id) = n.deps.count(byId.contains))
    val out = nodes.map(n => n.id -> nodes.filter(_.deps.contains(n.id)).map(_.id)).toMap
    val q = scala.collection.mutable.Queue(nodes.filter(n => inDeg(n.id) == 0).map(_.id): _*)
    val order = scala.collection.mutable.ArrayBuffer[String]()
    while (q.nonEmpty) {
      val id = q.dequeue(); order += id
      out(id).foreach { d => inDeg(d) -= 1; if (inDeg(d) == 0) q.enqueue(d) }
    }
    if (order.size != nodes.size)
      throw new CycleException(s"cycle among ${inDeg.filter(_._2 > 0).keys.mkString(", ")}")
    order.map(byId).toSeq
  }

  /** Run every node once: inputs = already-materialized upstream frames
    * (external sources keyed by id). Each node's output is registered for
    * downstream nodes; `log`, when set, records the run. */
  def run(inputs: Map[String, DataFrame] = Map.empty,
      log: Option[RunLog] = None): Map[String, DataFrame] = {
    val produced = scala.collection.mutable.Map[String, DataFrame](inputs.toSeq: _*)
    topoOrder.foreach { n =>
      val upstream = n.deps.map { d =>
        d -> produced.getOrElse(d,
          throw new IllegalArgumentException(s"node ${n.id}: missing upstream $d"))
      }.toMap
      val outDf = n.fn(upstream)
      produced(n.id) = outDf
      log.foreach(_.append(n.id))
    }
    produced.toMap
  }
}

/** Append-only run log + high-watermark store — the reference's metadata DB
  * reduced to its two jobs: which node ran (idempotent re-run bookkeeping)
  * and the incremental-consumption watermark per node. Driver-side file
  * state (tiny), matching the reference's SQLAlchemy log in role. */
final class RunLog(dir: String) {
  Files.createDirectories(Paths.get(dir))
  private val runsPath = Paths.get(dir, "runs.log")
  private val wmDir = Paths.get(dir, "watermarks")
  Files.createDirectories(wmDir)
  private var seq = 0L

  def append(nodeId: String): Unit = synchronized {
    seq += 1
    Files.writeString(runsPath, s"$seq\t$nodeId\n",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  def runs: Seq[(Long, String)] =
    if (!Files.exists(runsPath)) Seq.empty
    else Files.readAllLines(runsPath).asScala.toSeq.map { l =>
      val Array(s, id) = l.split("\t", 2); (s.toLong, id)
    }

  /** Persisted high-watermark for a node's incremental consumption. */
  def setWatermark(nodeId: String, value: String): Unit =
    Files.writeString(wmDir.resolve(nodeId), value)

  def watermark(nodeId: String): Option[String] = {
    val p = wmDir.resolve(nodeId)
    if (Files.exists(p)) Some(Files.readString(p)) else None
  }
}
