package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** IVF (inverted-file) approximate nearest neighbour: k coarse centroids
  * trained by Lloyd's iterations, then search probes only the `nprobe`
  * closest cells.
  *
  * Scale shape — the classic distributed k-means split: centroids are tiny
  * driver-side state (k × dim floats, like every k-means implementation),
  * embedded into the plan as literals each pass; cell assignment is then a
  * NARROW argmin over the broadcast literals (codegen'd dot products, no
  * crossJoin, no shuffle), and the only shuffle per iteration is the
  * k-group mean aggregation. Search touches `nprobe`/k of the data — with
  * the cell id as a partition column that is partition pruning at the scan.
  */
object Ivf {

  type Centroids = Array[(Int, Array[Float])]

  /** Squared L2 distance from the embedding column to a literal centroid. */
  private def dist2Lit(embCol: String, c: Array[Float]): Column = {
    val lit2 = typedlit(c)
    VectorFunctions.norm2(col(embCol)) +
      lit(c.map(x => x.toDouble * x).sum) -
      VectorFunctions.dotProduct(col(embCol), lit2) * 2
  }

  /** Nearest-cell index as a column: argmin = position of the min distance
    * (first occurrence on ties → the smaller cell id). Cell ids are the
    * 0-based positions of `centroids`. */
  def cellOf(centroids: Centroids, embCol: String): Column = {
    val ds = array(centroids.map { case (_, c) => dist2Lit(embCol, c) }: _*)
    (array_position(ds, array_min(ds)) - 1).cast("int")
  }

  /** Train k centroids with `iters` Lloyd iterations (init: first k vectors
    * in id order). Deterministic. */
  def train(emb: DataFrame, idCol: String, embCol: String, k: Int,
      iters: Int): Centroids = {
    var centroids: Centroids = emb.orderBy(col(idCol)).limit(k)
      .select(col(embCol)).collect()
      .map(_.getSeq[Float](0).toArray).zipWithIndex.map(_.swap)
    (1 to iters).foreach { _ =>
      val means = emb
        .select(cellOf(centroids, embCol).as("cell"),
          posexplode(col(embCol)).as(Seq("i", "v")))
        .groupBy("cell", "i").agg(avg("v").as("m"))
        .collect()
      // re-index 0..k'-1: a cell can go empty, and cellOf maps cells by
      // position in this array
      centroids = means.groupBy(_.getInt(0)).toArray
        .map { case (cell, rows) =>
          cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2).toFloat)
        }.sortBy(_._1).zipWithIndex.map { case ((_, arr), i) => (i, arr) }
    }
    centroids
  }

  /** Assign each row its nearest cell (narrow, shuffle-free). */
  def assign(emb: DataFrame, centroids: Centroids, embCol: String): DataFrame =
    emb.withColumn("cell", cellOf(centroids, embCol))

  /** Top-k cosine within the `nprobe` cells nearest to the query vector.
    * Probe selection is driver-side arithmetic on the tiny centroid set. */
  def search(emb: DataFrame, centroids: Centroids, idCol: String,
      embCol: String, queryId: Long, k: Int, nprobe: Int): DataFrame = {
    val q = emb.filter(col(idCol) === queryId)
      .select(col(embCol)).collect().head.getSeq[Float](0).toArray
    val probed = centroids
      .map { case (cell, c) =>
        val d2 = c.zip(q).map { case (a, b) => val d = a.toDouble - b; d * d }.sum
        (d2, cell)
      }.sorted.take(nprobe).map(_._2).toSeq
    val qv = typedlit(q)
    assign(emb, centroids, embCol)
      .filter(col("cell").isin(probed: _*) && col(idCol) =!= queryId)
      .select(col(idCol),
        round(VectorFunctions.dotProduct(col(embCol), qv) /
          (sqrt(VectorFunctions.norm2(col(embCol))) *
            lit(math.sqrt(q.map(x => x.toDouble * x).sum))), 4).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }
}
