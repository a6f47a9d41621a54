package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** IVF (inverted-file) approximate nearest neighbour: k coarse centroids
  * trained by Lloyd's iterations expressed as DataFrame aggregations, then
  * search probes only the `nprobe` closest cells.
  *
  * Scale shape: training is `iters` passes of (broadcast k centroids →
  * narrow argmin assignment → groupBy-avg shuffle of k groups); k is small
  * (≤ thousands), so the per-pass shuffle is trivial and the centroid set
  * always broadcasts. Search reads only the probed cells — with the cell id
  * as a partition column, that is partition pruning at the scan. The
  * assignment distance uses the codegen'd [[graft.functions.DotProduct]].
  */
object Ivf {

  /** Squared L2 distance between a row's embedding and a broadcast
    * centroid array column (both array<float>). */
  private def dist2(e: String, c: String): Column =
    VectorFunctions.norm2(col(e)) + VectorFunctions.norm2(col(c)) -
      VectorFunctions.dotProduct(col(e), col(c)) * 2

  /** Train k centroids with `iters` Lloyd iterations. Deterministic:
    * seeded by the first k vectors in id order. Returns (cell, centroid). */
  def train(emb: DataFrame, idCol: String, embCol: String, k: Int,
      iters: Int): DataFrame = {
    var centroids = emb.orderBy(col(idCol)).limit(k)
      .select(col(idCol), col(embCol).as("centroid"))
      .withColumn("cell", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col(idCol))) - 1)
      .drop(idCol)
    (1 to iters).foreach { _ =>
      val assigned = assign(emb, centroids, idCol, embCol)
      centroids = assigned
        .select(col("cell"), posexplode(col(embCol)).as(Seq("i", "v")))
        .groupBy("cell", "i").agg(avg("v").as("m"))
        .groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("i"), col("m")))),
          x => x("m").cast("float")).as("centroid"))
    }
    centroids.select("cell", "centroid")
  }

  /** Assign each row to its nearest centroid cell (broadcast + argmin). */
  def assign(emb: DataFrame, centroids: DataFrame, idCol: String,
      embCol: String): DataFrame = {
    val withDist = emb.crossJoin(broadcast(centroids))
      .withColumn("__d", dist2(embCol, "centroid"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__d"), col("cell"))
    withDist.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__d", "centroid")
  }

  /** Top-k cosine within the `nprobe` cells nearest to the query vector. */
  def search(emb: DataFrame, centroids: DataFrame, idCol: String,
      embCol: String, queryId: Long, k: Int, nprobe: Int): DataFrame = {
    val assigned = assign(emb, centroids, idCol, embCol)
    val qv = assigned.filter(col(idCol) === queryId)
      .select(col(embCol).as("qe"))
    val probeCells = centroids.crossJoin(broadcast(qv))
      .select(col("cell"), dist2("centroid", "qe").as("__d"))
      .orderBy("__d").limit(nprobe).select("cell")
    assigned.join(broadcast(probeCells), "cell")
      .filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(qv))
      .select(col(idCol),
        round(Similarity.dot(embCol, "qe") /
          (Similarity.norm(embCol) * Similarity.norm("qe")), 4).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }
}
