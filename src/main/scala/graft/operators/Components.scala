package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the final stage of fuzzy
  * deduplication: near-dup PAIRS (from LSH/Jaccard/SimHash) are only
  * pairwise evidence; transitive closure groups them into duplicate
  * CLUSTERS so a pipeline can keep exactly one representative per cluster
  * (the min id, which doubles as the component label).
  *
  * Algorithm: hash-min label propagation. Every vertex starts labeled with
  * its own id; each round every vertex adopts the minimum label among
  * itself and its neighbors; fixpoint = each vertex holds the minimum id
  * reachable from it, i.e. its component. Each round is one equi-join
  * (edges ⋈ labels on the source vertex) plus a min-aggregate — plain
  * shuffles Catalyst plans like any join/agg, no driver-side graph state.
  *
  * Scale notes (100 TB):
  *  - rounds needed = graph diameter. Near-dup clusters are dense (most
  *    members pairwise-similar), so diameters are tiny (2–4) and hash-min
  *    converges in a handful of rounds; for adversarially long chain
  *    graphs the known accelerant is the large-star/small-star reshaping
  *    of Kiveris et al., "Connected Components in MapReduce and Beyond"
  *    (SoCC'14), which this implementation deliberately omits — dedup
  *    graphs don't need it and it triples the per-round shuffle count;
  *  - per round the loop materializes labels via eager `localCheckpoint`
  *    to truncate lineage (an iterative DataFrame otherwise re-plans a
  *    growing tree each round). On a real cluster with executor loss risk,
  *    set a checkpoint dir and swap in reliable `checkpoint` — same code
  *    shape, durable shuffle files;
  *  - convergence is detected from `sum(labels)`: labels only ever
  *    decrease, so an unchanged sum ⟺ no label moved — one cheap
  *    aggregate per round instead of a self-join diff.
  */
object Components {

  /** Components of the undirected graph given by (srcCol, dstCol) integer
    * edge endpoints. Returns (id, comp): one row per vertex appearing in
    * any edge, comp = min vertex id in its component. Vertices with no
    * edges are absent (their component is trivially themselves — callers
    * wanting them add a left join + coalesce(comp, id)). */
  def connectedComponents(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", maxIter: Int = 20): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("s"),
      col(dstCol).cast("long").as("d"))
    val sym = e.union(e.select(col("d").as("s"), col("s").as("d")))
      .distinct().localCheckpoint(true)
    var labels = sym.select(col("s").as("id")).distinct()
      .withColumn("comp", col("id")).localCheckpoint(true)
    // decimal(38,0) sum: exact and unoverflowable for any vertex count ×
    // id range (sum(long) could wrap — or throw under ANSI — at extreme n)
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("comp").cast("decimal(38,0)")),
        lit(java.math.BigDecimal.ZERO))).head.getDecimal(0)
    var last = labelSum(labels)
    var iter = 0
    var converged = labels.isEmpty
    // a diameter-d graph needs d label-moving rounds plus ONE no-change
    // round to OBSERVE the fixpoint, so allow maxIter+1 total rounds:
    // maxIter == diameter must succeed, not spuriously report divergence
    while (iter <= maxIter && !converged) {
      val msgs = sym.join(labels.withColumnRenamed("id", "s"), "s")
        .select(col("d").as("id"), col("comp"))
        .groupBy("id").agg(min("comp").as("nc"))
      val next = labels.join(msgs, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nc"), col("comp"))).as("comp"))
        .localCheckpoint(true)
      val s = labelSum(next)
      converged = s.compareTo(last) == 0
      last = s
      // `next` is eagerly materialized with lineage truncated at its own
      // checkpoint, so the previous round's labels are unreferenced once
      // reassigned; the ContextCleaner reclaims their checkpoint blocks
      // (Dataset.unpersist would be a no-op here — it only clears
      // CacheManager entries, not localCheckpoint RDD storage)
      labels = next
      iter += 1
    }
    require(converged, s"connectedComponents did not converge with maxIter=" +
      s"$maxIter — graph diameter exceeds maxIter (raise it, or use a " +
      "star-contraction variant for chain-like graphs)")
    labels
  }

  /** Duplicate clusters from near-dup pairs: components plus per-cluster
    * size, one row per clustered vertex. comp is the keeper (min id). */
  def dupClusters(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cc = connectedComponents(pairs, aCol, bCol)
    cc.join(cc.groupBy("comp").agg(count(lit(1)).as("sz")), "comp")
      .select(col("id"), col("comp"), col("sz"))
  }
}
