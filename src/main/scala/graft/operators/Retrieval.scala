package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Hybrid-retrieval primitives: rank fusion across retriever lists and
  * ranking-quality evaluation — the operators that sit between a corpus
  * engine's retrievers (BM25, embedding ANN) and a training-data or
  * search pipeline consuming their merged output.
  *
  * Scale posture: every ranked list entering fusion is already top-k
  * BOUNDED (TakeOrderedAndProject on the retriever side), so the window
  * functions here run over k-row frames, never the corpus; fusion itself
  * is a union + hash aggregate over ≤ Σk rows. NDCG broadcasts the query
  * set (rows = #queries, tiny by construction) and scans the corpus once
  * — the same train-once/score-many shape as the text scorers.
  */
object Retrieval {

  /** Attach a dense 1-based rank to a BOUNDED ranked list. `df` must
    * already be top-k (call `.orderBy(...).limit(k)` upstream): the
    * global row_number window is a deliberate single-partition pass over
    * ≤ k rows, not the corpus. Ordering must be total (tie-broken to a
    * unique key) or ranks are not reproducible across engines. */
  def withRank(df: DataFrame, order: Seq[Column]): DataFrame = {
    // withColumn would silently OVERWRITE an existing rank (and rrfFuse
    // would then fuse the wrong ranking) — collide loudly instead, the
    // Bloom.prune FilterCol discipline
    require(!df.columns.contains("rank"),
      "withRank: input already has a 'rank' column — drop or rename it " +
        "(it would be silently overwritten)")
    df.withColumn("rank", row_number().over(Window.orderBy(order: _*)))
  }

  /** Reciprocal-rank fusion (Cormack et al. '09): score(d) =
    * Σ_lists 1/(k0 + rank_list(d)). Each input frame carries (`idCol`,
    * `rank`); a document absent from a list simply contributes nothing —
    * the union + groupBy formulation IS the outer join, without chaining
    * L-1 joins. k0=60 is the canonical damping constant. Doubles: each
    * contribution is exactly 1/(k0+r) and lists are ≤ a handful, so the
    * rounded sum is engine-stable. */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, k0: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs >= 1 ranked list")
    lists.map(_.select(col(idCol), col("rank")))
      .reduce(_ unionByName _)
      .groupBy(idCol)
      .agg(round(sum(lit(1.0) / (lit(k0) + col("rank"))), 6).as("rrf"),
        count(lit(1)).as("nl"))
  }

  /** NDCG@k of the exact-cosine retriever against a label column: for
    * each query vector, rank the rest of the corpus by cosine (rounded
    * to 4 dp BEFORE ranking, ties → id, so ranks are engine-stable),
    * take the top k, and score binary relevance rel = [label = query's
    * label]. DCG = Σ rel/log2(rank+1); IDCG places the min(k, #relevant)
    * relevant docs first. Returns (qid, nrel, ndcg) per query.
    *
    * The query set (`queryIds`) is broadcast — corpus scans once, no
    * shuffle until the per-query top-k. IDCG's Σ 1/log2(i+1) runs as a
    * sequence-fold expression, O(k) per query row. */
  def ndcgAtK(emb: DataFrame, idCol: String, embCol: String,
      labelCol: String, queryIds: Seq[Long], k: Int): DataFrame = {
    require(queryIds.nonEmpty && k > 0, "ndcgAtK needs queries and k > 0")
    val q = emb.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("qid"), col(embCol).as("qe"),
        col(labelCol).as("ql"), Similarity.norm(embCol).as("qn"))
    val scored = emb
      .crossJoin(broadcast(q))
      .filter(col(idCol) =!= col("qid"))
      .select(col("qid"), col("ql"), col(idCol), col(labelCol),
        round(Similarity.dot(embCol, "qe") /
          (Similarity.norm(embCol) * col("qn")), 4).as("cos"))
    val ranked = scored.withColumn("r", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col(idCol))))
    val dcg = ranked.filter(col("r") <= k)
      .groupBy("qid")
      .agg(sum(when(col(labelCol) === col("ql"),
        lit(1.0) / (log(col("r") + 1) / log(lit(2.0)))).otherwise(0.0)).as("dcg"))
    val nrel = scored.groupBy("qid")
      .agg(least(sum(when(col(labelCol) === col("ql"), 1L).otherwise(0L)),
        lit(k.toLong)).as("nrel"))
    nrel.join(dcg, "qid")
      // CASE guards the fold: sequence(1, 0) would run DOWNWARD in Spark
      // (step −1) and hit 1/log2(1) = ∞; nrel = 0 must yield idcg = 0
      .withColumn("idcg", when(col("nrel") > 0, expr(
        "aggregate(sequence(1, int(nrel)), 0D, (a, i) -> a + double(1)/(ln(i+1)/ln(2)))"))
        .otherwise(lit(0.0)))
      .select(col("qid"), col("nrel"),
        round(when(col("idcg") > 0, col("dcg") / col("idcg")).otherwise(0.0), 4)
          .as("ndcg"))
  }
}
