package graft.modules

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.{Graph, Node}
import graft.functions.MinHashDocAgg
import graft.operators.{Components, Dedup, Incremental, TextAnalysis}

/** A packaged, reusable module in the reference's sense — a bundled schema
  * plus pipes you drop into any DAG (the pattern its shipped modules use:
  * declare the shape once, reuse the pipeline everywhere). This one is the
  * canonical training-corpus intake: normalize onto the module schema →
  * (optional) language-gate → (optional) benchmark-decontaminate →
  * PII-scrub → exact-dedupe by content → (optional) near-dedupe keeper
  * election → quality/repetition-score → filter.
  *
  * Every pipe is a pure DataFrame transformation, so the module composes
  * with [[graft.engine.Graph.runIncremental]]: each run processes only new
  * blocks. Note the scope that implies: `dedupe` is exact-dedupe WITHIN
  * the blocks a run sees — under incremental runs that is the delta, so a
  * document whose content already shipped in an earlier block is NOT
  * dropped by a later run. Cross-run global dedupe is a materialization
  * concern: apply [[dedupe]] (or Incremental.asDataset) over the
  * accumulated `kept` outputs when reading the corpus view.
  * The signature helpers maintain per-doc MinHash sketches
  * INCREMENTALLY — a new block's signatures fold into the stored ones by
  * element-wise min (the mergeable-sketch reuse path), so old blocks are
  * never re-read.
  */
object CorpusModule {

  /** The module's document shape, as schema-cast triples. */
  val schema: Seq[(String, String, String)] = Seq(
    ("doc_id", "id", "bigint"),
    ("text", "text", "string"),
    ("lang", "lang", "string"),
    ("n_chars", "n_chars", "int"))

  /** Keep one row per distinct content (md5 fingerprint), smallest id. */
  def dedupe(df: DataFrame): DataFrame =
    Incremental.dedupeKeepNewest(df.withColumn("__fp", md5(col("text"))),
      Seq("__fp"), Seq(col("id").asc)).drop("__fp")

  /** Attach the module's quality + repetition scores (repetition is the
    * within-doc boilerplate signal; both narrow, scan-speed). */
  def score(df: DataFrame): DataFrame =
    df.withColumn("quality", TextAnalysis.qualityScore("text", "n_chars"))
      .withColumn("repetition", TextAnalysis.repetitionRatio(col("text"), 2))

  /** Redact PII in place (emails/phones → typed placeholders). */
  def scrub(df: DataFrame): DataFrame =
    df.withColumn("text", TextAnalysis.scrubPii(col("text")))

  /** Drop every member of a near-dup cluster except its keeper (min id):
    * exact within-lang token-Jaccard pairs ≥ `tau` (inverted-index join,
    * sub-quadratic per shared-token bucket) transitively closed by
    * distributed hash-min components, losers removed by
    * [[Components.keepClusterKeepers]] (AQE-sized anti-join — never a
    * forced broadcast collect of the loser set). At corpus scale swap
    * the edge source for [[Dedup.lshVerifiedPairs]] (same downstream
    * closure — it is threshold-agnostic) and/or pass a hot-token `maxDf`
    * cap; the exact pairs keep this node oracle-able. `maxIter` bounds
    * the components rounds — raise it for chain-shaped near-dup graphs
    * (successive edit versions) whose diameter exceeds 20. */
  def nearDedupe(df: DataFrame, tau: Double, maxIter: Int = 20): DataFrame =
    Components.keepClusterKeepers(df, "id",
      Dedup.jaccardPairs(df, "id", "lang", "text", tau), "da", "db", maxIter)

  /** The pipes, wired over a block source named `docs`: normalize →
    * (optional) language-gate → (optional) benchmark-decontaminate →
    * PII-scrub → exact-dedupe → (optional) near-dedupe → score → filter
    * on quality AND repetition. `benchmark` is the eval set to
    * decontaminate against; None skips the stage. `langs` is a language
    * allowlist gate (the CCNet/fineweb-style first cut); Nil skips it.
    * The gate sits FIRST after normalization on purpose: it is a
    * source-column predicate, so Catalyst pushes it through the
    * normalize node's boundary into the parquet scan itself — at 100 TB
    * the non-allowlisted languages are never decompressed, and every
    * downstream stage (decontaminate's shingle join, the dedupe shuffle)
    * sees only the gated volume. `nearDupJaccard` adds [[nearDedupe]]
    * AFTER the exact stage — exact dedupe first is the production order:
    * it is one cheap hash shuffle and every byte-identical copy it
    * removes never enters the near-dup pair join.
    *
    * CAVEAT — the near-dup node is EAGER: hash-min components runs its
    * iterative rounds (jobs + localCheckpoints) when the node function
    * is invoked during graph wiring, unlike every other node, which only
    * builds a lazy plan. Under [[graft.engine.Graph.runIncremental]]'s
    * at-least-once sink contract that means the pair-join + components
    * cost lands BEFORE the sink's durability point and is repaid
    * wholesale on a retry — acceptable because the stage is
    * deterministic and idempotent, but callers wiring the graph purely
    * for plan inspection should leave `nearDupJaccard` off. */
  def nodes(minQuality: Double = 0.5, maxRepetition: Double = 0.9,
      benchmark: Option[DataFrame] = None, langs: Seq[String] = Nil,
      nearDupJaccard: Option[Double] = None): Seq[Node] = {
    val gate = if (langs.isEmpty) Nil else Seq(
      Node("gated", Seq("normalized"),
        m => m("normalized").filter(col("lang").isin(langs: _*))))
    val afterGate = if (langs.isEmpty) "normalized" else "gated"
    val decon = benchmark.toSeq.map { bench =>
      Node("decontaminated", Seq(afterGate),
        m => Dedup.decontaminate(m(afterGate), bench, "id", "text", 5))
    }
    val afterNorm = if (benchmark.isDefined) "decontaminated" else afterGate
    val near = nearDupJaccard.toSeq.map { tau =>
      Node("neardeduped", Seq("deduped"), m => nearDedupe(m("deduped"), tau))
    }
    val afterDedupe = if (nearDupJaccard.isDefined) "neardeduped" else "deduped"
    Seq(
      Node("normalized", Seq("docs"), m => Incremental.schemaCast(m("docs"), schema))) ++
      gate ++ decon ++ Seq(
      Node("scrubbed", Seq(afterNorm), m => scrub(m(afterNorm))),
      Node("deduped", Seq("scrubbed"), m => dedupe(m("scrubbed")))) ++
      near ++ Seq(
      Node("scored", Seq(afterDedupe), m => score(m(afterDedupe))),
      Node("kept", Seq("scored"), m => m("scored")
        .filter(col("quality") >= minQuality && col("repetition") <= maxRepetition)))
  }

  def graph(minQuality: Double = 0.5, maxRepetition: Double = 0.9,
      benchmark: Option[DataFrame] = None, langs: Seq[String] = Nil,
      nearDupJaccard: Option[Double] = None): Graph =
    new Graph(nodes(minQuality, maxRepetition, benchmark, langs, nearDupJaccard))

  /** Per-doc MinHash signatures of one block: (id, sig). Partial-agg
    * friendly (typed Aggregator → map-side combine before the shuffle). */
  def signatures(docs: DataFrame, k: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("id").cast("long"), explode(split(col("text"), " ")).as("tok"))
      .as[(Long, String)]
      .groupByKey(_._1)
      .agg(new MinHashDocAgg(k).toColumn.name("sig"))
      .toDF("id", "sig")
  }

  /** Fold new signatures into accumulated ones: element-wise min per id
    * (full outer join — docs seen in only one side pass through). Equals
    * the batch signature over the union of blocks, by sketch mergeability. */
  def mergeSignatures(acc: DataFrame, fresh: DataFrame): DataFrame =
    acc.select(col("id"), col("sig").as("__sa"))
      .join(fresh.select(col("id"), col("sig").as("__sb")), Seq("id"), "full")
      .select(col("id"), coalesce(
        zip_with(col("__sa"), col("__sb"), (x, y) => least(x, y)),
        col("__sa"), col("__sb")).as("sig"))
}
