package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Similarity search over an embedding column (`array<float>`).
  *
  * The exact path broadcasts the query vector and evaluates the dot product
  * as a codegen'd higher-order function per candidate row — a single
  * narrow-dependency scan plus a top-k, no posexplode blowup, no shuffle
  * except the final TakeOrdered. That is the 100 TB shape: 1000 executors
  * each score their partitions against the broadcast vector.
  *
  * The bucketed (LSH/IVF-style) path prunes candidates to the query's
  * coarse bucket first — here sign-bit buckets over leading dimensions (a
  * fixed random-hyperplane LSH with axis-aligned planes); a real deployment
  * would store the bucket as a partition column so pruning happens at the
  * parquet-scan level (partition pruning), reading 1/2^bits of the data.
  *
  * Float products are accumulated in double, index order — bit-portable to
  * the DuckDB oracle.
  */
object Similarity {

  /** Double-accumulated dot product of two float-array columns —
    * the codegen'd [[graft.functions.DotProduct]] expression (primitive
    * loop in whole-stage codegen; bit-identical to the interpreted
    * `zip_with`+`aggregate` formulation the oracle uses). */
  def dot(a: String, b: String): Column =
    VectorFunctions.dotProduct(col(a), col(b))

  /** L2 norm of a float-array column. */
  def norm(a: String): Column =
    sqrt(VectorFunctions.norm2(col(a)))

  /** Exact cosine top-k of `emb` rows vs the row with id `queryId`.
    * Returns (idCol, cos) ordered desc, k rows. With
    * `excludeLabel = Some(c)`, candidates sharing the query row's value
    * of column `c` are dropped (hard-negative mining: nearest vectors
    * that are known-irrelevant) and `c` rides along in the output; the
    * label predicate evaluates against the broadcast query row during
    * the scan-side join (only the id filter is scan-pushable). Both
    * modes share one ranking discipline: round to 4 dp BEFORE the
    * order, id tie-break. */
  def cosineTopK(emb: DataFrame, idCol: String, embCol: String,
      queryId: Long, k: Int,
      excludeLabel: Option[String] = None): DataFrame = {
    val qCols = col(embCol).as("qe") +:
      excludeLabel.map(l => col(l).as("_ql")).toSeq
    val qv = emb.filter(col(idCol) === queryId).select(qCols: _*)
    var cands = emb.filter(col(idCol) =!= queryId).crossJoin(broadcast(qv))
    excludeLabel.foreach(l => cands = cands.filter(col(l) =!= col("_ql")))
    cands.select((col(idCol) +: excludeLabel.map(col).toSeq :+
        round(dot(embCol, "qe") / (norm(embCol) * norm("qe")), 4).as("cos")): _*)
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Sign-bit coarse bucket from the first `bits` dimensions: bucket =
    * Σ 2^i · [emb[i] > 0]. Deterministic, portable, partitionable. */
  def signBucket(embCol: String, bits: Int): Column =
    (0 until bits).map { i =>
      when(expr(s"element_at($embCol, ${i + 1})") > 0, lit(1 << (bits - 1 - i)))
        .otherwise(0)
    }.reduce(_ + _)

  /** ANN top-k: exact cosine ranking restricted to the query's sign bucket
    * (recall < 1 by construction; the scale path reads one bucket). */
  def annBucketTopK(emb: DataFrame, idCol: String, embCol: String,
      queryId: Long, k: Int, bits: Int = 3): DataFrame = {
    val bucketed = emb.withColumn("bk", signBucket(embCol, bits))
    val qb = bucketed.filter(col(idCol) === queryId)
      .select(col(embCol).as("qe"), col("bk").as("qbk"))
    bucketed.filter(col(idCol) =!= queryId)
      .join(broadcast(qb), col("bk") === col("qbk"))
      .select(col(idCol),
        round(dot(embCol, "qe") / (norm(embCol) * norm("qe")), 4).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Multi-probe ANN top-k: exact cosine ranking restricted to the
    * query's sign bucket AND every bucket at Hamming distance 1 from it —
    * the standard recall-recovery technique (Lv et al., "Multi-Probe
    * LSH", VLDB'07): a vector near a hyperplane lands on either side, so
    * probing single-bit flips recovers the neighbors single-bucket search
    * loses. The probe set (1 + bits buckets) is a broadcast IN-list over
    * the bucket column — with buckets as partition columns that is
    * (1+bits)/2^bits of the data read, still sub-linear, recall strictly
    * ≥ the single-probe path (measured in SimilaritySpec). */
  def annMultiProbeTopK(emb: DataFrame, idCol: String, embCol: String,
      queryId: Long, k: Int, bits: Int = 3): DataFrame = {
    val bucketed = emb.withColumn("bk", signBucket(embCol, bits))
    val probes = (0 until bits).map(i => expr(s"qbk0 ^ ${1 << i}"))
    val qb = bucketed.filter(col(idCol) === queryId)
      .select(col(embCol).as("qe"), col("bk").as("qbk0"))
      .select(col("qe"), array((col("qbk0") +: probes): _*).as("qbks"))
    bucketed.filter(col(idCol) =!= queryId)
      .join(broadcast(qb), array_contains(col("qbks"), col("bk")))
      .select(col(idCol),
        round(dot(embCol, "qe") / (norm(embCol) * norm("qe")), 4).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Write `emb` partitioned by its [[signBucket]] — the ANN layout the
    * scaladoc above promises: the bucket becomes a PARTITION column
    * (`bk=<n>/` directories), so a probe's bucket filter prunes at file
    * listing and a (1+bits)-bucket multi-probe reads (1+bits)/2^bits of
    * the files. Written once at ingest; [[annMultiProbePruned]] is the
    * read side. (Plan-asserted in PlanSpec: PartitionFilters + numFiles.) */
  def writeBucketedEmbeddings(emb: DataFrame, embCol: String, bits: Int,
      outDir: String): Unit =
    emb.withColumn("bk", signBucket(embCol, bits))
      .write.mode("overwrite").partitionBy("bk").parquet(outDir)

  /** Multi-probe ANN top-k over a [[writeBucketedEmbeddings]] layout. The
    * query VECTOR is a parameter (in production the query embedding
    * arrives from outside the corpus), so its bucket and the Hamming-1
    * probe set are computed driver-side as LITERALS — which is exactly
    * what lets Catalyst turn the bucket filter into PartitionFilters and
    * skip the other 2^bits − (1+bits) directories at file listing. Same
    * ranking arithmetic as [[annMultiProbeTopK]]. */
  def annMultiProbePruned(spark: org.apache.spark.sql.SparkSession,
      dir: String, idCol: String, embCol: String,
      queryVec: Array[Float], k: Int, bits: Int = 3): DataFrame = {
    require(queryVec.length >= bits, s"query dim ${queryVec.length} < bits $bits")
    val qbk = (0 until bits).map(i => if (queryVec(i) > 0) 1 << (bits - 1 - i) else 0).sum
    val probes = qbk +: (0 until bits).map(i => qbk ^ (1 << i))
    val qe = typedlit(queryVec)
    val qn = math.sqrt(queryVec.map(x => x.toDouble * x).sum)
    spark.read.parquet(dir)
      .filter(col("bk").isin(probes: _*))
      .select(col(idCol),
        round(VectorFunctions.dotProduct(col(embCol), qe) /
          (norm(embCol) * lit(qn)), 4).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Near-duplicate pairs (da < db) with cosine ≥ tau, bucket-blocked:
    * both sides carry their [[signBucket]] and the pair join is an
    * EQUI-join on the bucket with `da < db` as a residual — a plain
    * shuffle join Catalyst plans like any other (never a cartesian /
    * BroadcastNestedLoopJoin; plan-asserted in PlanSpec). Near-identical
    * vectors agree on sign bits, so true near-dups share a bucket; with
    * `bucketBits` = b the pair space shrinks ~2^b-fold. At 100 TB the
    * bucket is the blocking key: 2^b independent shuffle partitions,
    * AQE splitting any hot bucket. Requires dim ≥ bucketBits. */
  def cosinePairs(emb: DataFrame, idCol: String, embCol: String,
      tau: Double, bucketBits: Int = 6): DataFrame = {
    val e = emb.select(col(idCol).as("vid"), col(embCol).as("e"),
      norm(embCol).as("nrm"), signBucket(embCol, bucketBits).as("bk"))
    val a = e.select(col("vid").as("da"), col("e").as("ea"),
      col("nrm").as("na"), col("bk"))
    val b = e.select(col("vid").as("db"), col("e").as("eb"),
      col("nrm").as("nb"), col("bk").as("bk2"))
    a.join(b, col("bk") === col("bk2") && col("da") < col("db"))
      .select(col("da"), col("db"), (dot("ea", "eb") / (col("na") * col("nb"))).as("cos"))
      .filter(col("cos") >= tau)
  }

  /** Semantic dedup clusters (SemDeDup, Abbas et al. 2023): embedding
    * near-dup pairs from [[cosinePairs]] transitively closed into
    * clusters by [[Components.dupClusters]] — one row per clustered
    * vector with its cluster label (`comp`, the min member id = the
    * conventional keeper) and cluster size. Downstream: anti-join
    * non-keepers against the corpus, exactly like token-level
    * `q_dedup_apply`. Both stages are the library's scale paths
    * (bucket-blocked pair join; distributed hash-min propagation). */
  def semanticDupClusters(emb: DataFrame, idCol: String, embCol: String,
      tau: Double, bucketBits: Int = 6): DataFrame =
    Components.dupClusters(
      cosinePairs(emb, idCol, embCol, tau, bucketBits), "da", "db")

  /** Embedding-space decontamination: drop every `train` row whose vector
    * sits within cosine ≥ tau of ANY `bench` vector — the semantic
    * complement to the n-gram [[Dedup.decontaminate]]: paraphrased eval
    * leakage shares no verbatim n-gram but still lands next to the
    * benchmark in embedding space.
    *
    * Scale shape (100 TB): benchmarks are small by construction, so the
    * bench vectors (+ precomputed norms) are BROADCAST and scoring is one
    * narrow scan of the corpus — each executor scores its partitions
    * against the in-memory bench matrix with the codegen'd dot product;
    * the corpus itself never shuffles. Exact by construction (every
    * train×bench pair is scored — no bucketing recall loss); the
    * all-pairs form is safe precisely because one side is benchmark-
    * sized. Returns the clean subset of `train`. */
  def embeddingDecontaminate(train: DataFrame, bench: DataFrame,
      idCol: String, embCol: String, tau: Double): DataFrame = {
    val b = broadcast(bench.select(col(embCol).as("be"),
      sqrt(VectorFunctions.norm2(col(embCol))).as("bn")))
    val contaminated = train
      .select(col(idCol), col(embCol), norm(embCol).as("tn"))
      .crossJoin(b)
      .filter(VectorFunctions.dotProduct(col(embCol), col("be")) /
        (col("tn") * col("bn")) >= tau)
      .select(idCol).distinct()
    // contaminated-id set is usually tiny (AQE broadcasts it) but corpus-
    // dependent — no hint, same reasoning as the n-gram decontaminate
    train.join(contaminated, Seq(idCol), "left_anti")
  }

  /** All pairs (da < db) with cosine ≥ tau — the EXACT O(n²) form, which
    * plans as a nested-loop join. Verification-only: use it to score a
    * bounded candidate set (e.g. [[cosinePairs]] or LSH output), never a
    * full corpus — there is deliberately no declared query on this path. */
  def cosinePairsExact(emb: DataFrame, idCol: String, embCol: String,
      tau: Double): DataFrame = {
    val e = emb.select(col(idCol).as("vid"), col(embCol).as("e"),
      norm(embCol).as("nrm"))
    val a = e.select(col("vid").as("da"), col("e").as("ea"), col("nrm").as("na"))
    val b = e.select(col("vid").as("db"), col("e").as("eb"), col("nrm").as("nb"))
    a.join(b, col("da") < col("db"))
      .select(col("da"), col("db"), (dot("ea", "eb") / (col("na") * col("nb"))).as("cos"))
      .filter(col("cos") >= tau)
  }
}
