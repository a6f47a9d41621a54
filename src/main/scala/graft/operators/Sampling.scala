package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and split assignment for
  * training-data pipelines.
  *
  * Everything here derives from an md5 hash of the row's key rendered as a
  * string — NOT `rand()` (not reproducible across runs/retries) and NOT
  * Spark's `hash()` (murmur3, not reproducible in other engines). The
  * bucket is a pure narrow expression: assignment, sampling, and splits
  * run at scan speed on 100 TB, are stable under task retries, and give
  * the same answer in any engine that has md5 (the DuckDB oracle checks
  * this bit for bit). A row's split never changes as the corpus grows —
  * the property that keeps train/test membership stable across dataset
  * versions. */
object Sampling {

  /** Raw 32-bit md5 key in [0, 2³²): the uniform underlying
    * [[hashBucket]], exposed where a sampler needs a TOTAL ORDER on the
    * hash (e.g. "k smallest/largest hashes per group" — a deterministic
    * uniform k-sample) rather than a coarse bucket. */
  def hashKey(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long")

  /** Uniform bucket in [0, buckets): first 32 bits of md5(key as string).
    * Key is cast to string first so integer keys hash identically across
    * engines ("123" everywhere). */
  def hashBucket(key: Column, buckets: Int): Column = {
    require(buckets > 0, s"buckets must be positive (got $buckets)")
    hashKey(key) % buckets
  }

  /** Keep a deterministic `percent`% sample by key hash. */
  def sampleByHash(df: DataFrame, keyCol: String, percent: Int): DataFrame = {
    require(percent >= 0 && percent <= 100, s"percent in [0,100] (got $percent)")
    df.filter(hashBucket(col(keyCol), 100) < percent)
  }

  /** Assign each row a named split by cumulative percentage, e.g.
    * Seq("train" -> 90, "val" -> 5, "test" -> 5). Percents must sum to 100
    * so every row lands in exactly one split. */
  def splitColumn(key: Column, splits: Seq[(String, Int)]): Column = {
    require(splits.map(_._2).sum == 100,
      s"split percents must sum to 100 (got ${splits.map(_._2).sum})")
    val bk = hashBucket(key, 100)
    val cums = splits.scanLeft(0)(_ + _._2).tail
    splits.zip(cums).init.foldRight(lit(splits.last._1): Column) {
      case (((name, _), cum), rest) => when(bk < cum, name).otherwise(rest)
    }
  }

  /** `df` with a `split` column attached. */
  def assignSplits(df: DataFrame, keyCol: String,
      splits: Seq[(String, Int)]): DataFrame =
    df.withColumn("split", splitColumn(col(keyCol), splits))

  /** Weighted corpus mixing: each source contributes a deterministic
    * `percent`% hash-sample of its rows, unioned by name. The standard
    * source-weighting step of a training mix — reproducible (same rows
    * every run), schema-checked by the union, and pure narrow filters +
    * a metadata union at any scale. */
  def mixByWeight(sources: Seq[(DataFrame, Int)], keyCol: String): DataFrame = {
    require(sources.nonEmpty, "mixByWeight needs at least one source")
    sources.map { case (df, pct) => sampleByHash(df, keyCol, pct) }
      .reduce(_.unionByName(_))
  }

  /** Temperature-scaled source mixing (the multilingual/multi-corpus
    * rebalancing rule of Raffel et al. 2020 §3.4.3 / Conneau et al. 2020
    * §3): sample group g at rate (n_min/n_g)^(1-alpha), so effective
    * shares follow n_g^alpha — alpha = 1 keeps natural proportions,
    * alpha → 0 approaches uniform across groups. The smallest group is
    * kept whole; bigger groups are deterministically hash-downsampled.
    *
    * Scale shape: one tiny per-group count aggregate broadcast back onto
    * the corpus; membership is then a narrow scan-speed filter — no
    * shuffle of the data itself, stable under retries, and a row's fate
    * never changes as OTHER groups grow (only its own group's count moves
    * its threshold). alpha = 0.5 uses `sqrt` rather than `pow`: IEEE
    * sqrt is correctly rounded where pow need not be, which keeps the
    * threshold bit-identical across engines (the DuckDB oracle relies on
    * this). */
  def temperatureMix(df: DataFrame, keyCol: String, groupCol: String,
      alpha: Double, buckets: Int = 10000): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0,1] (got $alpha)")
    // NULL-group rows are excluded up front: they would otherwise form
    // their own (typically tiny) group, become n_min, and deflate every
    // real group's rate — while themselves vanishing in the equi-join.
    // Filter nulls explicitly (or assign a sentinel group) before calling
    // if they belong in the mix.
    val known = df.where(col(groupCol).isNotNull)
    val counts = known.groupBy(groupCol).agg(count(lit(1)).as("__n"))
    val nMin = counts.agg(min(col("__n")).as("__nmin"))
    val ratio = col("__nmin").cast("double") / col("__n")
    val rate = if (alpha == 0.5) sqrt(ratio) else pow(ratio, 1 - alpha)
    val thresholds = counts.crossJoin(broadcast(nMin))
      .select(col(groupCol), floor(rate * buckets).as("__thr"))
    known.join(broadcast(thresholds), groupCol)
      .filter(hashBucket(col(keyCol), buckets) < col("__thr"))
      .drop("__thr")
  }

  /** Epoch upsampling — the other half of corpus mixing: high-value
    * groups are REPEATED `reps(group)` times (the "books ×3, web ×1"
    * training-mix move; Gao et al. 2020's Pile epochs), each copy tagged
    * with an `epoch` number so downstream shuffling can decorrelate
    * copies (shuffleKey(seed = epoch)). A narrow row generator —
    * explode(sequence) per row, no join, no shuffle; at 100 TB the
    * blow-up happens at scan speed and only the written bytes grow.
    * Unlisted groups default to 1 epoch. */
  def upsample(df: DataFrame, groupCol: String,
      reps: Map[String, Int]): DataFrame = {
    require(reps.values.forall(_ >= 1), s"epoch counts must be >= 1 (got $reps)")
    val repCol = reps.foldLeft(lit(1)) { case (acc, (g, r)) =>
      when(col(groupCol) === g, lit(r)).otherwise(acc)
    }
    df.withColumn("epoch", explode(sequence(lit(1), repCol)))
  }

  /** Deterministic global training order: sort key = md5(seed:key). The
    * "shuffle the corpus" step of a training run as a pure column — same
    * order every run/retry/engine for a given seed, a different
    * decorrelated order per seed (epoch reshuffles = seed bump). At scale
    * ordering by it is one total sort (range-partitioned by Spark), and a
    * top-k probe of the order is a TakeOrdered — no global window, no
    * single-task funnel. */
  def shuffleKey(key: Column, seed: String): Column =
    md5(concat_ws(":", lit(seed), key.cast("string")))

  /** Sequence packing (concat-and-chunk): rows are packed in `orderCol`
    * order into fixed token-budget training sequences — a row joins
    * sequence k of its domain when its domain-running token total starts
    * in [k·budget, (k+1)·budget). Appends `seq_id` to the input.
    *
    * The packing DOMAIN is a parameter: packing is inherently sequential
    * WITHIN a domain (each row's sequence depends on the running sum of
    * everything before it), so the domain is the unit of parallelism —
    * domains pack independently, one window partition each, and no global
    * order is ever imposed. In production the domain is the shard/file
    * (thousands to millions of partitions — even partition-parallel at any
    * scale); packing a whole corpus as ONE domain would serialize it and
    * is the caller's deliberate choice, not a default. Non-negative
    * integer token counts only — the running sum and the `div` bucketing
    * are exact LONG arithmetic end to end (Spark's `/` is double
    * division, which would silently misbin once a domain's running total
    * passed 2^53 — the same hazard IntervalJoin's bin math guards
    * against, and a divergence from the oracle's exact integer `//`). */
  def packSequences(df: DataFrame, domainCols: Seq[String], orderCol: String,
      tokCol: Column, budget: Int): DataFrame = {
    require(domainCols.nonEmpty,
      "packSequences needs >= 1 domain column: an empty domain would pack " +
        "the whole input through a single unpartitioned window")
    require(budget > 0, s"budget must be positive (got $budget)")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(domainCols.map(col): _*).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__tk", tokCol)
      .withColumn("__run", sum("__tk").over(w) - col("__tk"))
      .withColumn("seq_id", expr(s"__run div $budget").cast("bigint"))
      .drop("__tk", "__run")
  }

  /** Weighted-sampling key of Efraimidis & Spirakis (IPL 2006), in the
    * exponential form: key = −ln(u)/w with u uniform in (0, 1] — the k
    * SMALLEST keys are a weighted random sample WITHOUT replacement where
    * each row's inclusion odds are proportional to `weight` (the keys are
    * Exp(w) draws; the minimum of exponentials picks i with probability
    * wᵢ/Σw, recursively). u derives from [[hashKey]], so the "random"
    * sample is deterministic: same rows every run/retry/engine, and a
    * row's key never changes as the corpus grows. u = (hash+1)/2³² stays
    * strictly positive (ln 0 guard) and is EXACT in a double (integer
    * over a power of two), so any engine spelling the same expression
    * reproduces the keys bit-identically. Weights must be positive.
    * Selecting the global top-k by this key is one TakeOrdered — no
    * shuffle of the corpus. */
  def weightedKey(key: Column, weight: Column): Column =
    -log((hashKey(key) + 1).cast("double") / 4294967296.0) / weight

  /** Deterministic uniform k-per-stratum sample: each stratum keeps the k
    * rows with the LARGEST md5 key hashes (hash order ≈ uniform random
    * order, but stable across runs/retries/engines, and a kept row stays
    * kept as its stratum grows only if its hash still clears the bar —
    * the natural "rolling reservoir" under corpus growth).
    *
    * Built on the mergeable bounded [[graft.functions.TopKAgg]], NOT a
    * row_number window: map tasks keep k rows per stratum and the shuffle
    * carries k·|strata| rows regardless of corpus size — the same
    * scale argument as q_topk_group vs q_quota's old window form. Returns
    * (strata…, r, idCol, bk): rank 1..k in descending-hash order and the
    * 32-bit key `bk` (exact in the Double score, cast back losslessly).
    * Integral ids only — the id doubles as the deterministic tie-break. */
  def stratifiedSample(df: DataFrame, idCol: String, k: Int,
      strataCols: Seq[String]): DataFrame = {
    require(strataCols.nonEmpty, "stratifiedSample needs >= 1 stratum column")
    val topk = udaf(new graft.functions.TopKAgg(k),
      org.apache.spark.sql.Encoders.product[graft.functions.Scored])
    val sc = strataCols.map(col)
    df.select(sc :+ hashKey(col(idCol)).cast("double").as("__hk")
        :+ col(idCol).cast("long").as("__id"): _*)
      .groupBy(sc: _*)
      .agg(topk(col("__hk"), col("__id")).as("__tk"))
      .select(sc :+ posexplode(col("__tk")): _*)
      .select(sc :+ (col("pos") + 1).cast("int").as("r")
        :+ col("col.id").as(idCol) :+ col("col.score").cast("long").as("bk"): _*)
  }

  /** DSIR importance weighting (Xie et al., "Data Selection for Language
    * Models via Importance Resampling", NeurIPS 2023): score each raw
    * document by how target-like its hashed-unigram distribution is —
    * weight(doc) = mean over its tokens of ln(p̂_target(b) / p̂_raw(b)),
    * where b is the token's md5 hash bucket and both distributions are
    * add-α smoothed bucket frequencies (α = 0.5, so raw-only buckets
    * score finite). Resampling then keeps the top-weighted docs.
    *
    * Scale shape — the train-once/score-many plan of q_bigram_lm: both
    * count tables are ≤ `buckets` rows (TINY by construction — that is
    * DSIR's point), broadcast onto the token stream; scoring is one
    * narrow join + one per-doc aggregate. The target side is typically a
    * small curated corpus; here the `lang = targetLang` slice stands in.
    * Weight is rounded to 3 dp (sum-order tolerance, house convention).
    * Returns (idCol, ntok, w) for every document. */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
      targetCol: String, targetVal: String, buckets: Int): DataFrame = {
    val alpha = 0.5
    val tok = Spread.auto(df).select(col(idCol), col(targetCol),
        explode(split(col(textCol), " ")).as("tw"))
      .where(col("tw") =!= "")
      .select(col(idCol), col(targetCol),
        (expr("CAST(conv(substr(md5(tw), 1, 15), 16, 10) AS BIGINT)")
          % buckets).as("b"))
    val ct = tok.where(col(targetCol) === targetVal)
      .groupBy("b").agg(count(lit(1)).as("c"))
    val cr = tok.groupBy("b").agg(count(lit(1)).as("c"))
    // totals are sums of the tiny bucket tables — never re-explode the
    // corpus for a scalar the model tables already carry
    val nt = ct.agg(coalesce(sum("c"), lit(0L)).as("n")) // empty target -> 0, not NULL
    val nr = cr.agg(coalesce(sum("c"), lit(0L)).as("n"))
    val lr = cr.as("cr")
      .join(ct.as("ct"), Seq("b"), "left")
      .crossJoin(broadcast(nt.select(col("n").as("tn"))))
      .crossJoin(broadcast(nr.select(col("n").as("rn"))))
      .select(col("b"), log(
        ((coalesce(col("ct.c"), lit(0L)) + alpha) / (col("tn") + alpha * buckets)) /
          ((col("cr.c") + alpha) / (col("rn") + alpha * buckets))).as("r"))
    tok.join(broadcast(lr), Seq("b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("ntok"), round(avg(col("r")), 3).as("w"))
  }
}
