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

  /** Uniform bucket in [0, buckets): first 32 bits of md5(key as string).
    * Key is cast to string first so integer keys hash identically across
    * engines ("123" everywhere). */
  def hashBucket(key: Column, buckets: Int): Column = {
    require(buckets > 0, s"buckets must be positive (got $buckets)")
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long") % buckets
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
}
