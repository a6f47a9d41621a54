package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The reference's signature incremental pipes (SURVEY.md §1.1, §2.8) as
  * reusable DataFrame operators: block accumulation, keep-newest dedupe (the
  * "as dataset" materialization), schema "implements" casting, and
  * high-watermark incremental consumption.
  *
  * Scale posture: `dedupeKeepNewest` is a single hash-shuffle on the unique
  * key followed by a per-partition sort — the same cost as any groupBy at
  * 100 TB, no driver-side state. `accumulate` is a metadata-only union (no
  * shuffle of its own); Catalyst pushes filters/pruning through it into each
  * block scan.
  */
object Incremental {

  /** Union an ordered sequence of blocks by column name. Blocks are the
    * reference's unit of dataflow; the union is lazy and shuffle-free.
    * `allowMissingColumns` enables schema evolution across blocks: a
    * column absent from older blocks surfaces as null there (pair with
    * `mergeSchema` when the blocks live as parquet directories). */
  def accumulate(blocks: Seq[DataFrame],
      allowMissingColumns: Boolean = false): DataFrame =
    blocks.reduce(_.unionByName(_, allowMissingColumns))

  /** Keep exactly one row per `uniqueOn` key: the newest by `newestFirst`
    * ordering (descending recency columns, tie-broken to a unique column so
    * the result is deterministic). The reference's flagship dedupe pipe. */
  def dedupeKeepNewest(df: DataFrame, uniqueOn: Seq[String],
      newestFirst: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(uniqueOn.map(col): _*).orderBy(newestFirst: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Accumulate blocks then dedupe — the reference's "DataSet" view: the
    * latest version of every unique key across all blocks ever produced. */
  def asDataset(blocks: Seq[DataFrame], uniqueOn: Seq[String],
      newestFirst: Seq[Column]): DataFrame =
    dedupeKeepNewest(accumulate(blocks), uniqueOn, newestFirst)

  /** Schema "implements" mapping: project a frame onto a target schema via
    * (sourceColumn, targetName, targetType) triples — the reference's
    * structural-subtyping cast between ObjectSchemas. */
  def schemaCast(df: DataFrame, mapping: Seq[(String, String, String)]): DataFrame =
    df.select(mapping.map { case (src, name, tpe) =>
      col(src).cast(tpe).as(name)
    }: _*)

  /** High-watermark incremental consumption: rows AT OR AFTER the
    * checkpointed watermark (`>=`, matching [[graft.sources.Tables.eventsSince]]).
    * Callers that checkpoint an observed max timestamp must dedupe boundary
    * rows (or advance the watermark past them) — the inclusive bound is
    * chosen so a watermark taken between two equal-timestamp rows never
    * loses the second one. The runner persists the watermark; the predicate
    * pushes down to the scan (partition pruning at scale). */
  def sinceWatermark(df: DataFrame, tsCol: String, watermark: Column): DataFrame =
    df.filter(col(tsCol) >= watermark)

  /** Incremental maintenance of an ADDITIVE aggregate: fold a fresh
    * block's per-key partials into the accumulated ones by summing —
    * new_total = old + delta, no rescan of history. Works for any
    * commutative-monoid aggregate (counts, sums; pair with the sketch
    * merges in CorpusModule/MinHashAgg for distinct-count/similarity
    * state). Both inputs are (keys…, partials…) frames with identical
    * column names; cost is one hash-shuffle over keys of the UNION of the
    * two partial sets — at 100 TB the accumulated side is |keys| rows,
    * not |history| rows, which is the whole point. */
  def mergeAdditive(acc: DataFrame, fresh: DataFrame, keys: Seq[String],
      sums: Seq[String]): DataFrame =
    acc.unionByName(fresh)
      .groupBy(keys.map(col): _*)
      .agg(sum(sums.head).as(sums.head),
        sums.tail.map(c => sum(c).as(c)): _*)
}
