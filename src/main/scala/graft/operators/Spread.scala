package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Scale-adaptive parallelism floor for narrow, compute-heavy stages
  * (optimization guide §2.5 "input skew": one small/unsplittable file).
  *
  * The driver testdata ships each table as ONE parquet file with ONE row
  * group, so every scan plans a single input split and all scan-adjacent
  * narrow work — md5/minhash signatures, tokenization regexes, codec
  * encode/decode, per-row vector math — runs on ONE core of the
  * local[32] session until the first exchange. At 100 TB the same scan
  * has thousands of row-group splits and needs no help; an unconditional
  * `repartition` there would add a full payload shuffle (guide §8: never
  * move heavy bytes to fix a placement problem). So the spread is
  * CONDITIONAL on the measured shape, and the probe is METADATA-ONLY:
  * it walks the ANALYZED plan (already computed eagerly for every
  * Dataset, so this forces no extra analysis, optimization, or physical
  * planning — an earlier `df.rdd.getNumPartitions` probe re-planned the
  * frame per call and measurably slowed the module-graph rows that wire
  * plans several times per run) and spreads exactly when
  *
  *  - the plan is NARROW scan→head (no join/agg/window/sort/limit —
  *    anything above an exchange is already wide), and
  *  - every leaf is a file relation, and
  *  - their total size fits in ONE scan split (≤ maxPartitionBytes), so
  *    Spark would plan single-digit tasks for it, and
  *  - the session actually has parallelism to win (defaultParallelism ≥ 4).
  *
  * At any real scale the size test fails and this is the identity — no
  * shuffle is ever added on a big input. Values are unaffected in all
  * cases: every consumer below a spread is key-based (joins/aggregates)
  * or totally ordered, and round-robin repartition sorts records within
  * input partitions first (SPARK-23207), so retried tasks reproduce the
  * same assignment. */
object Spread {

  /** A/B kill switch (env, read once per JVM): SPARK_GRAFT_SPREAD=0 turns
    * every [[auto]] into the identity, so spread-vs-no-spread is one env
    * flip on identical bits. */
  private val enabled: Boolean =
    sys.env.getOrElse("SPARK_GRAFT_SPREAD", "1") != "0"

  /** True when the analyzed plan is narrow from scan to head: no node
    * that implies an exchange. Unions of narrow branches count as narrow. */
  private def isNarrow(plan: LogicalPlan): Boolean =
    plan.collectFirst {
      case p: Join => p
      case p: Aggregate => p
      case p: Window => p
      case p: Sort => p
      case p: RepartitionOperation => p
      case p: GlobalLimit => p
      case p: Distinct => p
      case p: Deduplicate => p
    }.isEmpty

  /** Total bytes of the plan's file-relation leaves; None when any leaf
    * is not a file relation (checkpointed RDDs, local relations, views
    * over non-file sources — those carry their own partitioning). */
  private def fileBytes(plan: LogicalPlan): Option[Long] = {
    val leaves = plan.collectLeaves()
    val sizes = leaves.map {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        Some(fs.location.sizeInBytes)
      case _ => None
    }
    if (sizes.forall(_.isDefined)) Some(sizes.flatMap(x => x).sum) else None
  }

  /** The adaptive spread: identity unless narrow + single-split-small. */
  def auto(df: DataFrame): DataFrame = {
    if (!enabled) return df
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    if (target < 4) return df
    val plan = df.queryExecution.analyzed
    if (!isNarrow(plan)) return df
    fileBytes(plan) match {
      case Some(bytes)
          if bytes <= spark.sessionState.conf.filesMaxPartitionBytes =>
        df.repartition(target)
      case _ => df
    }
  }
}
