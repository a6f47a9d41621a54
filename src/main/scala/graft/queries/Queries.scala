package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** The declared query inventory (SURVEY.md §2) as idiomatic DataFrame-API
  * plans. Each entry is `(spark, sfDir) => DataFrame` and has a matching
  * DuckDB oracle in [[OracleSql]] unless noted.
  *
  * Correctness conventions (SURVEY §7.4): every query either ends in a
  * total ORDER BY (tie-broken down to a unique key) or is a tiny aggregate;
  * float aggregates are rounded on both engine and oracle sides; grouping
  * nulls are ordered NULLS FIRST explicitly; `date_trunc` results are cast
  * to DATE where month-granular; raw `events.ts` never appears in output.
  *
  * Scale posture: all plans are shuffle-parallel (hash aggregate with
  * map-side partials, sort-merge or broadcast joins, window functions over
  * hash-partitioned keys); nothing collects to the driver.
  */
object Queries {
  type Q = (SparkSession, String) => DataFrame

  private def t(spark: SparkSession, sf: String, name: String): DataFrame =
    Tables.table(spark, sf, name)

  // ---------------------------------------------------------------- scans

  private val qScan: Q = (s, sf) =>
    t(s, sf, "lineitem").agg(count(lit(1)).as("n"))

  /** The ns-timestamp table, grouped — proves the TIMESTAMP(NANOS) read. */
  private val qScanEvents: Q = (s, sf) =>
    t(s, sf, "events").groupBy("event_type")
      .agg(count(lit(1)).as("c"))
      .orderBy("event_type")

  // ------------------------------------------------- projection / filter

  private val qProject: Q = (s, sf) =>
    t(s, sf, "lineitem")
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net"))
      .orderBy("l_orderkey", "net")
      .limit(100)

  private val qFilter: Q = (s, sf) =>
    t(s, sf, "lineitem")
      .filter(col("l_shipdate") >= lit("1994-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1995-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))

  // ---------------------------------------------------------------- joins

  private val qJoinInner: Q = (s, sf) =>
    t(s, sf, "orders")
      .join(t(s, sf, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, sf, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(round(sum("o_totalprice"), 2).as("s"), count(lit(1)).as("c"))
      .orderBy("n_name")

  private val qJoinOuter: Q = (s, sf) =>
    t(s, sf, "customer")
      .join(t(s, sf, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c"))
      .orderBy(col("c").desc, col("c_custkey"))
      .limit(50)

  private val qJoinSemi: Q = (s, sf) =>
    t(s, sf, "customer")
      .join(t(s, sf, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("n"))

  private val qJoinAnti: Q = (s, sf) =>
    t(s, sf, "customer")
      .join(t(s, sf, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n"))

  private val qJoinRange: Q = (s, sf) =>
    t(s, sf, "lineitem")
      .join(t(s, sf, "orders"),
        col("l_orderkey") === col("o_orderkey") && col("l_shipdate") > col("o_orderdate"))
      .agg(count(lit(1)).as("n"))

  // ----------------------------------------------------------- aggregation

  private val qAggGroup: Q = (s, sf) =>
    t(s, sf, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 2).as("sq"),
        round(sum("l_extendedprice"), 2).as("sp"),
        round(avg("l_discount"), 4).as("ad"),
        count(lit(1)).as("c"))
      .orderBy("l_returnflag", "l_linestatus")

  private val qAggDistinct: Q = (s, sf) =>
    t(s, sf, "customer")
      .groupBy("c_mktsegment")
      .agg(countDistinct(col("c_nationkey")).as("dn"))
      .orderBy("c_mktsegment")

  private val qRollup: Q = (s, sf) =>
    t(s, sf, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("c"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first, col("c"))

  private val qCube: Q = (s, sf) =>
    t(s, sf, "customer")
      .cube("c_mktsegment", "c_nationkey")
      .agg(round(sum("c_acctbal"), 2).as("s"))
      .orderBy(col("c_mktsegment").asc_nulls_first, col("c_nationkey").asc_nulls_first)

  // --------------------------------------------------------------- windows

  private val qWindowRank: Q = (s, sf) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, sf, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        rank().over(w).as("r"))
      .filter(col("r") <= 2)
      .orderBy("o_custkey", "r", "o_orderkey")
      .limit(100)
  }

  private val qWindowRunning: Q = (s, sf) => {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, sf, "events")
      .select(col("user_id"), col("event_id"),
        round(sum("value").over(w), 2).as("rs"))
      .orderBy("user_id", "event_id")
      .limit(100)
  }

  private val qWindowLag: Q = (s, sf) => {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t(s, sf, "events")
      .select(col("user_id"), col("event_id"),
        round(col("value") - lag(col("value"), 1, 0.0).over(w), 2).as("d"))
      .orderBy("user_id", "event_id")
      .limit(100)
  }

  // -------------------------------------------------- sort / limit / sets

  private val qSortLimit: Q = (s, sf) =>
    t(s, sf, "orders")
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  private val qSetops: Q = (s, sf) =>
    t(s, sf, "customer").select(col("c_nationkey").as("k"))
      .intersect(t(s, sf, "supplier").select(col("s_nationkey").as("k")))
      .orderBy("k")

  // ------------------------------------------------------ scalar functions

  private val qString: Q = (s, sf) =>
    t(s, sf, "part")
      .filter(col("p_name").like("%a%"))
      .groupBy(upper(substring(col("p_name"), 1, 3)).as("pre"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("pre"))
      .limit(20)

  private val qDate: Q = (s, sf) =>
    t(s, sf, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("m"))
      .agg(count(lit(1)).as("c"), round(sum("o_totalprice"), 2).as("s"))
      .orderBy("m")

  private val qJson: Q = (s, sf) =>
    t(s, sf, "events")
      .groupBy((get_json_object(col("props"), "$.k").cast("int") % 10).as("kb"))
      .agg(count(lit(1)).as("c"))
      .orderBy("kb")

  // ------------------------------------- dags-signature incremental ops

  /** dedupe-unique-keep-newest-row — the reference's flagship pipe. */
  private val qDedupe: Q = (s, sf) => {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    t(s, sf, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("s"))
  }

  // -------------------------------------------------- time-series / text

  private val qTumble: Q = (s, sf) =>
    t(s, sf, "events")
      .groupBy(date_trunc("hour", col("ts")).as("w"), col("event_type"))
      .agg(count(lit(1)).as("c"), round(sum("value"), 2).as("s"))
      .orderBy("w", "event_type")
      .limit(200)

  /** Sessionize with a 30-minute inactivity gap: lag → break flag →
    * running sum = session id → distinct sessions per user. */
  private val qSessionize: Q = (s, sf) => {
    val byTime = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val running = byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevTs = lag(col("ts"), 1).over(byTime)
    t(s, sf, "events")
      .withColumn("brk",
        when(prevTs.isNull || (col("ts").cast("double") - prevTs.cast("double") > 1800), 1)
          .otherwise(0))
      .withColumn("sid", sum("brk").over(running))
      .groupBy("user_id")
      .agg(countDistinct(col("sid")).as("sessions"))
      .orderBy("user_id")
      .limit(100)
  }

  private val qTopkTerms: Q = (s, sf) =>
    t(s, sf, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w")
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(10)

  /** Exact cosine top-k against the query vector (vec_id=0), 100 TB shape:
    * the 1-row query vector is broadcast and the dot product runs as a
    * codegen'd higher-order function per row — no posexplode blowup, no
    * shuffle except the final top-k.
    * Arithmetic note: products are computed float*float then accumulated in
    * double, mirroring the validated oracle (SURVEY Appendix A). */
  private val qCosineTopk: Q = (s, sf) => {
    val emb = t(s, sf, "embeddings")
    val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qv))
      .select(col("vec_id"),
        expr("aggregate(zip_with(embedding, qe, (x, y) -> CAST(x * y AS DOUBLE)), CAST(0.0 AS DOUBLE), (a, v) -> a + v)").as("dot"),
        expr("sqrt(aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x * x AS DOUBLE)))").as("nrm"),
        expr("sqrt(aggregate(qe, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x * x AS DOUBLE)))").as("nq"))
      .select(col("vec_id"), round(col("dot") / (col("nrm") * col("nq")), 4).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10)
  }

  // ---------------------------------------------------------------- map

  val all: Map[String, Q] = Map(
    "q_scan" -> qScan,
    "q_scan_events" -> qScanEvents,
    "q_project" -> qProject,
    "q_filter" -> qFilter,
    "q_agg_group" -> qAggGroup,
    "q_agg_distinct" -> qAggDistinct,
    "q_rollup" -> qRollup,
    "q_cube" -> qCube,
    "q_join_inner" -> qJoinInner,
    "q_join_outer" -> qJoinOuter,
    "q_join_semi" -> qJoinSemi,
    "q_join_anti" -> qJoinAnti,
    "q_join_range" -> qJoinRange,
    "q_window_rank" -> qWindowRank,
    "q_window_running" -> qWindowRunning,
    "q_window_lag" -> qWindowLag,
    "q_sort_limit" -> qSortLimit,
    "q_setops" -> qSetops,
    "q_string" -> qString,
    "q_date" -> qDate,
    "q_json" -> qJson,
    "q_dedupe" -> qDedupe,
    "q_sessionize" -> qSessionize,
    "q_tumble" -> qTumble,
    "q_topk_terms" -> qTopkTerms,
    "q_cosine_topk" -> qCosineTopk)
}
