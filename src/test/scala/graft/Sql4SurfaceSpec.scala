package graft

import org.apache.spark.sql.functions._

/** The modern-SQL surface rows (VARIANT, pipe syntax, UTF8_LCASE
  * collation, LISTAGG): each is pinned against an independent in-Spark
  * recomputation from base columns, so the DuckDB oracle isn't the only
  * line of defense on these parser/type-system paths. */
class Sql4SurfaceSpec extends SparkSpec {

  test("q_variant round-trips typed values losslessly; missing path is NULL everywhere") {
    val got = SparkEntry.queries("q_variant")(spark, sf001).collect()
    val want = graft.sources.Tables.table(spark, sf001, "events")
      .groupBy(col("event_type").as("t"))
      .agg(count(lit(1)).as("n"),
        round(sum("value"), 2).as("sv"),
        sum("user_id").as("su"),
        sum(get_json_object(col("props"), "$.k").cast("int")).as("sk"),
        count(lit(1)).as("nmiss"))
      .orderBy("t").collect()
    assert(got.map(_.toSeq).toSeq === want.map(_.toSeq).toSeq)
  }

  test("q_sql_pipe lowers to the same result as the ANSI form") {
    val got = SparkEntry.queries("q_sql_pipe")(spark, sf001).collect()
    val want = graft.sources.Tables.table(spark, sf001, "lineitem")
      .filter(col("l_quantity") > 10)
      // net stays UNROUNDED per row; the single round is on the
      // aggregate — the r10 pipe text's lowering (per-row round(x,2)
      // diverged engines at .xx5 repr boundaries, VERDICT r9)
      .withColumn("net",
        col("l_extendedprice") * (lit(1) - col("l_discount")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(round(sum("net"), 2).as("rev"), count(lit(1)).as("n"))
      .filter(col("n") > 100)
      .orderBy("l_returnflag", "l_linestatus")
      .collect()
    assert(got.map(_.toSeq).toSeq === want.map(_.toSeq).toSeq)
  }

  test("q_collation merges case variants: group count == distinct lower(), all rows covered") {
    val part = graft.sources.Tables.table(spark, sf001, "part")
    val got = SparkEntry.queries("q_collation")(spark, sf001).collect()
    val nBrands = part.select(lower(col("p_brand"))).distinct().count()
    assert(got.length === nBrands)
    assert(got.map(_.getLong(1)).sum === part.count())
    // every output key is already lower-cased (normalized representative)
    got.foreach(r => assert(r.getString(0) === r.getString(0).toLowerCase))
  }

  test("q_listagg equals the collect_set spelling and is order-deterministic") {
    val got = SparkEntry.queries("q_listagg")(spark, sf001).collect()
    val want = graft.sources.Tables.table(spark, sf001, "orders")
      .groupBy("o_orderpriority")
      .agg(array_join(array_sort(collect_set(col("o_orderstatus"))), "|")
          .as("statuses"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority").collect()
    assert(got.map(_.toSeq).toSeq === want.map(_.toSeq).toSeq)
  }
}
