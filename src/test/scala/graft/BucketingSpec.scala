package graft

import org.apache.spark.sql.functions._

/** Bucketing = pre-shuffled storage: two tables bucketed on the join key
  * join WITHOUT an exchange — the co-located-join technique that turns the
  * dominant 100 TB fact⋈fact cost into a local merge. Plan-asserted here
  * because it is invisible to correctness tests. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("joins between co-bucketed tables plan no shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    val orders = (1L to 200L).map(i => (i, i % 7)).toDF("o_orderkey", "o_flag")
    val lineitem = (1L to 600L).map(i => (i % 200 + 1, i)).toDF("l_orderkey", "l_id")
    orders.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    lineitem.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    // disable broadcast so the join would otherwise shuffle both sides
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(joined.count() == 600)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
