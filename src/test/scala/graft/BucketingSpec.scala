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

  test("LSH band index bucketed on the probe key: delta probe never shuffles the corpus") {
    // the 100 TB form of the persisted near-dup index: band rows written
    // BUCKETED on the join key (band_id, bv), so a daily delta probe
    // joins against them with the one exchange on the DELTA side only —
    // the corpus-sized index is never reshuffled, batch after batch
    import graft.operators.Dedup
    import graft.sources.Tables
    val docs = Tables.table(spark, sf001, "documents")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val delta = docs.filter(col("doc_id") % 10 === 0)
    spark.sql("DROP TABLE IF EXISTS b_bands")
    Dedup.lshBands(corpus, "doc_id", "text", 8, 2)
      .write.bucketBy(8, "band_id", "bv").sortBy("band_id", "bv")
      .mode("overwrite").saveAsTable("b_bands")
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val probe = Dedup.lshBands(delta, "doc_id", "text", 8, 2)
        .select(col("doc_id").as("nid"), col("band_id"), col("bv"))
      val index = spark.table("b_bands")
        .select(col("doc_id").as("oid"), col("band_id").as("band_id2"),
          col("bv").as("bv2"))
      val cands = probe.join(index,
        col("band_id") === col("band_id2") && col("bv") === col("bv2") &&
          col("nid") =!= col("oid"))
      val plan = cands.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // exactly one exchange — the delta side aligning to the index's
      // bucketing; the bucketed scan feeds the join exchange-free
      assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
        plan)
      assert(cands.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
      spark.sql("DROP TABLE IF EXISTS b_bands")
    }
  }
}
