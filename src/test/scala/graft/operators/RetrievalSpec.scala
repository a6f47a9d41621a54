package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("rrfFuse sums 1/(k0+rank) across lists; absentees score one term") {
    val a = Seq((10L, 1), (20L, 2)).toDF("id", "rank")
    val b = Seq((20L, 1), (30L, 2)).toDF("id", "rank")
    val got = Retrieval.rrfFuse(Seq(a, b), "id")
      .select("id", "rrf").as[(Long, Double)].collect().toSeq.sortBy(_._1)
    // doc 20 appears in both lists (ranks 2 and 1); 10 and 30 in one
    val exp = Seq(
      10L -> BigDecimal(1.0 / 61).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      20L -> BigDecimal(1.0 / 62 + 1.0 / 61).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      30L -> BigDecimal(1.0 / 62).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got === exp)
  }

  test("withRank attaches dense 1-based ranks in the given total order") {
    val df = Seq((5L, 0.9), (7L, 0.9), (2L, 0.5)).toDF("id", "score")
    val got = Retrieval.withRank(df, Seq(col("score").desc, col("id")))
      .select("id", "rank").as[(Long, Int)].collect().toMap
    assert(got === Map(5L -> 1, 7L -> 2, 2L -> 3))
  }

  test("ndcgAtK is 1.0 for a perfect retriever and scores a planted miss") {
    // axis-aligned clusters: label 0 points near e1, label 1 near e2 —
    // every same-label vector outranks every cross-label one, so NDCG@2
    // for query 0 is exactly 1. dim 4 >= any bucket needs.
    val emb = Seq(
      (0L, Array(1.0f, 0.1f, 0f, 0f), 0),
      (1L, Array(1.0f, 0.2f, 0f, 0f), 0),
      (2L, Array(0.9f, 0.15f, 0f, 0f), 0),
      (3L, Array(0.1f, 1.0f, 0f, 0f), 1),
      (4L, Array(0.2f, 1.0f, 0f, 0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = Retrieval.ndcgAtK(emb, "vec_id", "embedding", "label",
      Seq(0L), k = 2).as[(Long, Long, Double)].collect()
    assert(got === Array((0L, 2L, 1.0)))
    // query 3 has only ONE same-label neighbor among 4 others; with k=2
    // the ideal list is [rel, -], and vector 4 ranks first → ndcg = 1
    val got3 = Retrieval.ndcgAtK(emb, "vec_id", "embedding", "label",
      Seq(3L), k = 2).as[(Long, Long, Double)].collect()
    assert(got3 === Array((3L, 1L, 1.0)))
  }

  test("ndcgAtK yields 0 when no relevant docs exist (nrel = 0 guard)") {
    val emb = Seq(
      (0L, Array(1.0f, 0f, 0f, 0f), 7),
      (1L, Array(0.9f, 0f, 0f, 0f), 1),
      (2L, Array(0.8f, 0f, 0f, 0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val got = Retrieval.ndcgAtK(emb, "vec_id", "embedding", "label",
      Seq(0L), k = 2).as[(Long, Long, Double)].collect()
    assert(got === Array((0L, 0L, 0.0)))
  }
}
