package graft.queries

import graft.SparkSpec
import java.sql.Date

/** q_kmv_retention's pair arithmetic on synthetic week frames — covers
  * the shapes the shipped SFs never produce (every adjacent pair there
  * overlaps heavily): a ZERO-overlap pair, a partial overlap with exact
  * (sub-k) sketches, and the first week of a series (no previous week →
  * no pair row, by contract). */
class KmvPairsSpec extends SparkSpec {
  import spark.implicits._

  private def wk(rows: (String, Seq[Long])*) =
    rows.toSeq.map { case (d, sk) => (Date.valueOf(d), sk) }
      .toDF("week", "sk")

  test("a zero-overlap adjacent pair yields est_overlap 0, not a " +
      "dropped or erroring row") {
    val out = Queries.kmvWeekPairs(wk(
        "2024-01-01" -> Seq(1L, 2L, 3L),
        "2024-01-08" -> Seq(10L, 20L, 30L)))
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Date]("week") == Date.valueOf("2024-01-08"))
    assert(r.getAs[Long]("est_users") == 3L) // sub-k sketch: exact
    assert(r.getAs[Long]("est_overlap") == 0L)
  }

  test("sub-k pairs are EXACT: est_overlap equals the true intersection") {
    val out = Queries.kmvWeekPairs(wk(
        "2024-01-01" -> Seq(1L, 2L, 3L, 4L),
        "2024-01-08" -> Seq(3L, 4L, 5L),
        "2024-01-15" -> Seq(5L, 6L)))
      .collect().sortBy(_.getAs[Date]("week").toString)
    assert(out.length == 2)
    // week 2: union {1..5} fits the sketch, ρ = |{3,4}| → exact 2
    assert(out(0).getAs[Long]("est_users") == 3L)
    assert(out(0).getAs[Long]("est_overlap") == 2L)
    // week 3: union {3,4,5,6}, ρ = |{5}| → exact 1
    assert(out(1).getAs[Long]("est_users") == 2L)
    assert(out(1).getAs[Long]("est_overlap") == 1L)
  }

  test("the first week of a series produces no pair row") {
    val out = Queries.kmvWeekPairs(wk("2024-01-01" -> Seq(1L, 2L)))
    assert(out.count() == 0L)
  }

  test("non-adjacent weeks (a gap in the series) do not pair") {
    // Jan 1 and Jan 15 are 14 days apart — the week-7 equi-join must
    // not bridge the missing week
    val out = Queries.kmvWeekPairs(wk(
        "2024-01-01" -> Seq(1L, 2L),
        "2024-01-15" -> Seq(1L, 2L)))
    assert(out.count() == 0L)
  }
}
