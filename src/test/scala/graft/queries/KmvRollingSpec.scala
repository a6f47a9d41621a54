package graft.queries

import graft.SparkSpec
import java.sql.Date

/** q_kmv_rolling's trailing-28-day window arithmetic on synthetic
  * (day, sk) frames — the shapes the shipped SFs never produce: an
  * anchor whose PRIOR window is empty (first weeks of a series), a
  * series gap wider than a week (where the week−7 equi-join of
  * kmvWeekPairs drops rows, the date-range windows must not), and
  * multi-day unions inside one window (exact sketch mergeability). */
class KmvRollingSpec extends SparkSpec {
  import spark.implicits._

  private def days(rows: (String, Seq[Long])*) =
    rows.toSeq.map { case (d, sk) => (Date.valueOf(d), sk) }
      .toDF("day", "sk")

  test("an empty prior window yields est_overlap_28d 0 with the anchor " +
      "row intact, never a dropped anchor") {
    val out = Queries.kmvRollingWindows(days("2024-01-03" -> Seq(1L, 2L, 3L)))
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Date]("week") == Date.valueOf("2024-01-01"))
    assert(r.getAs[Long]("est_users_28d") == 3L) // sub-k: exact
    assert(r.getAs[Long]("est_overlap_28d") == 0L)
  }

  test("windows are date ranges, not adjacency: a multi-week series gap " +
      "still pairs current against prior (where week-7 pairing drops it)") {
    // day sketches 5 weeks apart — kmvWeekPairs yields NO row for this
    // series, the rolling windows must still see d1 in d2's prior window
    val out = Queries.kmvRollingWindows(days(
        "2024-01-02" -> Seq(1L, 2L, 3L),
        "2024-02-06" -> Seq(2L, 5L)))
      .collect().sortBy(_.getAs[Date]("week").toString)
    assert(out.length == 2)
    // anchor week 1: current = {1,2,3}, prior empty
    assert(out(0).getAs[Date]("week") == Date.valueOf("2024-01-01"))
    assert(out(0).getAs[Long]("est_users_28d") == 3L)
    assert(out(0).getAs[Long]("est_overlap_28d") == 0L)
    // anchor week of Feb 5: current = {2,5}; prior window
    // [2023-12-18, 2024-01-14] holds Jan 2 → {1,2,3}; union {1,2,3,5}
    // fits the sketch so ρ = |{2}| and the estimate is EXACT: 1·4 div 4
    assert(out(1).getAs[Date]("week") == Date.valueOf("2024-02-05"))
    assert(out(1).getAs[Long]("est_users_28d") == 2L)
    assert(out(1).getAs[Long]("est_overlap_28d") == 1L)
  }

  test("day sketches UNION inside a window (exact mergeability)") {
    // two days of the same week: the window sketch is the distinct merge
    val out = Queries.kmvRollingWindows(days(
        "2024-01-02" -> Seq(1L, 2L),
        "2024-01-05" -> Seq(2L, 3L)))
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("est_users_28d") == 3L)
  }

  test("a day 22-28 days before the anchor's Sunday lands in the PRIOR " +
      "window, not the current one (boundary arithmetic)") {
    // anchor week 2024-01-29 (Mon); its Sunday is 2024-02-04. Current
    // window = [2024-01-08, 2024-02-04]; prior = [2023-12-11, 2024-01-07].
    // 2024-01-07 is exactly week−22 → prior; 2024-01-08 (week−21) → current.
    val out = Queries.kmvRollingWindows(days(
        "2024-01-07" -> Seq(7L),
        "2024-01-08" -> Seq(8L),
        "2024-01-29" -> Seq(8L, 7L, 9L)))
      .collect().filter(_.getAs[Date]("week") == Date.valueOf("2024-01-29"))
    assert(out.length == 1)
    val r = out.head
    // current = {8} ∪ {7,8,9} = {7,8,9}
    assert(r.getAs[Long]("est_users_28d") == 3L)
    // prior window holds only 2024-01-07 → {7}; ρ = |{7}| → exact 1
    assert(r.getAs[Long]("est_overlap_28d") == 1L)
  }
}
