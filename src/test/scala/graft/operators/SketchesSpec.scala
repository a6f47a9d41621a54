package graft.operators

import graft.SparkSpec
import java.sql.Date
import org.apache.spark.sql.functions._

/** Direct contract of the shared rolling-window skeleton (the sketch
  * instantiations are pinned end-to-end by KmvRollingSpec and the three
  * oracled rows; these pin the skeleton's own algebra). */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def days(rows: (String, Long)*) =
    rows.toSeq.map { case (d, v) => (Date.valueOf(d), v) }
      .toDF("day", "v")

  test("every window rides one join: per-(week, win) sums honor each " +
      "window's own [week+lo, week+hi] range") {
    // anchor week 2024-01-01: short window [Mon, Sun] vs trailing-28
    val out = Sketches.rollingWindows(
        days("2024-01-02" -> 1L, "2024-01-05" -> 2L, "2023-12-20" -> 10L),
        "day", Seq(("wk", 0, 6), ("28", -21, 6)))(
        (rows, keys) => rows.groupBy(keys.map(col): _*)
          .agg(sum("v").as("s")))
      .collect()
      .map(r => (r.getAs[Date]("week").toString, r.getAs[String]("win"),
        r.getAs[Long]("s"))).toSet
    // week of 2023-12-18 anchors too (it has a day): wk-window sum 10,
    // 28-window sum 10; week of 2024-01-01: wk = 1+2, 28 = 1+2+10
    assert(out === Set(
      ("2023-12-18", "wk", 10L), ("2023-12-18", "28", 10L),
      ("2024-01-01", "wk", 3L), ("2024-01-01", "28", 13L)))
  }

  test("an empty window yields no row (callers left-join labels back)") {
    val out = Sketches.rollingWindows(days("2024-01-02" -> 1L), "day",
        Seq(("cur", -21, 6), ("prior", -49, -22)))(
        (rows, keys) => rows.groupBy(keys.map(col): _*)
          .agg(sum("v").as("s")))
      .collect()
    assert(out.length == 1 && out.head.getAs[String]("win") == "cur")
  }

  test("anchorDays override: anchors derive from the override frame, " +
      "rows still come from dayRows (the exact-rider shape)") {
    val rows = days("2024-01-02" -> 1L, "2024-01-09" -> 2L)
    // anchor source holds ONLY the first week: the second week must not
    // anchor, but its day still lands in the first anchor's window range
    // if the range reaches it (here [0, 6] does not; [0, 13] would)
    val out = Sketches.rollingWindows(rows, "day", Seq(("wk", 0, 6)),
        anchorDays = days("2024-01-02" -> 99L))(
        (r, keys) => r.groupBy(keys.map(col): _*).agg(sum("v").as("s")))
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Date]("week") == Date.valueOf("2024-01-01"))
    assert(out.head.getAs[Long]("s") == 1L)
  }

  test("bad window specs are rejected by name") {
    val d = days("2024-01-02" -> 1L)
    def idMerge = (rows: org.apache.spark.sql.DataFrame, keys: Seq[String]) =>
      rows.groupBy(keys.map(col): _*).agg(sum("v").as("s"))
    val e1 = intercept[IllegalArgumentException] {
      Sketches.rollingWindows(d, "day", Seq(("w", 6, -21)))(idMerge)
    }
    assert(e1.getMessage.contains("lo <= hi"))
    val e2 = intercept[IllegalArgumentException] {
      Sketches.rollingWindows(d, "day", Seq(("w", 0, 6), ("w", -21, 6)))(idMerge)
    }
    assert(e2.getMessage.contains("unique"))
    val e3 = intercept[IllegalArgumentException] {
      Sketches.rollingWindows(d, "day", Seq.empty)(idMerge)
    }
    assert(e3.getMessage.contains("at least one window"))
  }
}
