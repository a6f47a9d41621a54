package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asOf matches most recent right row at or before left time") {
    val left = Seq((1L, 100L, 10), (1L, 101L, 20), (2L, 200L, 5))
      .toDF("k", "lid", "t")
    val right = Seq((1L, 900L, 5), (1L, 901L, 15), (2L, 902L, 50))
      .toDF("rk", "rid", "rt")
    val out = AsOfJoin.asOf(left, right, "k", "rk", "t", "rt", Seq("rid"))
      .orderBy("lid")
      .collect()
      .map(r => (r.getAs[Long]("lid"), Option(r.getAs[java.lang.Long]("asof_rid")).map(_.toLong)))
    // lid=100 t=10: rid 900 (rt5) matched; lid=101 t=20: rid 901 (rt15);
    // lid=200 t=5: right rt50 is in the future -> no match
    assert(out.toSeq == Seq((100L, Some(900L)), (101L, Some(901L)), (200L, None)))
  }

  test("asOf includes same-timestamp right rows and breaks ties to largest carry") {
    val left = Seq((1L, 100L, 10)).toDF("k", "lid", "t")
    val right = Seq((1L, 900L, 10), (1L, 901L, 10)).toDF("rk", "rid", "rt")
    val out = AsOfJoin.asOf(left, right, "k", "rk", "t", "rt", Seq("rid")).collect()
    assert(out.head.getAs[Long]("asof_rid") == 901L)
  }

  test("asOf forward direction matches the earliest right row at/after") {
    val left = Seq((1L, 100L, 10), (1L, 101L, 16)).toDF("k", "lid", "t")
    val right = Seq((1L, 900L, 5), (1L, 901L, 15), (1L, 902L, 15)).toDF("rk", "rid", "rt")
    val out = AsOfJoin.asOf(left, right, "k", "rk", "t", "rt", Seq("rid"),
        direction = "forward")
      .orderBy("lid").collect()
      .map(r => (r.getLong(1), Option(r.getAs[java.lang.Long]("asof_rid")).map(_.toLong)))
    // lid=100 t=10 -> earliest at/after is rt=15, tie -> smallest rid 901
    // lid=101 t=16 -> nothing at/after -> null
    assert(out.toSeq == Seq((100L, Some(901L)), (101L, None)))
  }

  test("asOf tolerance nulls matches farther than the bound") {
    val left = Seq((1L, 100L, 100), (1L, 101L, 12)).toDF("k", "lid", "t")
    val right = Seq((1L, 900L, 10)).toDF("rk", "rid", "rt")
    val out = AsOfJoin.asOf(left, right, "k", "rk", "t", "rt", Seq("rid"),
        toleranceSeconds = Some(5L))
      .orderBy("lid").collect()
      .map(r => (r.getLong(1), Option(r.getAs[java.lang.Long]("asof_rid")).map(_.toLong)))
    // t=100 is 90s past rt=10: outside tolerance; t=12 is within 5s
    assert(out.toSeq == Seq((100L, None), (101L, Some(900L))))
  }

  test("asOf attaches one whole right row: null fields never mix rows") {
    // newest right row has a null in one carried column; a per-column
    // last(ignoreNulls) would resurrect 'a' from the OLDER row — atomic
    // attachment must report (null, "y") from the newest row instead
    val left = Seq((1L, 100L, 30)).toDF("k", "lid", "t")
    val right = Seq(
      (1L, 10, Some(7L), "x"),
      (1L, 20, None: Option[Long], "y")
    ).toDF("rk", "rt", "a", "b")
    val out = AsOfJoin.asOf(left, right, "k", "rk", "t", "rt", Seq("a", "b"))
      .collect().head
    assert(out.isNullAt(out.fieldIndex("asof_a")))
    assert(out.getAs[String]("asof_b") == "y")
  }

  test("asOf with empty carry keeps every left row (schema unchanged)") {
    val left = Seq((1L, 100L, 10)).toDF("k", "lid", "t")
    val right = Seq((1L, 900L, 5)).toDF("rk", "rid", "rt")
    val out = AsOfJoin.asOf(left, right, "k", "rk", "t", "rt", Seq.empty)
    assert(out.columns.toSeq == Seq("k", "lid", "t") && out.count() == 1)
  }

  test("asOf keys absent from right yield nulls, not dropped rows") {
    val left = Seq((9L, 1L, 10)).toDF("k", "lid", "t")
    val right = Seq((1L, 900L, 5)).toDF("rk", "rid", "rt")
    val out = AsOfJoin.asOf(left, right, "k", "rk", "t", "rt", Seq("rid"))
    assert(out.count() == 1 && out.collect().head.isNullAt(out.columns.indexOf("asof_rid")))
  }
}
