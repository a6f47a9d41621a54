package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ValidateSpec extends SparkSpec {
  import spark.implicits._

  private def collectReport(df: org.apache.spark.sql.DataFrame) =
    df.as[(String, Long)].collect().toMap

  test("each check counts its violations; nulls handled per contract") {
    val child = Seq(
      (Some(1L), Some(10.0)), (Some(2L), None), (Some(9L), Some(3.0)),
      (None, Some(-1.0))).toDF("fk", "v")
    val parent = Seq(1L, 2L).toDF("pk")
    val dup = Seq(1L, 1L, 1L, 2L).toDF("k")
    val rep = collectReport(Validate.report(Seq(
      Validate.notNull(child, "v"),                       // 1 null
      // null predicate (null v) must count as a violation, not vanish
      Validate.expect(child, "v>=0", col("v") >= 0),      // -1 and null v
      Validate.refIntegrity(child, "fk", parent, "pk"),   // 9 unmatched; null fk ignored
      Validate.uniqueKey(dup, Seq("k")))))                // 2 extra rows of k=1
    assert(rep === Map(
      "not_null(v)" -> 1L,
      "expect(v>=0)" -> 2L,
      "ref(fk->pk)" -> 1L,
      "unique(k)" -> 2L))
  }

  test("clean data reports zero violations for every check") {
    val df = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
    val rep = collectReport(Validate.report(Seq(
      Validate.notNull(df, "v"),
      Validate.uniqueKey(df, Seq("k")),
      Validate.refIntegrity(df, "k", df, "k"))))
    assert(rep.values.forall(_ == 0L), rep.toString)
  }
}
