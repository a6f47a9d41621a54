package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Golden + property tests for the dags-signature incremental pipes.
  * Property cases are generated with a fixed seed (no scalatest-scalacheck
  * bridge in the offline cache; same coverage, deterministic). */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def events(rows: (Long, Long, Int, Double)*) =
    rows.toDF("user_id", "event_id", "ts", "value")

  test("dedupeKeepNewest keeps the newest row per key") {
    val df = events((1L, 10L, 5, 1.0), (1L, 11L, 9, 2.0), (2L, 20L, 3, 7.0))
    val out = Incremental.dedupeKeepNewest(df, Seq("user_id"),
      Seq(col("ts").desc, col("event_id").desc))
    assert(out.orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq == Seq((1L, 11L), (2L, 20L)))
  }

  test("dedupe ties break to the larger event_id deterministically") {
    val df = events((1L, 10L, 5, 1.0), (1L, 11L, 5, 2.0))
    val out = Incremental.dedupeKeepNewest(df, Seq("user_id"),
      Seq(col("ts").desc, col("event_id").desc))
    assert(out.select("event_id").as[Long].collect().toSeq == Seq(11L))
  }

  test("asDataset = accumulate + dedupe keeps latest across blocks") {
    val b1 = events((1L, 1L, 1, 1.0), (2L, 2L, 1, 2.0))
    val b2 = events((1L, 3L, 2, 9.0))
    val out = Incremental.asDataset(Seq(b1, b2), Seq("user_id"),
      Seq(col("ts").desc, col("event_id").desc))
    val m = out.collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(m == Map(1L -> 9.0, 2L -> 2.0))
  }

  test("dedupe is idempotent and block-order invariant (property, seeded)") {
    val rnd = new Random(42)
    (1 to 5).foreach { _ =>
      val rows = Random.shuffle((1L to 30L).toList).map { e =>
        (rnd.nextLong(5) + 1, e, rnd.nextInt(50) + 1, rnd.nextDouble() * 10)
      }
      val df = events(rows: _*)
      val order = Seq(col("ts").desc, col("event_id").desc)
      val once = Incremental.dedupeKeepNewest(df, Seq("user_id"), order)
      val twice = Incremental.dedupeKeepNewest(once, Seq("user_id"), order)
      assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
      val (h1, h2) = rows.splitAt(rows.size / 2)
      val shuffled = Incremental.asDataset(Seq(events(h2: _*), events(h1: _*)),
        Seq("user_id"), order)
      val direct = Incremental.asDataset(Seq(events(h1: _*), events(h2: _*)),
        Seq("user_id"), order)
      assert(shuffled.exceptAll(direct).isEmpty && direct.exceptAll(shuffled).isEmpty)
    }
  }

  test("schemaCast renames and casts") {
    val df = Seq((1, "a", 2.5f)).toDF("k", "n", "v")
    val out = Incremental.schemaCast(df,
      Seq(("k", "id", "bigint"), ("n", "name", "string"), ("v", "score", "double")))
    assert(out.schema.map(f => (f.name, f.dataType.simpleString)) ==
      Seq(("id", "bigint"), ("name", "string"), ("score", "double")))
    assert(out.collect().head.getLong(0) == 1L)
  }

  test("sinceWatermark filters strictly by the checkpoint") {
    val df = events((1L, 1L, 5, 1.0), (1L, 2L, 10, 1.0), (1L, 3L, 15, 1.0))
    val out = Incremental.sinceWatermark(df, "ts", lit(10))
    assert(out.select("event_id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
  }
}
