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

  test("mergeAdditive folds block partials into batch-equal totals") {
    def partials(rows: (String, Long, Double)*) =
      rows.toDF("k", "c", "s")
    val b1 = partials(("a", 2L, 10.0), ("b", 1L, 5.0))
    val b2 = partials(("a", 3L, 7.0), ("c", 4L, 1.0))
    val b3 = partials(("b", 1L, 2.0))
    // fold one block at a time, as an incremental run would
    val folded = Seq(b2, b3).foldLeft(b1)(
        Incremental.mergeAdditive(_, _, Seq("k"), Seq("c", "s")))
      .as[(String, Long, Double)].collect().toSet
    assert(folded === Set(("a", 5L, 17.0), ("b", 2L, 7.0), ("c", 4L, 1.0)))
    // = the batch aggregate of all raw partials at once
    val batch = b1.unionByName(b2).unionByName(b3)
      .groupBy("k").agg(sum("c").as("c"), sum("s").as("s"))
      .as[(String, Long, Double)].collect().toSet
    assert(folded === batch)
  }

  test("HLL sketch state merges across blocks (incremental distinct counts)") {
    // the built-in DataSketches pair: per-block hll_sketch_agg partials,
    // hll_union_agg to fold — distinct-count state a pipeline can store
    // per block and merge without rescanning history
    val b1 = (1L to 600L).toDF("u").withColumn("blk", lit("b1"))
    val b2 = (401L to 1000L).toDF("u").withColumn("blk", lit("b2"))
    val perBlock = b1.unionByName(b2)
      .groupBy("blk").agg(hll_sketch_agg(col("u")).as("sk"))
    val merged = perBlock
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("du"))
      .as[Long].collect().head
    val direct = b1.unionByName(b2)
      .agg(hll_sketch_estimate(hll_sketch_agg(col("u"))).as("du"))
      .as[Long].collect().head
    // union-of-sketches is estimate-equivalent to sketch-of-union, not
    // bit-identical (the union may finish in a different coupon mode) —
    // both must sit within HLL's error envelope of the exact count
    assert(math.abs(merged - direct) <= 20L, s"merged $merged vs direct $direct")
    assert(math.abs(merged - 1000L) <= 50L, s"estimate $merged vs 1000 exact")
    assert(math.abs(direct - 1000L) <= 50L, s"estimate $direct vs 1000 exact")
  }
}
