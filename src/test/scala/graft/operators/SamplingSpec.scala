package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val rows = (0L until 1000L).map(i => (i, s"r$i")).toDF("id", "v")

  test("hashBucket is deterministic and roughly uniform") {
    val b1 = rows.select(Sampling.hashBucket(col("id"), 10).as("b"))
      .groupBy("b").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b1.keys.toSet == (0L until 10L).toSet)
    assert(b1.values.forall(c => c > 50 && c < 200)) // ~100 ± slack
    val b2 = rows.select(Sampling.hashBucket(col("id"), 10).as("b"))
      .groupBy("b").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b1 == b2)
  }

  test("sampleByHash keeps a stable subset of about the requested size") {
    val s10 = Sampling.sampleByHash(rows, "id", 10)
    val n = s10.count()
    assert(n > 50 && n < 150, n.toString)
    // stability: the sample of a superset contains the sample of the subset
    val firstHalf = rows.filter(col("id") < 500)
    val sHalf = Sampling.sampleByHash(firstHalf, "id", 10)
      .select("id").collect().map(_.getLong(0)).toSet
    val sFull = s10.select("id").collect().map(_.getLong(0)).toSet
    assert(sHalf.subsetOf(sFull))
  }

  test("assignSplits partitions every row once with stable membership") {
    val s = Sampling.assignSplits(rows, "id", Seq("train" -> 90, "val" -> 5, "test" -> 5))
    assert(s.count() == 1000)
    val by = s.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(by.keys.toSet == Set("train", "val", "test"))
    assert(by("train") > 800 && by("val") < 120 && by("test") < 120)
    // membership survives corpus growth: split of id 7 is the same when
    // computed over any superset (pure function of the key)
    val one = Sampling.assignSplits(rows.filter(col("id") === 7), "id",
      Seq("train" -> 90, "val" -> 5, "test" -> 5))
      .select("split").collect().head.getString(0)
    val inFull = s.filter(col("id") === 7).select("split").collect().head.getString(0)
    assert(one == inFull)
  }

  test("mixByWeight unions deterministic per-source samples") {
    val a = rows.filter(col("id") < 500)
    val b = rows.filter(col("id") >= 500)
    val mix = Sampling.mixByWeight(Seq(a -> 100, b -> 10), "id")
    val n = mix.count()
    assert(n > 500 + 20 && n < 500 + 100, n.toString) // all of a, ~10% of b
    // reproducible: same rows on every evaluation
    assert(mix.select("id").collect().map(_.getLong(0)).toSet ==
      mix.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("splitColumn rejects percents that do not sum to 100") {
    assertThrows[IllegalArgumentException] {
      Sampling.splitColumn(col("id"), Seq("a" -> 50, "b" -> 40))
    }
  }

  test("temperatureMix keeps the smallest group whole and flattens shares") {
    // skewed groups: a=800, b=150, c=50
    val g = rows.withColumn("grp",
      when(col("id") < 800, "a").when(col("id") < 950, "b").otherwise("c"))
    val kept = Sampling.temperatureMix(g, "id", "grp", alpha = 0.5)
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("c") == 50L) // rate sqrt(50/50) = 1: smallest group intact
    // expected rates: b -> sqrt(50/150) ≈ .577, a -> sqrt(50/800) ≈ .25
    assert(kept("b") > 60 && kept("b") < 115, kept.toString)
    assert(kept("a") > 140 && kept("a") < 260, kept.toString)
    // shares flattened vs the raw 16:3:1 skew
    assert(kept("a").toDouble / kept("c") < 6.0)
  }

  test("temperatureMix: a tiny NULL group cannot deflate real groups' rates") {
    val g = rows.withColumn("grp",
      when(col("id") < 5, lit(null: String)) // 5 null-group rows
        .when(col("id") < 600, "a").otherwise("b"))
    val kept = Sampling.temperatureMix(g, "id", "grp", alpha = 0.5)
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // n_min must be b's 400, NOT the null group's 5: b stays whole and a
    // keeps ~sqrt(400/595) ≈ 82%, instead of both collapsing to ~9%/11%
    assert(kept("b") == 400L)
    assert(kept("a") > 400L, kept.toString)
    assert(!kept.contains(null)) // null-group rows are excluded, per doc
  }

  test("temperatureMix at alpha=1 keeps every row; membership is stable") {
    val g = rows.withColumn("grp", when(col("id") < 900, "a").otherwise("b"))
    assert(Sampling.temperatureMix(g, "id", "grp", alpha = 1.0).count() == 1000L)
    val pick = Sampling.temperatureMix(g, "id", "grp", alpha = 0.5)
      .select("id").as[Long].collect().toSet
    assert(Sampling.temperatureMix(g, "id", "grp", alpha = 0.5)
      .select("id").as[Long].collect().toSet == pick) // deterministic re-run
  }

  test("packSequences packs 40 domains independently and in parallel") {
    import spark.implicits._
    // 40 shard domains (the production shape: domain = shard/file, not a
    // handful of languages), variable token counts, deterministic
    val df = spark.range(2000).select(
      (col("id") % 40).as("shard"), col("id").as("doc_id"),
      (pmod(col("id") * 37 + 11, lit(90)) + 10).as("tk"))
    val packed = Sampling.packSequences(df, Seq("shard"), "doc_id", col("tk"), 100)
      .select($"shard", $"doc_id", $"tk", $"seq_id")
      .as[(Long, Long, Long, Long)].collect()
    // ≥32 domains, each packed
    assert(packed.map(_._1).distinct.length == 40)
    // reference: sequential per-domain packing computed driver-side
    val expected = packed.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      var run = 0L
      rows.sortBy(_._2).map { case (s, id, tk, _) =>
        val seq = run / 100; run += tk; (s, id, seq)
      }
    }.toSet
    assert(packed.map(t => (t._1, t._2, t._4)).toSet == expected)
    // a domain's packing must not depend on other domains: packing one
    // shard alone gives the same sequence ids
    val solo = Sampling.packSequences(df.filter($"shard" === 7), Seq("shard"),
      "doc_id", col("tk"), 100)
      .select($"doc_id", $"seq_id").as[(Long, Long)].collect().toSet
    assert(solo == packed.filter(_._1 == 7).map(t => (t._2, t._4)).toSet)
    // and the window genuinely partition-parallelizes: 40 domains spread
    // over all shuffle partitions, no single-task funnel
    val parts = Sampling.packSequences(df, Seq("shard"), "doc_id", col("tk"), 100)
      .select(spark_partition_id()).distinct().count()
    assert(parts > 1, s"packing ran on $parts partition(s)")
  }

  test("weightedKey: inclusion odds track the weights; scaling is order-invariant") {
    // 1000 rows, weight 9 for multiples of 3 and 1 otherwise: expected
    // share of weight-9 rows in a small sample ~ (333*9)/(333*9+667) = 0.82
    val df = (0L until 1000L).map(i => (i, if (i % 3 == 0) 9L else 1L))
      .toDF("id", "w")
    val top = df.select(col("id"), Sampling.weightedKey(col("id"), col("w")).as("k"))
      .orderBy("k").limit(100).select("id").as[Long].collect()
    val heavy = top.count(_ % 3 == 0)
    assert(heavy > 60 && heavy < 100, s"heavy=$heavy of 100")
    // multiplying every weight by a constant rescales all keys equally:
    // the selected sample (and its order) must not change
    val top2 = df.select(col("id"),
        Sampling.weightedKey(col("id"), col("w") * 1000).as("k"))
      .orderBy("k").limit(100).select("id").as[Long].collect()
    assert(top.toSeq === top2.toSeq)
    // determinism across evaluations
    val again = df.select(col("id"), Sampling.weightedKey(col("id"), col("w")).as("k"))
      .orderBy("k").limit(100).select("id").as[Long].collect()
    assert(top.toSeq === again.toSeq)
  }

  test("stratifiedSample: k largest hashes per stratum, window-equivalent") {
    val df = (0L until 200L).map(i => (i, s"g${i % 3}")).toDF("id", "g")
    val got = Sampling.stratifiedSample(df, "id", 5, Seq("g"))
      .select("g", "r", "id", "bk")
      .as[(String, Int, Long, Long)].collect().toSet
    // reference: the ANSI window spelling of the same sample
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy("g").orderBy(col("bk").desc, col("id"))
    val ref = df.withColumn("bk", Sampling.hashKey(col("id")))
      .withColumn("r", row_number().over(win).cast("int"))
      .where(col("r") <= 5)
      .select("g", "r", "id", "bk")
      .as[(String, Int, Long, Long)].collect().toSet
    assert(got === ref)
    assert(got.groupBy(_._1).forall(_._2.size == 5))
  }

  test("stratifiedSample: short strata are returned whole, ranks dense") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "g")
    val got = Sampling.stratifiedSample(df, "id", 10, Seq("g"))
      .select("g", "r", "id").as[(String, Int, Long)].collect()
    assert(got.length === 3)
    assert(got.filter(_._1 == "a").map(_._2).sorted.toSeq === Seq(1, 2))
    assert(got.filter(_._1 == "b").map(_._2).toSeq === Seq(1))
  }

  test("upsample repeats each group exactly reps times with dense epoch tags") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "c"))
      .toDF("id", "g")
    val up = Sampling.upsample(df, "g", Map("a" -> 3, "b" -> 2))
      .select("id", "g", "epoch").as[(Long, String, Int)].collect()
    assert(up.length == 2 * 3 + 1 * 2 + 1)
    assert(up.filter(_._1 == 1L).map(_._3).sorted.toSeq == Seq(1, 2, 3))
    assert(up.filter(_._1 == 3L).map(_._3).sorted.toSeq == Seq(1, 2))
    assert(up.filter(_._1 == 4L).map(_._3).toSeq == Seq(1)) // default 1 epoch
  }

  test("dsirWeights ranks target-vocabulary docs above off-target docs") {
    // target slice speaks {aa bb}; raw background speaks {qq rr}. Doc 10
    // is a raw doc written in target vocabulary -> must outscore doc 11.
    val docs = Seq(
      (1L, "t", "aa bb aa bb"), (2L, "t", "bb aa bb aa"),
      (10L, "r", "aa bb aa bb"), (11L, "r", "qq rr qq rr"),
      (12L, "r", "qq rr qq rr")
    ).toDF("doc_id", "grp", "text")
    val w = Sampling.dsirWeights(docs, "doc_id", "text", "grp", "t", 32)
      .select("doc_id", "w").as[(Long, Double)].collect().toMap
    assert(w(10L) > w(11L))
    assert(w(10L) == w(1L)) // identical token stream -> identical weight
    assert(w(11L) == w(12L))
    // every token of doc 11 is raw-only: its smoothed ratio is < 1 -> w < 0
    assert(w(11L) < 0 && w(10L) > 0)
  }
}
