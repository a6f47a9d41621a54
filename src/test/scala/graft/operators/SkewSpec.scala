package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin returns exactly the rows of the plain equi-join") {
    // hot key 1 dominates
    val left = (Seq.fill(500)(1L) ++ Seq(2L, 3L, 4L)).zipWithIndex
      .toDF("k", "i")
    val dim = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("dk", "name")
    val plain = left.join(dim, col("k") === col("dk"))
      .select("i", "name").collect().map(r => (r.getInt(0), r.getString(1))).sorted
    val salted = Skew.saltedJoin(left, dim, "k", "dk", salts = 8)
      .select("i", "name").collect().map(r => (r.getInt(0), r.getString(1))).sorted
    assert(salted.toSeq == plain.toSeq)
    assert(plain.length == 502)
  }

  test("saltedJoin spreads a hot key over multiple salt buckets, deterministically") {
    // FULL-ROW duplicates: the worst case — a value-derived salt would put
    // every copy in one bucket; the position-derived salt must spread them
    val left = Seq.fill(1000)(1L).toDF("k")
    def buckets() = left
      .withColumn("__salt", pmod(hash(monotonically_increasing_id()), lit(8)))
      .select("__salt").distinct().collect().map(_.getInt(0)).toSet
    val b1 = buckets()
    assert(b1.size > 4) // the duplicated hot row lands in most of the 8 buckets
    assert(b1 == buckets()) // position-derived: identical on recomputation
    // and the join itself still returns exactly the plain-join rows
    val dim = Seq((1L, "a")).toDF("dk", "name")
    assert(Skew.saltedJoin(left, dim, "k", "dk", salts = 8).count() == 1000)
  }

  test("saltedJoin left join keeps unmatched left rows exactly once") {
    val left = Seq((1L, 0), (9L, 1)).toDF("k", "i") // 9 has no dim row
    val dim = Seq((1L, "a")).toDF("dk", "name")
    val out = Skew.saltedJoin(left, dim, "k", "dk", salts = 4, joinType = "left")
      .select("i", "name").collect().map(r => (r.getInt(0), Option(r.getString(1))))
    assert(out.sortBy(_._1).toSeq == Seq((0, Some("a")), (1, None)))
  }

  test("saltedJoin rejects outer join types that would duplicate the build side") {
    val left = Seq((1L, 0)).toDF("k", "i")
    val dim = Seq((1L, "a")).toDF("dk", "name")
    assertThrows[IllegalArgumentException] {
      Skew.saltedJoin(left, dim, "k", "dk", salts = 4, joinType = "right")
    }
  }

  test("AQE skew-split and saltedJoin agree on a hot-key join; salting spreads the hot key") {
    // the two recommended paths for the same problem (Skew scaladoc): AQE's
    // runtime split must actually fire on this shape, and the deterministic
    // salted fallback must produce the identical row multiset without any
    // single task holding the whole hot key
    val keys = Seq("spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // 90% of 200k rows carry key 1 -> one shuffle partition ~3 MB vs tiny rest
      val left = spark.range(200000)
        .select(when($"id" % 10 === 0, $"id" % 100).otherwise(1L).as("k"), $"id".as("i"))
      val dim = spark.range(100).select($"id".as("dk"), concat(lit("n"), $"id").as("name"))

      val aqe = left.join(dim, $"k" === $"dk")
      // collect() (not count()) so THIS dataset's adaptive plan is the one
      // that executes and finalizes — count() spawns its own plan
      val nAqe = aqe.collect().length.toLong
      val finalPlan = aqe.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"), s"AQE did not split the skewed partition:\n$finalPlan")

      val salted = Skew.saltedJoin(left, dim, "k", "dk", salts = 8)
      assert(salted.count() == nAqe)
      // no single-task dominance: the hot key's rows span several tasks
      val perPartition = salted.rdd
        .mapPartitions(it => Iterator(it.size.toLong)).collect()
      val share = perPartition.max.toDouble / perPartition.sum
      assert(share < 0.6, f"one task still holds ${share * 100}%.1f%% of the join output")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE skew-split fires on an interval-join hot bin") {
    // hot-BIN shape (round-4 verdict #7): nearly all intervals overlap one
    // bin, so the interval join's equi key is massively skewed — the same
    // ordinary join skew the IntervalJoin scaladoc defers to AQE for.
    val keys = Seq("spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // 95% of points land in bin 0 ([0,1000)); the 10 intervals tile
      // exactly that bin, so the bin-0 shuffle partition dwarfs the rest
      val pts = spark.range(100000).select($"id".as("pid"),
        when($"id" % 20 === 0, $"id" % 50000).otherwise($"id" % 1000).as("pt"))
      val ivs = spark.range(10).select($"id".as("wid"),
        ($"id" * 100).as("s"), ($"id" * 100 + 100).as("e"))
      val joined = graft.operators.IntervalJoin.pointInInterval(
        pts, "pt", ivs, "s", "e", 1000L)
      val rows = joined.collect().length
      assert(rows > 0)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not split the hot interval bin:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
