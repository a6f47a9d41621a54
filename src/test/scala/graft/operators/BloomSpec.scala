package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every inserted key passes the probe") {
    val keys = (0L until 300L by 3).toDF("k")
    val bloom = Bloom.build(keys, col("k"), k = 3, mWords = 32)
    val probed = keys.crossJoin(broadcast(bloom))
      .filter(Bloom.mightContain(col("bloom"), col("k"), k = 3, mWords = 32))
    assert(probed.count() == 100) // all 100 inserted keys admitted
  }

  test("filter is selective: a sparse build side prunes most probe rows") {
    val left = (0L until 5000L).toDF("k")
    val right = (0L until 5000L by 500).toDF("r") // 10 keys
    val pruned = Bloom.prune(left, right, "k", "r", k = 3, mWords = 1024)
    val n = pruned.count()
    assert(n >= 10, s"matches must survive (got $n)")
    assert(n < 100, s"8 KB filter over 10 keys should prune ~all 5000 (got $n)")
  }

  test("build is partition-order independent (mergeable OR)") {
    val keys = (0L until 1000L).toDF("k")
    val a = Bloom.build(keys.repartition(1), col("k"), 3, 64)
      .collect()(0).getSeq[Long](0)
    val b = Bloom.build(keys.repartition(7), col("k"), 3, 64)
      .collect()(0).getSeq[Long](0)
    assert(a == b)
  }

  test("filteredSemiJoin equals the plain semi join on real tables") {
    val customer = spark.read.parquet(s"$sf001/customer.parquet")
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
      .filter(col("o_custkey") % 10 === 0) // selective build side
    val viaBloom = Bloom.filteredSemiJoin(customer, orders,
        "c_custkey", "o_custkey")
      .select("c_custkey").as[Long].collect().sorted.toSeq
    val plain = customer.join(orders, col("c_custkey") === col("o_custkey"),
        "left_semi")
      .select("c_custkey").as[Long].collect().sorted.toSeq
    assert(viaBloom == plain)
    assert(viaBloom.nonEmpty)
  }

  test("filteredSemiJoin resolves when both sides name the key identically") {
    import spark.implicits._
    // the common self-named shape: an unqualified right-key reference
    // would be AMBIGUOUS_REFERENCE against both join children
    val l = Seq(1L, 2L, 3L, 4L).toDF("key")
    val r = Seq(2L, 4L, 9L).toDF("key")
    val got = Bloom.filteredSemiJoin(l, r, "key", "key")
      .as[Long].collect().sorted.toSeq
    assert(got == Seq(2L, 4L))
  }

  test("mixed integral key widths canonicalize: no silent false negatives") {
    import spark.implicits._
    // xxhash64 dispatches on physical type: INT 42 and BIGINT 42 hash
    // differently, which would drop every true match at the pre-filter
    val l = Seq(1, 2, 3, 42).toDF("lk") // INT keys
    val r = Seq(2L, 42L).toDF("rk")     // BIGINT keys
    val got = Bloom.filteredSemiJoin(l, r, "lk", "rk")
      .as[Int].collect().sorted.toSeq
    assert(got == Seq(2, 42))
  }

  test("cross-type non-integral keys raise instead of pruning wrongly") {
    import spark.implicits._
    val l = Seq("1", "2").toDF("lk")
    val r = Seq(1L, 2L).toDF("rk")
    val e = intercept[IllegalArgumentException](
      Bloom.filteredSemiJoin(l, r, "lk", "rk").collect())
    assert(e.getMessage.contains("hashable type"))
  }
}
