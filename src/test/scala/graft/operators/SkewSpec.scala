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

  test("saltedJoin spreads a hot key over multiple salt buckets") {
    val left = Seq.fill(1000)(1L).zipWithIndex.toDF("k", "i")
    val salts = left.withColumn("__salt", (rand(seed = 7) * 8).cast("int"))
      .select("__salt").distinct().count()
    assert(salts > 4) // the hot key lands in most of the 8 buckets
  }
}
