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
}
