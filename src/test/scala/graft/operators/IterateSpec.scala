package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The generic fixpoint surface: convergence, divergence detection, and
  * pointer-doubling hierarchy flattening (log-round proof: a depth-100
  * chain must converge within 10 rounds). */
class IterateSpec extends SparkSpec {
  import spark.implicits._

  test("fixpoint returns the fixed frame and stops iterating") {
    // step: halve every value (integer div) — fixpoint all zeros
    val out = Iterate.fixpoint(
      spark.range(16).select($"id".cast("long").as("v")), 10) { cur =>
      cur.select(expr("v div 2").as("v"))
    }
    assert(out.agg(sum("v")).head.getLong(0) == 0L)
  }

  test("fixpoint refuses to 'converge' past maxIter on a non-contracting step") {
    assertThrows[IllegalArgumentException] {
      Iterate.fixpoint(spark.range(4).toDF("v"), 3) { cur =>
        cur.select(($"v" + 1).as("v")) // never fixes
      }
    }
  }

  test("treeDepth matches driver-side recursion on a random forest") {
    val rnd = new scala.util.Random(13)
    // 200 nodes, parent strictly smaller (acyclic), several roots
    val parents = (0 until 200).map { i =>
      if (i < 3) i.toLong else rnd.nextInt(i).toLong
    }
    val nodes = parents.zipWithIndex
      .map { case (p, i) => (i.toLong, p) }.toDF("id", "parent")
    def depthOf(i: Int): Long =
      if (parents(i) == i) 0L else 1L + depthOf(parents(i).toInt)
    val got = Iterate.treeDepth(nodes, "id", "parent")
      .as[(Long, Long)].collect().toMap
    assert(got.size == 200)
    (0 until 200).foreach(i => assert(got(i.toLong) == depthOf(i), s"node $i"))
  }

  test("treeDepth flattens a depth-100 chain in logarithmic rounds") {
    // chain 0 <- 1 <- 2 ... <- 100: depth(i) = i. Pointer doubling covers
    // distance 2^k after k rounds, so maxIter=10 suffices where a
    // parent-at-a-time loop (or recursive CTE) would need 100 rounds.
    val chain = (0 to 100).map(i => (i.toLong, math.max(i - 1, 0).toLong))
      .toDF("id", "parent")
    val got = Iterate.treeDepth(chain, "id", "parent", maxIter = 10)
      .as[(Long, Long)].collect().toMap
    (0 to 100).foreach(i => assert(got(i.toLong) == i.toLong))
  }
}
