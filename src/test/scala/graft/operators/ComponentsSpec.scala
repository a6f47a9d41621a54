package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def comps(edges: Seq[(Long, Long)], maxIter: Int = 20) =
    Components.connectedComponents(edges.toDF("src", "dst"), maxIter = maxIter)
      .as[(Long, Long)].collect().toMap

  test("two components, direction-agnostic, min-id label") {
    // {1,2,3} linked as a path (3->2, 1->2: both edge directions) + {5,6}
    val m = comps(Seq((3L, 2L), (1L, 2L), (5L, 6L)))
    assert(m === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("chain graph converges within diameter rounds") {
    // 0-1-2-…-9 path: worst case for hash-min (diameter 9)
    val chain = (0L until 9L).map(i => (i, i + 1))
    val m = comps(chain)
    assert(m.size === 10 && m.values.forall(_ == 0L))
  }

  test("non-convergence within maxIter is an error, not a wrong answer") {
    val chain = (0L until 9L).map(i => (i, i + 1))
    val e = intercept[IllegalArgumentException](comps(chain, maxIter = 2))
    assert(e.getMessage.contains("converge"))
  }

  test("empty edges yield empty labels") {
    val empty = spark.emptyDataset[(Long, Long)].toDF("src", "dst")
    assert(Components.connectedComponents(empty).isEmpty)
  }

  test("dupClusters sizes: triangle + pair") {
    val df = Components.dupClusters(
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (7L, 9L)).toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long)].collect().toSet
    assert(df === Set((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (7L, 7L, 2L), (9L, 7L, 2L)))
  }

  test("self-loops and duplicate edges are harmless") {
    val m = comps(Seq((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L)))
    assert(m === Map(1L -> 1L, 2L -> 1L))
  }
}
