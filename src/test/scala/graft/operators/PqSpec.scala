package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  private def rng(seed: Long): Iterator[Float] = {
    var x = seed
    Iterator.continually {
      x = x * 6364136223846793005L + 1442695040888963407L
      ((x >>> 40).toInt / 8388608.0f) - 1.0f // [-1, 1)
    }
  }

  private val dim = 16
  private val vecs = (0L until 40L)
    .map(id => (id, rng(id + 7).take(dim).toArray)).toDF("vec_id", "embedding")

  test("encode packs one sign bit per dimension into m codes") {
    val v = Seq((0L, Array(1f, -1f, 2f, -3f, -1f, -1f, 1f, 1f)))
      .toDF("vec_id", "embedding")
    val codes = v.select(Pq.encode("embedding", m = 2, subDim = 4).as("c"))
      .head.getSeq[Int](0)
    // subspace 0: dims (+,-,+,-) -> bits 0,2 -> 5; subspace 1: (-,-,+,+) -> bits 2,3 -> 12
    assert(codes == Seq(5, 12))
  }

  test("code distance equals per-dimension sign disagreements (the oracle identity)") {
    val pairs = vecs.select(col("vec_id").as("ida"), col("embedding").as("ea"))
      .crossJoin(vecs.select(col("vec_id").as("idb"), col("embedding").as("eb")))
      .where(col("ida") < col("idb"))
    val checked = pairs.select(
      Pq.codeDistance(
        expr(s"transform(sequence(0, 3), j -> aggregate(sequence(0, 3), 0, (acc, i) -> acc + IF(element_at(ea, j * 4 + i + 1) > 0D, shiftleft(1, i), 0)))"),
        expr(s"transform(sequence(0, 3), j -> aggregate(sequence(0, 3), 0, (acc, i) -> acc + IF(element_at(eb, j * 4 + i + 1) > 0D, shiftleft(1, i), 0)))")
      ).as("ham"),
      expr("aggregate(zip_with(ea, eb, (x, y) -> IF((x > 0D) != (y > 0D), 1, 0)), 0, (a, b) -> a + b)").as("signs"))
    assert(checked.where(col("ham") =!= col("signs")).count() == 0)
  }

  test("searchPq with full-corpus shortlist reproduces exact cosine top-k") {
    val pq = Pq.searchPq(vecs, "vec_id", "embedding", queryId = 0L,
      k = 5, m = 4, subDim = 4, shortlist = 40)
      .select("vec_id", "cos").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val exact = Similarity.cosineTopK(vecs, "vec_id", "embedding", 0L, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(pq.toSeq == exact.toSeq)
  }

  test("searchPq shortlist is code-distance-bounded: every result is within the best-N hams") {
    val res = Pq.searchPq(vecs, "vec_id", "embedding", queryId = 0L,
      k = 5, m = 4, subDim = 4, shortlist = 8).collect()
    assert(res.length == 5)
    // shortlist 8 of 39 candidates: all returned hams must be <= the 8th-smallest ham
    val hams = vecs.where(col("vec_id") =!= 0L)
      .crossJoin(broadcast(vecs.where(col("vec_id") === 0L)
        .select(col("embedding").as("qe"))))
      .select(expr("aggregate(zip_with(embedding, qe, (x, y) -> IF((x > 0D) != (y > 0D), 1, 0)), 0, (a, b) -> a + b)").as("h"))
      .collect().map(_.getInt(0)).sorted
    val bound = hams(7)
    assert(res.forall(_.getLong(1) <= bound))
  }
}
