package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(1.0f, 0.0f, 0.0f)),   // identical to query
    (2L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal
    (3L, Array(-1.0f, 0.0f, 0.0f)),  // opposite
    (4L, Array(0.9f, 0.1f, 0.0f))    // close
  ).toDF("vec_id", "embedding")

  test("cosineTopK: identical vector scores 1.0 and ranks first") {
    val top = Similarity.cosineTopK(vecs, "vec_id", "embedding", 0L, 4).collect()
    assert(top.head.getLong(0) == 1L && top.head.getDouble(1) == 1.0)
    assert(top.map(_.getLong(0)).toSeq == Seq(1L, 4L, 2L, 3L))
    assert(top.last.getDouble(1) == -1.0)
  }

  test("embeddingDecontaminate drops train vectors near any bench vector") {
    val bench = Seq(
      (100L, Array(1.0f, 0.0f, 0.0f)),
      (101L, Array(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val train = Seq(
      (1L, Array(0.99f, 0.1f, 0.0f)),   // near bench 100 → dropped
      (2L, Array(0.0f, 1.0f, 0.0f)),    // orthogonal to both → kept
      (3L, Array(0.1f, 0.0f, 0.95f)),   // near bench 101 → dropped
      (4L, Array(-1.0f, 0.0f, 0.0f))    // anti-parallel → kept
    ).toDF("vec_id", "embedding")
    val kept = Similarity.embeddingDecontaminate(train, bench, "vec_id", "embedding", 0.8)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L))
    // full schema of the clean subset survives (it is a filter, not a projection)
    assert(Similarity.embeddingDecontaminate(train, bench, "vec_id", "embedding", 0.8)
      .columns.toSeq == train.columns.toSeq)
  }

  test("cosinePairsExact scores every pair (verification path)") {
    val p = Similarity.cosinePairsExact(vecs, "vec_id", "embedding", -2.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(math.abs(p((0L, 1L)) - 1.0) < 1e-12)
    assert(math.abs(p((0L, 2L))) < 1e-12)
    assert(math.abs(p((0L, 3L)) + 1.0) < 1e-12)
  }

  test("cosinePairs blocks on the sign bucket: only same-bucket pairs") {
    val p = Similarity.cosinePairs(vecs, "vec_id", "embedding", -2.0, bucketBits = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // buckets: 0→4, 1→4, 2→2, 3→0, 4→6 — only (0,1) share one
    assert(p == Set((0L, 1L)))
  }

  test("annBucketTopK searches only the query's sign bucket") {
    val top = Similarity.annBucketTopK(vecs, "vec_id", "embedding", 0L, 10, bits = 3)
      .collect().map(_.getLong(0)).toSet
    // bucket of query (+,0,0) = 100b = 4; only id 1 shares it
    // (id 4 is (+,+,0) = 110b = 6, ids 2/3 land in buckets 2/0)
    assert(top == Set(1L))
  }

  test("multi-probe recall >= single-bucket recall vs exact top-k (measured)") {
    val emb = graft.sources.Tables.table(spark, sf001, "embeddings")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id").as[Long].collect().toSet
    val k = 10
    val exact = ids(Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, k))
    val single = ids(Similarity.annBucketTopK(emb, "vec_id", "embedding", 0L, k))
    val multi = ids(Similarity.annMultiProbeTopK(emb, "vec_id", "embedding", 0L, k))
    val rs = (single & exact).size
    val rm = (multi & exact).size
    // probing a superset of buckets can only add true neighbors back
    assert(rm >= rs, s"multi-probe recall $rm < single-bucket $rs")
    // the Hamming-1 probes must actually widen the candidate pool on this
    // data (random unit vectors spread across all 8 sign buckets)
    assert(rm > 0)
  }

  test("multi-probe includes the query bucket and all Hamming-1 buckets only") {
    // 3 orthogonal axis vectors: buckets are knowable by hand
    val q = Seq((0L, Array(1.0f, 1.0f, 1.0f)),   // bucket 111 = 7
      (1L, Array(1.0f, 1.0f, -1.0f)),            // 110 = 6, Hamming 1
      (2L, Array(-1.0f, 1.0f, 1.0f)),            // 011 = 3, Hamming 1
      (3L, Array(-1.0f, -1.0f, 1.0f)),           // 001 = 1, Hamming 2 — excluded
      (4L, Array(1.0f, -1.0f, 1.0f))             // 101 = 5, Hamming 1
    ).toDF("vec_id", "embedding")
    val got = Similarity.annMultiProbeTopK(q, "vec_id", "embedding", 0L, 10)
      .select("vec_id").as[Long].collect().toSet
    assert(got === Set(1L, 2L, 4L))
  }

  test("signBucket packs sign bits MSB-first") {
    val b = vecs.select(col("vec_id"), Similarity.signBucket("embedding", 3).as("bk"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(b(0L) == 4 && b(2L) == 2 && b(3L) == 0 && b(4L) == 6)
  }

  test("semanticDupClusters groups planted near-identical vectors (SemDeDup)") {
    // two tight families ({0,1,2} around +x, {10,11} around -x) plus a
    // far-off singleton that must not join any cluster; members of a
    // family share SIGNS on the bucketed dims (the operator's documented
    // blocking assumption — near-identical vectors agree on sign bits)
    def v(x: Float, y: Float, z: Float, w: Float) = Array(x, y, z, w)
    val emb = Seq(
      0L -> v(1f, 0.01f, 0.01f, 0f), 1L -> v(1f, 0.02f, 0.01f, 0f),
      2L -> v(1f, 0.01f, 0.02f, 0f),
      10L -> v(-1f, 0.01f, 0.01f, 0f), 11L -> v(-1f, 0.02f, 0.01f, 0f),
      20L -> v(0.1f, -1f, 0.2f, 0.3f)
    ).map { case (id, e) => (id, e) }.toDF("vec_id", "embedding")
    val cc = Similarity.semanticDupClusters(emb, "vec_id", "embedding",
        tau = 0.95, bucketBits = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(cc.keySet == Set(0L, 1L, 2L, 10L, 11L)) // singleton 20 not clustered
    assert(Set(0L, 1L, 2L).map(cc(_)._1).size == 1) // one label per family
    assert(Set(10L, 11L).map(cc(_)._1).size == 1)
    assert(cc(0L)._1 != cc(10L)._1) // families stay apart
    assert(cc(0L)._2 == 3 && cc(10L)._2 == 2) // cluster sizes
  }
}
