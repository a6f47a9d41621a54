package graft.functions

import graft.SparkSpec

class MinHashAggSpec extends SparkSpec {
  import spark.implicits._

  private val k = 64

  test("signature equals brute-force min per hash, regardless of partitioning") {
    val tokens = Seq("spark", "scan", "join", "sort", "merge", "agg")
    val agg = new MinHashAgg(k)
    val local = tokens.foldLeft(agg.zero)((s, t) => agg.reduce(s.clone(), t))
    val dist = tokens.toDS().repartition(4)
      .select(new MinHashAgg(k).toColumn.name("sig"))
      .as[Array[Long]].collect().head
    assert(dist.toSeq == local.toSeq)
  }

  test("merge is commutative and matches single-pass reduce") {
    val a = Seq("a", "b", "c")
    val b = Seq("c", "d")
    val agg = new MinHashAgg(k)
    val sa = a.foldLeft(agg.zero)((s, t) => agg.reduce(s.clone(), t))
    val sb = b.foldLeft(agg.zero)((s, t) => agg.reduce(s.clone(), t))
    val merged = agg.merge(sa.clone(), sb.clone())
    val direct = (a ++ b).foldLeft(agg.zero)((s, t) => agg.reduce(s.clone(), t))
    assert(merged.toSeq == direct.toSeq)
    assert(agg.merge(sb.clone(), sa.clone()).toSeq == direct.toSeq)
  }

  test("estimate approximates Jaccard") {
    val agg = new MinHashAgg(256)
    def sig(ts: Seq[String]) = ts.foldLeft(agg.zero)((s, t) => agg.reduce(s.clone(), t))
    val base = (1 to 100).map(i => s"tok$i")
    val half = base.take(50) ++ (101 to 150).map(i => s"tok$i") // J = 50/150 ≈ 0.333
    val est = MinHashAgg.estimate(sig(base), sig(half))
    assert(math.abs(est - 1.0 / 3) < 0.1, est.toString)
    assert(MinHashAgg.estimate(sig(base), sig(base)) == 1.0)
  }
}
