package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.{Encoders, functions => F}

class MisraGriesAggSpec extends SparkSpec {
  import spark.implicits._

  test("exact when distinct terms fit in k") {
    val agg = new MisraGriesAgg(10)
    val stream = Seq("a", "b", "a", "c", "a", "b")
    val out = agg.finish(stream.foldLeft(agg.zero)(agg.reduce))
    assert(out.toSeq === Seq(TermLb("a", 3), TermLb("b", 2), TermLb("c", 1)))
  }

  test("eviction keeps the heavy term with the guaranteed lower bound") {
    // 40 'hot' + 60 singletons, k = 5: hot must survive with
    // lb >= 40 - n/(k+1) = 40 - 100/6 > 23
    val rnd = new scala.util.Random(7)
    val stream = rnd.shuffle(
      Seq.fill(40)("hot") ++ (0 until 60).map(i => s"s$i"))
    val agg = new MisraGriesAgg(5)
    val out = agg.finish(stream.foldLeft(agg.zero)(agg.reduce))
      .map(e => e.term -> e.lb).toMap
    assert(out.contains("hot"))
    assert(out("hot") >= 40 - 100 / 6 && out("hot") <= 40)
  }

  test("guarantee holds across random streams and random merge splits") {
    val rnd = new scala.util.Random(13)
    for (trial <- 0 until 5) {
      val k = 4 + rnd.nextInt(5)
      val n = 400
      // zipf-ish: term i drawn with weight 1/(i+1)
      val weights = (0 until 50).map(i => 1.0 / (i + 1))
      val total = weights.sum
      val stream = Seq.fill(n) {
        var u = rnd.nextDouble() * total
        var i = 0
        while (u > weights(i)) { u -= weights(i); i += 1 }
        s"t$i"
      }
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val agg = new MisraGriesAgg(k)
      // random split into 3 partial buffers merged pairwise
      val parts = stream.grouped(n / 3 + 1).toSeq
        .map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = agg.finish(parts.reduce(agg.merge))
        .map(e => e.term -> e.lb).toMap
      val bound = n / (k + 1)
      truth.foreach { case (t, c) =>
        if (c > bound)
          assert(merged.contains(t), s"trial=$trial k=$k lost $t (freq $c > $bound)")
      }
      merged.foreach { case (t, lb) =>
        val c = truth(t)
        assert(lb <= c && lb >= c - bound,
          s"trial=$trial k=$k $t lb=$lb truth=$c bound=$bound")
      }
    }
  }

  test("distributed aggregate exercises partial merge with the same bound") {
    val n = 3000
    val rows = (0 until n).map { i =>
      if (i % 3 == 0) "hot" else if (i % 3 == 1) s"warm${i % 10}" else s"cold$i"
    }
    val mg = F.udaf(new MisraGriesAgg(8), Encoders.STRING)
    val out = rows.toDF("w").repartition(16)
      .agg(mg(F.col("w")).as("sk"))
      .select(F.explode(F.col("sk")).as("e"))
      .select("e.term", "e.lb").as[(String, Long)].collect().toMap
    val bound = n / 9
    assert(out.contains("hot"))
    assert(out("hot") <= n / 3 && out("hot") >= n / 3 - bound)
  }
}
