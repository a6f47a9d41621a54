package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev evidence tool (r15 verdict #6): the iterative Components rewrites
  * (fused union+aggregate rounds) shipped in r15 without per-round plan
  * dumps — the final DataFrame of an eager loop shows only the last
  * checkpoint scan, so `Explain` can't evidence them. This builds ONE
  * round of each form — the r14 join+coalesce spelling vs the r15 fused
  * union+agg — over identical materialized inputs, prints both physical
  * plans, and times `reps` full loops of each form. Not part of the
  * driver contract. */
object RoundPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Checkpoint.CutOps

    def fmt(df: DataFrame): String = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

    // the trade graph the declared rows use (orders ⋈ lineitem pairs)
    val orders = graft.sources.Tables.table(spark, sfDir, "orders")
    val lineitem = graft.sources.Tables.table(spark, sfDir, "lineitem")
    val pc = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy((col("o_custkey") * 2).as("s"), (col("l_suppkey") * 2 + 1).as("d"))
      .agg(count(lit(1)).as("w")).select("s", "d").localCheckpoint(true)
    val e = pc.union(pc.select(col("d").as("s"), col("s").as("d")))
      .distinct().localCheckpoint(true)

    // ---- connected components round: labels frame at round-0 state
    val labels0 = e.select(col("s").as("id")).distinct()
      .withColumn("comp", col("id")).localCheckpoint(true)
    val msgs = e.join(labels0.withColumnRenamed("id", "s"), "s")
      .select(col("d").as("id"), col("comp"))
    val ccFused = labels0.union(msgs)
      .groupBy("id").agg(min("comp").as("comp"))
    val ccJoin = labels0.join(
      msgs.groupBy("id").agg(min("comp").as("nc")), Seq("id"), "left")
      .select(col("id"),
        least(col("comp"), coalesce(col("nc"), col("comp"))).as("comp"))
    println("===== cc_round_fused ====="); println(fmt(ccFused))
    println("===== cc_round_join =====");  println(fmt(ccJoin))

    // ---- label propagation round
    val votes = e.join(labels0.withColumnRenamed("comp", "lbl")
        .withColumnRenamed("id", "s"), "s")
      .groupBy(col("d").as("id"), col("lbl")).agg(count(lit(1)).as("c"))
    val lbl0 = labels0.withColumnRenamed("comp", "lbl")
    val lpaFused = votes
      .union(lbl0.select(col("id"), col("lbl"), lit(0L).as("c")))
      .groupBy("id")
      .agg(max(struct(col("c"), (-col("lbl")).as("nl"))).as("m"))
      .select(col("id"), (-col("m.nl")).as("lbl"))
    val lpaJoin = lbl0.join(
      votes.groupBy("id")
        .agg(max(struct(col("c"), (-col("lbl")).as("nl"))).as("m"))
        .select(col("id"), (-col("m.nl")).as("vl")), Seq("id"), "left")
      .select(col("id"), coalesce(col("vl"), col("lbl")).as("lbl"))
    println("===== lpa_round_fused ====="); println(fmt(lpaFused))
    println("===== lpa_round_join =====");  println(fmt(lpaJoin))

    // ---- pagerank round
    val ew = e.join(e.groupBy("s").agg(count(lit(1)).as("deg")), "s")
      .localCheckpoint(true)
    val nodes = e.select(col("s").as("id")).union(e.select(col("d").as("id")))
      .distinct().localCheckpoint(true)
    val pr0 = nodes.withColumn("rank", lit(1000000000L)).localCheckpoint(true)
    val inflow = ew.join(pr0, col("s") === col("id"))
      .select(col("d").as("id"), expr("rank div deg").as("c"))
    val base = 150000000L
    val prFused = inflow.union(nodes.select(col("id"), lit(0L).as("c")))
      .groupBy("id").agg(sum("c").as("m"))
      .select(col("id"), (lit(base) + expr("(85 * m) div 100")).as("rank"))
    val prJoin = nodes.join(
      inflow.groupBy("id").agg(sum("c").as("m")), Seq("id"), "left")
      .select(col("id"),
        (lit(base) + expr("(85 * coalesce(m, 0L)) div 100")).as("rank"))
    println("===== pr_round_fused ====="); println(fmt(prFused))
    println("===== pr_round_join =====");  println(fmt(prJoin))

    // ---- the q_triangles/q_cluster_coeff EDGE BUILD (it materializes
    // through an eager cut inside the query, so the end-of-query explain
    // cannot show it): the Spread.autoKeyed layout + reused groupBy
    // exchange ahead of the pair emission
    val li = lineitem.select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
    val edgeBuild = graft.operators.Spread.autoKeyed(li, "o").groupBy("o")
      .agg(sort_array(array_distinct(collect_list(col("p").cast("long"))))
        .as("ps"))
      .select(explode(expr(
        "flatten(transform(ps, (x, i) -> transform(" +
          "slice(ps, i + 2, size(ps)), y -> struct(x AS a, y AS b))))"))
        .as("pr"))
      .select(col("pr.a").as("src"), col("pr.b").as("dst"))
    println("===== triangle_edge_build (autoKeyed) =====")
    println(fmt(edgeBuild))

    // ---- paired A/B: time `reps` full loops of each form (fused = the
    // shipped operators; join = the r14 spelling reconstructed inline)
    val reps = sys.env.getOrElse("ROUNDPLANS_REPS", "3").toInt
    def time(tag: String)(body: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[roundplans] $tag%s min=${ts.min}%.2f " +
        f"all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    def ccJoinLoop(): Unit = {
      var labels = labels0
      var last = java.math.BigDecimal.ZERO
      var converged = false
      var iter = 0
      def lsum(df: DataFrame) = df.agg(coalesce(sum(col("comp")
        .cast("decimal(38,0)")), lit(java.math.BigDecimal.ZERO)))
        .head.getDecimal(0)
      last = lsum(labels)
      while (iter <= 20 && !converged) {
        val m = e.join(labels.withColumnRenamed("id", "s"), "s")
          .select(col("d").as("id"), col("comp"))
          .groupBy("id").agg(min("comp").as("nc"))
        val next = labels.join(m, Seq("id"), "left")
          .select(col("id"),
            least(col("comp"), coalesce(col("nc"), col("comp"))).as("comp"))
          .cut
        val s = lsum(next)
        converged = s.compareTo(last) == 0
        last = s; labels = next; iter += 1
      }
      labels.count()
    }
    def prJoinLoop(): Unit = {
      var pr = pr0
      for (_ <- 1 to 5) {
        val inf = ew.join(pr, col("s") === col("id"))
          .select(col("d").as("id"), expr("rank div deg").as("c"))
          .groupBy("id").agg(sum("c").as("m"))
        pr = nodes.join(inf, Seq("id"), "left")
          .select(col("id"),
            (lit(base) + expr("(85 * coalesce(m, 0L)) div 100")).as("rank"))
          .cut
      }
      pr.count()
    }
    def lpaJoinLoop(): Unit = {
      var labels = lbl0
      for (_ <- 1 to 3) {
        val v = e.join(labels.withColumnRenamed("id", "s"), "s")
          .groupBy(col("d").as("id"), col("lbl")).agg(count(lit(1)).as("c"))
          .groupBy("id")
          .agg(max(struct(col("c"), (-col("lbl")).as("nl"))).as("m"))
          .select(col("id"), (-col("m.nl")).as("vl"))
        labels = labels.join(v, Seq("id"), "left")
          .select(col("id"), coalesce(col("vl"), col("lbl")).as("lbl"))
          .cut
      }
      labels.count()
    }
    // warm both paths once
    graft.operators.Components.connectedComponents(pc, "s", "d").count()
    ccJoinLoop()
    time("cc_fused") {
      graft.operators.Components.connectedComponents(pc, "s", "d").count() }
    time("cc_join") { ccJoinLoop() }
    graft.operators.Components.pageRank(e, "s", "d", iters = 5).count()
    prJoinLoop()
    time("pr_fused") {
      graft.operators.Components.pageRank(e, "s", "d", iters = 5).count() }
    time("pr_join") { prJoinLoop() }
    graft.operators.Components.labelPropagation(e, "s", "d", rounds = 3).count()
    lpaJoinLoop()
    time("lpa_fused") {
      graft.operators.Components.labelPropagation(e, "s", "d", rounds = 3)
        .count() }
    time("lpa_join") { lpaJoinLoop() }
    spark.stop()
    sys.exit(0)
  }
}
