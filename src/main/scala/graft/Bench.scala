package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one warmup pass over every query at a small SF (so the
  * timed pass measures plans, not JIT/classloader/codegen warmup — the
  * round-1 first-query 5× artifact), then every declared query in SORTED
  * name order at the target SF, so per-query times are attributable across
  * rounds. Failures are reported in an explicit "errors" array and as -1
  * in the per-query map — a broken query must never masquerade as fast. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      // default codegen cache holds 100 generated classes — a 240-query
      // suite evicts everything long before a query's alphabetical turn,
      // so its timed window RE-COMPILES (and re-JITs) every fragment the
      // warmup pass already built. Generated code depends on the plan,
      // not the data, so with a big enough cache the warmup compile is
      // reused at the timed SF — measured as both a level and a noise
      // reduction on the iterative block (r7)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      // a 360+-execution suite otherwise accumulates per-execution status
      // (plan graphs, metrics) in the driver for the whole run — dead
      // weight the GC drags through every later query's timed window
      // shuffle-file deletion is ASYNC by default: the ContextCleaner
      // drains removals triggered by one query's System.gc() DURING the
      // next query's timed window. Blocking mode charges each query its
      // own cleanup inside its own pre-GC window — correct attribution.
      // Honest measurement note: it did NOT eliminate the roaming
      // in-suite outlier (one query per run lands 2-5x its isolated
      // time — q_cluster_coeff 29.9 s, then q_video_neardup 13.2 s,
      // then q_triangles 20.3 s across runs, each stable 3-7 s
      // isolated and in other runs); that residue tracks the host, not
      // cleanup debt or the plans.
      .config("spark.cleaner.referenceTracking.blocking.shuffle", "true")
      .config("spark.sql.ui.retainedExecutions", "4")
      .config("spark.ui.retainedJobs", "50")
      .config("spark.ui.retainedStages", "50")
      .config("spark.ui.retainedTasks", "500")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.toSeq.sorted
    var warmFailures = 0
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, warmDir).count()
      catch { case scala.util.control.NonFatal(_) => warmFailures += 1 }
    }
    if (warmFailures > 0)
      // a silently skipped warmup would re-introduce the first-query JIT
      // artifact with zero signal — say so loudly
      System.err.println(s"[bench] WARNING: $warmFailures/${names.size} warmup " +
        s"queries failed against $warmDir; timings may absorb JIT warmup")
    // Storage isolation: the iterative queries cut lineage with eager
    // localCheckpoint, whose MEMORY_AND_DISK blocks are reclaimed only when
    // the async ContextCleaner notices the RDD refs are gone — in a 137-query
    // suite the blocks pile up and round 5 measured q_triangles at 10.3 s
    // in-suite vs 4.6 s isolated (memory pressure + GC, not the plan).
    // Synchronously dropping every persisted RDD and cached plan between
    // queries charges each query its own storage, like System.gc() below
    // charges it its own garbage.
    def releaseStorage(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
    }
    releaseStorage() // warmup leftovers
    // The iterative block (multi-round loops: per-round localCheckpoint
    // blocks + barrier jobs) is the one family whose in-suite times still
    // swing 2x run-to-run on plan-identical executions (r5/r6 verdicts) —
    // G1's concurrent cycle from the PREVIOUS query's garbage keeps
    // running into the next timed window. For exactly these queries, let
    // the collector settle: a short sleep after the full GC, then a
    // second GC to sweep what the concurrent phase surfaced. ~15 queries
    // x settleMs is the whole cost; the remaining 200+ queries keep the
    // single-GC path.
    val iterative = Set("q_pagerank", "q_communities", "q_bfs", "q_sssp",
      "q_kcore", "q_triangles", "q_tree_depth", "q_2hop", "q_bpe_train",
      "q_random_walk", "q_hits", "q_dedup_cluster", "q_semdedup",
      "q_neardup_lsh", "q_snapshot",
      // same checkpoint-heavy profile (triangle enumeration / pair
      // emission): measured 23.7 s in-suite vs 3.8-4.6 s isolated (r7)
      "q_cluster_coeff", "q_linkpred")
    val settleMs = sys.env.getOrElse("SPARK_GRAFT_SETTLE_MS", "300").toLong
    val results = names.map { name =>
      // GC isolation: the queries run alphabetically in one shared JVM, so
      // a heavy query's garbage (millions of candidate-pair rows) was
      // being collected DURING its alphabetical neighbors' timed windows —
      // round 4 showed untouched queries (q_quota, q_pack, q_regex) regress
      // 3-7x purely from sitting downstream of the new dedup block. A full
      // GC before each timed window charges every query its own garbage.
      releaseStorage()
      System.gc()
      if (iterative(name) && settleMs > 0) {
        Thread.sleep(settleMs)
        System.gc()
      }
      val t0 = System.nanoTime()
      val ok =
        try { SparkEntry.queries(name)(spark, sfDir).count(); true }
        catch { case scala.util.control.NonFatal(_) => false }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def entry(k: String, v: Double, ok: Boolean): String =
      s""""$k":${if (ok) f3(v) else -1}"""
    val errors = results.filterNot(_._3).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val total = results.filter(_._3).map(_._2).sum
    // The harness keeps only the LAST ~2000 chars of stdout and parses the
    // JSON line out of that tail. At 109 queries even the 3-decimal map is
    // ~2.4 KB — rounds 1-2 AND 4 shipped parsed:null with the first
    // entries truncated. So: the FULL per-query record goes to a committed
    // file (BENCH_DETAIL.json, the durable cross-round record), and the
    // printed line — last, so it survives the tail window — carries the
    // total plus only the slowest queries (the ones worth tracking in the
    // harness record), capped to keep the line well under the window.
    val detailJson =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":${
        results.map(r => entry(r._1, r._2, r._3)).mkString("{", ",", "}")
      },"sf":"$sfDir","errors":$errors}"""
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_DETAIL", "BENCH_DETAIL.json")
    // escaped where it is interpolated into the JSON line: a quote or
    // backslash in the env-provided path must not yield an unparseable
    // record (the exact failure this output format exists to avoid)
    val detailPathJson = detailPath.replace("\\", "\\\\").replace("\"", "\\\"")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(detailPath), detailJson + "\n")
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] could not write $detailPath: ${e.getMessage}") }
    val slow = results.filter(_._3).sortBy(-_._2).take(24)
    val slowSet = slow.map(_._1).toSet
    val qs = results // keep sorted name order; errors always included as -1
      .filter(r => !r._3 || slowSet(r._1))
      .map(r => entry(r._1, r._2, r._3)).mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","errors":$errors,"detail":"$detailPathJson"}""")
    spark.stop()
  }
}
