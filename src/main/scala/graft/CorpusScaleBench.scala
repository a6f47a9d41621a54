package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.RunLog
import graft.modules.CorpusModule

/** Scaling-evidence run for the corpus-intake MODULE — the composed
  * pipeline behind q_corpus_pipeline/q_corpus_incr, not a single
  * operator. Times, at 1×/3×/10× the sf0.1 corpus size over the same
  * hash-deterministic Zipfian docs as [[ScaleBench]]:
  *
  *   - batch: `CorpusModule.graph(langs=en, benchmark=Some(eval)).run`
  *     end-to-end (normalize → lang gate → decontaminate shingle-join →
  *     scrub → dedupe shuffle → score → filter) — expected to scale like
  *     the dedupe shuffle, the pipeline's only exchange over data
  *   - incremental: a FIXED 2.5k-doc delta block consumed through
  *     `Graph.runIncremental` against an already-consumed backlog of
  *     each size — the daily-ingest production question; the RunLog
  *     ledger must make this FLAT in backlog size (run 2 never re-scans
  *     consumed blocks; the plan is wired from the delta alone)
  *
  * The timed action aggregates the COMPUTED columns (sum of quality +
  * repetition), not a bare count — count() would let column pruning
  * delete the scoring stage from row-count-preserving plans.
  * Output lines (`SCALE corpus_* ...`) feed SCALING.md — BOTH regimes
  * in its table come from this harness: the default-AQE rows as-is,
  * the coalescing-off rows via GRAFT_CSB_COALESCE=0 (at these corpus
  * sizes the dedupe shuffle is far below AQE's 64 MB advisory target,
  * so coalescing caps parallelism and wall time tracks granted
  * partitions, not work; disabling it isolates the algorithmic slope).
  */
object CorpusScaleBench {
  def main(args: Array[String]): Unit = {
    val coalesce = sys.env.getOrElse("GRAFT_CSB_COALESCE", "1") != "0"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.enabled",
        coalesce.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val outRoot = args.headOption.getOrElse("/tmp/graft_scale_corpus")
    val sizes = Seq(5000L, 15000L, 50000L) // sf0.1 docs × {1, 3, 10}
    sizes.foreach(n => ScaleBench.genDocs(spark, n, s"$outRoot/docs_$n"))
    println("SCALE corpus generated")

    // a small fixed eval set for the decontaminate stage: 500 docs drawn
    // from a DISJOINT hash stream (ids offset far past any corpus id)
    val bench = spark.range(500).select(
      ($"id" + 900000000L).as("id"),
      array_join(transform(sequence(lit(0), lit(ScaleBench.tokensPerDoc - 1)),
        k => ScaleBench.zipfToken($"id" + 900000000L, k)), " ").as("text"))

    // fixed 2.5k-doc delta for the incremental path (fresh hash stream)
    val delta = spark.range(2500).select(
      ($"id" + 800000000L).as("doc_id"),
      array_join(transform(sequence(lit(0), lit(ScaleBench.tokensPerDoc - 1)),
        k => ScaleBench.zipfToken($"id" + 800000000L, k)), " ").as("text"),
      lit("en").as("lang"), lit("synb").as("source"),
      lit(400).as("n_chars"))

    def g = CorpusModule.graph(minQuality = 0.0, maxRepetition = 1.0,
      benchmark = Some(bench), langs = Seq("en"))

    // force the computed columns through the action (see Scaladoc)
    def settle(kept: DataFrame): Unit =
      kept.agg(sum($"quality") + sum($"repetition")).collect()

    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"SCALE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // each RunLog gets a FRESH temp dir: the ledger is durable by design,
    // so a fixed path would mark every block consumed on the first
    // invocation and no-op (empty map) all later runs of this bench
    def freshLog(): RunLog = new RunLog(
      java.nio.file.Files.createTempDirectory("graft_csb_log").toString)

    // warm both plan shapes on the smallest corpus
    settle(g.run(Map("docs" ->
      spark.read.parquet(s"$outRoot/docs_5000")))("kept"))
    locally {
      val log = freshLog()
      g.runIncremental(Map("docs" -> Seq(
        "backlog" -> spark.read.parquet(s"$outRoot/docs_5000"))), log)
      settle(g.runIncremental(Map("docs" -> Seq(
        "backlog" -> spark.read.parquet(s"$outRoot/docs_5000"),
        "delta" -> delta)), log)("kept"))
    }

    sizes.foreach { n =>
      val docs = spark.read.parquet(s"$outRoot/docs_$n")
      time(s"corpus_batch_$n") { settle(g.run(Map("docs" -> docs))("kept")) }
      // consume the backlog OUTSIDE the timed window (ingest-time work),
      // then time the delta-only run — the production daily-ingest cost
      val log = freshLog()
      g.runIncremental(Map("docs" -> Seq("backlog" -> docs)), log)
      time(s"corpus_incr_$n") {
        settle(g.runIncremental(Map("docs" -> Seq(
          "backlog" -> docs, "delta" -> delta)), log)("kept"))
      }
    }

    // STREAM-FED ingest ([[graft.streaming.Streams.corpusIngest]] — the
    // q_corpus_stream surface): FIXED block size (2.5k base docs), growing
    // block COUNT. Two accumulation hazards the batch/incremental rows
    // above cannot see: the file-source's seen-files map and the
    // checkpoint offset/commit logs both grow with every block ever
    // ingested. Flat wall/block across N means neither shows at this
    // scale; the RESUME row (ONE fresh block landed after N are already
    // consumed, same dirs) is the production morning-run cost and must
    // track the new block, not the backlog. No settle(): the stream's
    // foreachBatch sink WRITES the kept parquet (scores included), so the
    // work is forced inside the timed window by construction.
    def streamDirs(tag: String): String = java.nio.file.Files
      .createTempDirectory(s"graft_csb_stream_$tag").toString
    // landing goes through the module's OWN helper — the bench must
    // measure the real landing contract, not a lookalike
    def land(docs: org.apache.spark.sql.DataFrame, nb: Int,
        src: String): Unit =
      graft.streaming.Streams.landBlocks(docs, src, nb)
    locally { // warm the streaming plan shape once, untimed
      val w = streamDirs("warm")
      val docs = spark.read.parquet(s"$outRoot/docs_5000").limit(500)
        .localCheckpoint(true)
      land(docs, 2, s"$w/src")
      graft.streaming.Streams.corpusIngest(docs, g, s"$w/src", s"$w/kept",
        s"$w/ckpt", s"$w/log", nBlocks = 2)
    }
    Seq(2, 8, 32).foreach { nb =>
      ScaleBench.genDocs(spark, nb * 2500L, s"$outRoot/sdocs_$nb")
      val docs = spark.read.parquet(s"$outRoot/sdocs_$nb")
      val root = streamDirs(s"n$nb")
      land(docs, nb, s"$root/src") // landing untimed: upstream reality
      time(s"corpus_stream_${nb}blocks") {
        val (_, n) = graft.streaming.Streams.corpusIngest(docs, g,
          s"$root/src", s"$root/kept", s"$root/ckpt", s"$root/log",
          nBlocks = nb)
        require(n == nb, s"expected $nb micro-batches, got $n")
      }
      // one fresh 2.5k-doc block after nb consumed blocks — same dirs,
      // the checkpoint resumes and the ledger holds batch0..batch{nb-1}
      delta.repartition(1).write.mode("overwrite")
        .parquet(s"$root/src/p$nb")
      time(s"corpus_stream_resume_after_$nb") {
        val (_, n) = graft.streaming.Streams.corpusIngest(docs, g,
          s"$root/src", s"$root/kept", s"$root/ckpt", s"$root/log",
          nBlocks = nb)
        require(n == 1, s"expected 1 resumed micro-batch, got $n")
      }
    }
    spark.stop()
  }
}
