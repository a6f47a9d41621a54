package graft
import org.apache.spark.sql.SparkSession

/** Throwaway dev experiment runner: args = confKey=value,... then query
  * names; times each query twice (min) with the confs applied. Not part
  * of any contract — delete before round close if unused. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (confs, queries) = args.partition(_.contains("="))
    confs.foreach { c =>
      val Array(k, v) = c.split("=", 2)
      spark.conf.set(k, v)
      println(s"[scratch] conf $k=$v")
    }
    val timeline = sys.env.get("SCRATCH_TIMELINE").contains("1")
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Int, String)]()
    @volatile var collect = false
    if (timeline) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val desc = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("") + "|" +
            j.stageInfos.map(s => s.name.take(40)).mkString(";").take(120)
          starts.put(j.jobId, (j.time, desc))
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          if (collect) {
            val (s, d) = Option(starts.get(j.jobId)).getOrElse((j.time, ""))
            jobs.add((s, j.time, j.jobId, d))
          }
      })
    queries.foreach { q =>
      SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count() // warm
      SparkEntry.queries(q)(spark, sfDir).count() // target warm
      val times = (1 to 2).map { r =>
        System.gc()
        if (timeline && r == 2) { Thread.sleep(300); jobs.clear(); collect = true }
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        if (timeline && r == 2) { Thread.sleep(300); collect = false }
        sec
      }
      println(f"[scratch] $q%s min=${times.min}%.2f all=${times.map(t => f"$t%.2f").mkString(",")}")
      if (timeline) {
        val js = scala.jdk.CollectionConverters
          .IteratorHasAsScala(jobs.iterator()).asScala.toSeq.sortBy(_._1)
        var prev = 0L
        js.foreach { case (s, e, id, d) =>
          val gap = if (prev == 0) 0 else s - prev
          println(f"[scratch]   job $id%4d dur=${e - s}%4d ms  gap=$gap%4d ms  $d%s")
          prev = e
        }
        println(f"[scratch]   jobs=${js.size} jobMs=${js.map(j => j._2 - j._1).sum} gapMs=${js.sliding(2).collect { case Seq(a, b) => math.max(0, b._1 - a._2) }.sum}")
      }
    }
    spark.stop()
    sys.exit(0)
  }
}
