package graft.operators

import graft.SparkSpec
import java.nio.file.Files

/** [[Checkpoint.cut]] — the deployment switch between executor-local
  * lineage cuts (default) and durable reliable checkpoints (the posture for
  * multi-round loops on clusters with executor-loss risk). */
class CheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def withReliable[A](dir: Option[String])(body: => A): A = {
    val sc = spark.sparkContext
    val prevDir = sc.getCheckpointDir
    spark.conf.set(Checkpoint.ReliableKey, "true")
    dir.foreach(sc.setCheckpointDir)
    try body
    finally {
      spark.conf.unset(Checkpoint.ReliableKey)
      // SparkContext has no un-set; restore a prior dir if there was one
      prevDir.foreach(sc.setCheckpointDir)
    }
  }

  // registered FIRST: later tests set a checkpoint dir on the shared
  // context, after which the raise precondition can no longer be staged
  test("reliable flag without a checkpoint dir raises (no silent fallback)") {
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      spark.conf.set(Checkpoint.ReliableKey, "true")
      try {
        val e = intercept[IllegalArgumentException](
          Checkpoint.cut(Seq(1).toDF("v")))
        assert(e.getMessage.contains("checkpoint directory"))
      } finally spark.conf.unset(Checkpoint.ReliableKey)
    }
  }

  test("default mode localCheckpoints (no checkpoint dir needed)") {
    assert(spark.conf.getOption(Checkpoint.ReliableKey).isEmpty)
    val out = Checkpoint.cut(Seq(1, 2, 3).toDF("v"))
    assert(out.as[Int].collect().sorted === Array(1, 2, 3))
  }

  test("reliable mode writes durable checkpoint files and stays correct") {
    val dir = Files.createTempDirectory("graft-ckpt").toString
    withReliable(Some(dir)) {
      val out = Checkpoint.cut(Seq(4, 5, 6).toDF("v"))
      assert(out.as[Int].collect().sorted === Array(4, 5, 6))
      // the cut must be DURABLE: rdd checkpoint files exist under dir
      val files = Files.walk(java.nio.file.Paths.get(dir)).toArray.map(_.toString)
      assert(files.exists(_.contains("rdd-")),
        s"no rdd checkpoint files under $dir")
    }
  }

  test("reliable mode in a full iterative operator (connectedComponents)") {
    val dir = Files.createTempDirectory("graft-ckpt-cc").toString
    withReliable(Some(dir)) {
      val m = Components.connectedComponents(
        Seq((3L, 2L), (1L, 2L), (5L, 6L)).toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      assert(m === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
    }
  }
}
