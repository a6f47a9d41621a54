package graft.operators

import graft.SparkSpec
import graft.operators.Multimodal.{Frame, MediaFeatures, MediaRow}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    MediaRow(1L, "image", Array.tabulate(64)(_.toByte), 8, 8),
    MediaRow(2L, "image", Array.tabulate(64)(_.toByte), 8, 8),  // same payload
    MediaRow(3L, "video", Array.tabulate(400)(i => (i % 7).toByte), 20, 20)
  ).toDS().repartition(3)

  test("decodeFeatures: fixed dim, deterministic from payload bytes") {
    val f = Multimodal.decodeFeatures(media, dim = 16).collect()
      .map(x => x.id -> x).toMap
    assert(f.values.forall(_.features.length == 16))
    assert(f(1L).features.toSeq == f(2L).features.toSeq) // same bytes -> same features
    assert(f(1L).features.toSeq != f(3L).features.toSeq)
    assert(f.values.forall(_.features.forall(v => v >= -1.0f && v <= 1.0f)))
  }

  test("decodeFeatures preserves partitioning (narrow, no shuffle)") {
    val out = Multimodal.decodeFeatures(media, dim = 4)
    assert(out.rdd.getNumPartitions == media.rdd.getNumPartitions)
  }

  test("frameSample strides chunks and keeps ids") {
    val frames = Multimodal.frameSample(media.filter(_.modality == "video"),
      frameBytes = 50, stride = 2).collect()
    // 400 bytes / 50 = 8 chunks, stride 2 -> frames 0,2,4,6
    assert(frames.map(_.frameNo).sorted.toSeq == Seq(0, 2, 4, 6))
    assert(frames.forall(_.id == 3L))
    assert(frames.forall(_.bytes.length == 50))
  }

  test("withEmbeddings builds the multimodal struct row") {
    val docs = Seq((1L, "hello", "en")).toDF("doc_id", "text", "lang")
    val emb = Seq((1L, Array(0.1f, 0.2f))).toDF("vec_id", "embedding")
    val out = Multimodal.withEmbeddings(docs, emb).collect()
    assert(out.length == 1)
    val mm = out.head.getStruct(1)
    assert(mm.getString(0) == "hello" && mm.getString(1) == "en")
  }
}
