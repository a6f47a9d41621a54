package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video travel as opaque `binary`
  * columns with typed metadata; decode/feature-extract/frame-sample run as
  * typed `mapPartitions` stages (the Scala analogue of a vectorized batch
  * UDF — one iterator per partition, so codec state is initialized once per
  * partition, not per row).
  *
  * The actual codecs are STUBBED: no image/audio libraries exist in this
  * container, so `decodeStub` derives deterministic fake features from the
  * payload bytes. Everything around the stub — schema, encoders, partition
  * batch shape, partition-count preservation — is real and tested; swapping
  * in a real decoder changes only the marked function body.
  *
  * Scale: payloads never shuffle unless the caller joins/groups; feature
  * extraction is a narrow map over whatever partitioning the source has
  * (at 100 TB: one partition per parquet row-group of blobs).
  */
object Multimodal {

  /** One media row: payload is the raw encoded bytes. */
  final case class MediaRow(id: Long, modality: String, payload: Array[Byte],
      width: Int, height: Int)

  final case class MediaFeatures(id: Long, modality: String, dim: Int,
      features: Array[Float])

  final case class Frame(id: Long, frameNo: Int, bytes: Array[Byte])

  // ---- STUB ----------------------------------------------------------
  // Real deployment: decode payload with an image/audio codec and run a
  // feature extractor. Deterministic fake: a rolling hash of the bytes
  // seeds each feature dimension.
  private def stubFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    var h = 1125899906842597L
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    var d = 0
    while (d < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(d) = ((h >>> 40).toInt % 1000) / 1000.0f
      d += 1
    }
    out
  }
  // --------------------------------------------------------------------

  /** Decode + feature-extract each media row (stubbed codec; real batch
    * plumbing). Partition-preserving narrow transformation. */
  def decodeFeatures(media: Dataset[MediaRow], dim: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init would open the codec once, here
      rows.map(r => MediaFeatures(r.id, r.modality, dim, stubFeatures(r.payload, dim)))
    }
  }

  /** Sample every `stride`-th fixed-size chunk of a video payload as a
    * "frame" (stub for a real frame decoder; keeps the 1→N generator
    * shape: flatMap, no shuffle). */
  def frameSample(media: Dataset[MediaRow], frameBytes: Int,
      stride: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex.collect {
        case (chunk, idx) if idx % stride == 0 => Frame(r.id, idx, chunk)
      }
    }
  }

  /** Join documents with their embedding vectors into one multimodal row
    * (text + vector + metadata struct). */
  def withEmbeddings(docs: DataFrame, embeddings: DataFrame,
      docId: String = "doc_id", vecId: String = "vec_id"): DataFrame =
    docs.join(embeddings, col(docId) === col(vecId))
      .select(col(docId), struct(col("text"), col("lang"), col("embedding")).as("mm"))
}
