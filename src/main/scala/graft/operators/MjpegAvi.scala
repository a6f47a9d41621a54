package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JDK MJPEG-in-AVI container codec (RIFF per the public AVI spec:
  * `RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi'
  * 00dc…))`) — the one video format decodable without any external codec
  * library, because each frame is an ordinary JPEG that ImageIO handles.
  *
  * This closes the round-3 "video stays stubbed" gap for real: the
  * demuxer walks the RIFF chunk tree (skipping unknown chunks by size,
  * honoring odd-size padding), collects the `..dc`/`..db` stream chunks,
  * and hands back the per-frame JPEG payloads. The muxer exists so tests
  * and pipelines can round-trip fixtures without network or native tools.
  *
  * Corrupt input policy matches the other codecs: `Left(reason)`, never an
  * exception — at 100 TB some blobs are always bad and must become error
  * ROWS, not task failures.
  */
object MjpegAvi {

  private def fourCC(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def u32(v: Long): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v.toInt).array()

  /** Mux JPEG-encoded frames into an AVI (MJPG handler, `fps` frames/s).
    * Frames must share one dimension set (`width`×`height`) — standard
    * MJPEG constraint; the demuxer does not rely on it. */
  def encode(jpegFrames: Seq[Array[Byte]], width: Int, height: Int,
      fps: Int): Array[Byte] = {
    require(fps > 0, s"fps must be positive, got $fps")
    def chunk(cc: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray
      fourCC(cc) ++ u32(body.length) ++ body ++ pad
    }
    def list(listType: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", fourCC(listType) ++ body)

    val maxFrame = (jpegFrames.map(_.length) :+ 0).max
    // AVIMAINHEADER: µs/frame, maxBytesPerSec, padding, flags(HASINDEX off),
    // totalFrames, initialFrames, streams, suggestedBufSize, w, h, rsvd[4]
    val avih = chunk("avih", Array(
      1000000L / fps, maxFrame.toLong * fps, 0L, 0L,
      jpegFrames.length.toLong, 0L, 1L, maxFrame.toLong,
      width.toLong, height.toLong, 0L, 0L, 0L, 0L).flatMap(u32))
    // AVISTREAMHEADER: 'vids'/'MJPG', flags, prio+lang, initFrames, scale,
    // rate, start, length, bufSize, quality(-1), sampleSize, rcFrame
    val strh = chunk("strh", fourCC("vids") ++ fourCC("MJPG") ++ Array(
      0L, 0L, 0L, 1L, fps.toLong, 0L, jpegFrames.length.toLong,
      maxFrame.toLong, 0xffffffffL, 0L).flatMap(u32) ++
      u32(0) ++ ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putShort(width.toShort).putShort(height.toShort).array())
    // BITMAPINFOHEADER with biCompression = 'MJPG'
    val strf = chunk("strf", u32(40) ++ u32(width.toLong) ++ u32(height.toLong) ++
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putShort(1).putShort(24).array() ++
      fourCC("MJPG") ++ u32(width.toLong * height * 3) ++
      Array(0L, 0L, 0L, 0L).flatMap(u32))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    // single-pass assembly: a foldLeft of array concats would copy the
    // growing prefix once per frame (quadratic in frame count)
    val moviBody = new ByteArrayOutputStream()
    jpegFrames.foreach(f => moviBody.write(chunk("00dc", f)))
    val movi = list("movi", moviBody.toByteArray)
    val body = fourCC("AVI ") ++ hdrl ++ movi
    fourCC("RIFF") ++ u32(body.length) ++ body
  }

  /** Demux: the JPEG payload of every video-data chunk (`..dc`/`..db`)
    * inside the `movi` list, in stream order. */
  def decodeFrames(avi: Array[Byte]): Either[String, Vector[Array[Byte]]] = {
    if (avi.length < 12) return Left("payload too short for RIFF header")
    def cc(off: Int) = new String(avi, off, 4, "US-ASCII")
    def len(off: Int): Long =
      ByteBuffer.wrap(avi, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt.toLong & 0xffffffffL
    if (cc(0) != "RIFF") return Left("not a RIFF container")
    if (cc(8) != "AVI ") return Left(s"RIFF form is '${cc(8)}', not AVI")
    val end = math.min(avi.length.toLong, 8L + len(4))
    val frames = Vector.newBuilder[Array[Byte]]

    // walk chunks in [off, limit); recurse into LISTs, collect ..dc/..db.
    // depth-bounded: real AVI nests 2–3 levels; a crafted payload of
    // nested LIST headers must yield Left, not a StackOverflowError (an
    // Error, which the failures-as-data policy could never catch)
    def walk(off0: Long, limit: Long, depth: Int): Option[String] = {
      if (depth > 16) return Some("LIST nesting deeper than any real AVI")
      var off = off0
      while (off + 8 <= limit) {
        val id = cc(off.toInt)
        val sz = len(off.toInt + 4)
        val dataStart = off + 8
        if (dataStart + sz > limit)
          return Some(s"chunk '$id' size $sz overruns container")
        if (id == "LIST") {
          if (sz < 4) return Some("LIST chunk too short for a list type")
          val sub = walk(dataStart + 4, dataStart + sz, depth + 1)
          if (sub.isDefined) return sub
        } else if (id.length == 4 && (id.endsWith("dc") || id.endsWith("db"))) {
          frames += java.util.Arrays.copyOfRange(avi, dataStart.toInt, (dataStart + sz).toInt)
        }
        off = dataStart + sz + (sz % 2) // chunks are word-aligned
      }
      None
    }
    walk(12, end, 0) match {
      case Some(err) => Left(s"corrupt AVI: $err")
      case None => Right(frames.result())
    }
  }

  /** Convenience muxer for tests/pipelines: JPEG-encode BufferedImages. */
  def encodeImages(frames: Seq[java.awt.image.BufferedImage], fps: Int): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    val jpegs = frames.map { img =>
      val buf = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", buf)
      buf.toByteArray
    }
    encode(jpegs, frames.head.getWidth, frames.head.getHeight, fps)
  }
}
