package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One media asset: opaque binary payload + typed metadata columns.
  * At 100 TB the payload column dominates storage — all metadata-only
  * queries must prune it at the parquet scan (SURVEY §4 column pruning),
  * which is why metadata lives in flat typed columns, never inside the blob.
  */
final case class MediaRow(
    media_id: Long,
    kind: String,
    width: Int,
    height: Int,
    payload: Array[Byte])

final case class MediaFeatures(
    media_id: Long,
    n_bytes: Long,
    features: Array[Float])

final case class Frame(
    media_id: Long,
    frame_idx: Int,
    frame_bytes: Array[Byte])

/** Decoded-image facts re-derived from the pixel data itself (not the
  * metadata columns): real dimensions, channel count, per-channel means.
  */
final case class ImageMeta(
    media_id: Long,
    dec_width: Long,
    dec_height: Long,
    n_channels: Long,
    mean_r: Long,
    mean_g: Long,
    mean_b: Long)

/** Multimodal (image/audio/video-as-binary) pipeline plumbing.
  *
  * The Spark-side mechanics are real — schema, partition-preserving
  * `mapPartitions` batches, column pruning, typed encoders. The IMAGE codec
  * is real too: `javax.imageio` ships in every JDK, so PNG/JPEG/BMP
  * encode/decode/resize run as genuine per-partition executor work
  * ([[encodePng]]/[[decodeImageMeta]]/[[resizeImage]]). Only the
  * audio/model-feature step remains a deterministic STUB (no audio/ML
  * libraries in this environment), confined to one marked private function
  * so swapping in a real backend (JNI codec, ONNX runtime, ...) touches
  * exactly that function and nothing in the plan.
  */
object Multimodal {

  /** Deterministic synthetic media table derived from `documents`: payload
    * bytes are the utf-8 text, metadata derived from doc_id — reproducible
    * in any engine, which keeps the binary plumbing oracle-checkable.
    */
  def synthesize(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      (col("doc_id") % 640 + 16).cast("int").as("width"),
      (col("doc_id") % 480 + 16).cast("int").as("height"),
      col("text").cast("binary").as("payload"))

  /** Encode a `width`×`height` PNG filled with one constant RGB color —
    * deterministic pixel content, so decoded facts (dimensions, channel
    * count, per-channel means) are pure arithmetic over the generator
    * inputs and therefore oracle-checkable even though PNG byte streams
    * themselves are encoder-specific.
    */
  def encodePng(width: Int, height: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (r & 0xff) << 16 | (g & 0xff) << 8 | (b & 0xff)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Synthetic IMAGE table: real PNG payloads generated per row on the
    * executors, dimensions and fill color derived from `doc_id` — the
    * decode path can then be verified against plain arithmetic.
    */
  def synthesizeImages(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      // keep the codec fully in-memory: ImageIO's default stream cache
      // writes a temp FILE per encode/decode — pure syscall overhead when
      // every payload is already a byte array
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        val w = (id % 64 + 16).toInt
        val h = (id % 48 + 16).toInt
        MediaRow(id, "image", w, h,
          encodePng(w, h,
            (id % 256).toInt, ((id * 7 + 31) % 256).toInt, ((id * 13 + 7) % 256).toInt))
      }
    }
  }

  /** REAL image decode (`javax.imageio` — PNG/JPEG/BMP in every JDK):
    * re-derive dimensions, channel count, and exact per-channel pixel means
    * from the payload bytes alone. Batched per partition like every other
    * codec step; `getRGB` normalizes any raster layout to packed sRGB.
    */
  def decodeImageMeta(media: Dataset[MediaRow]): Dataset[ImageMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // in-memory codec, no temp files
      it.map { m =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.payload))
        require(img != null, s"payload of media ${m.media_id} is not a decodable image")
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        ImageMeta(m.media_id, w, h, img.getRaster.getNumBands,
          sr / n, sg / n, sb / n)
      }
    }
  }

  /** REAL image resize (AWT `Graphics2D`, bilinear): decode, scale, re-encode
    * PNG, with the metadata columns updated to the actual new dimensions.
    */
  def resizeImage(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    require(w > 0 && h > 0, "target dimensions must be positive")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // in-memory codec, no temp files
      it.map { m =>
        val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.payload))
        require(src != null, s"payload of media ${m.media_id} is not a decodable image")
        val dst = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val gfx = dst.createGraphics()
        try {
          gfx.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          gfx.drawImage(src, 0, 0, w, h, null)
        } finally gfx.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, "png", bos)
        m.copy(width = w, height = h, payload = bos.toByteArray)
      }
    }
  }

  /** STUB: a real implementation decodes the audio/video payload with a
    * codec and computes model features. The fake is a 256-bin byte
    * histogram folded to `dim` floats — deterministic, order-independent,
    * and shaped exactly like a real embedding batch.
    */
  private def stubDecodeFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    val hist = new Array[Long](dim)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) % dim) += 1
      i += 1
    }
    val n = math.max(payload.length, 1).toFloat
    hist.map(_ / n)
  }

  /** Batched feature extraction over the opaque payload column. One
    * executor task per partition, payload column read once, metadata
    * carried through — the Scala analogue of a `mapInPandas` batch UDF.
    */
  def decodeFeatures(media: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        MediaFeatures(m.media_id, m.payload.length.toLong,
          stubDecodeFeatures(m.payload, dim))
      }
    }
  }

  /** Fixed-stride frame sampling from a video-as-binary payload: emit every
    * `stride`-th `frameSize`-byte block. Partition-preserving flatMap — at
    * scale the output is explosively larger than the input, so it must
    * never collect or shuffle before downstream filtering.
    */
  def sampleFrames(media: Dataset[MediaRow], frameSize: Int, stride: Int): Dataset[Frame] = {
    require(frameSize > 0 && stride > 0, "frameSize and stride must be positive")
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val nFrames = m.payload.length / frameSize
      (0 until nFrames by stride).iterator.map { f =>
        Frame(m.media_id, f,
          java.util.Arrays.copyOfRange(m.payload, f * frameSize, (f + 1) * frameSize))
      }
    }
  }

}
