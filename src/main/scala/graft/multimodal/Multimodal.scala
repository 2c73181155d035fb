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

/** Multimodal (image/audio/video-as-binary) pipeline plumbing.
  *
  * The Spark-side mechanics are real — schema, partition-preserving
  * `mapPartitions` batches, column pruning, typed encoders. The codec call
  * itself is STUBBED with a deterministic fake (this environment has no
  * image/audio libraries): every stub is marked `STUB:` and confined to one
  * private function, so swapping in a real decoder (JNI codec, ONNX
  * runtime, ...) touches exactly that function and nothing in the plan.
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

  /** STUB: a real implementation decodes the image/audio payload with a
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

  /** STUB: a real implementation resizes the decoded image. The fake keeps
    * the byte stream but rewrites the metadata — plan shape (project +
    * mapPartitions, payload untouched) is what a real resize does too.
    */
  def resizeStub(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map(m => m.copy(width = w, height = h))
  }
}
