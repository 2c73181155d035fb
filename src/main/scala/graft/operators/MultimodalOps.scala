package graft.operators

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.multimodal.{MediaRow, Multimodal}

/** Multimodal (binary-column) surface for the driver contract.
  *
  * The media table is synthesized deterministically from `documents`
  * (payload = utf-8 text bytes), so metadata and frame-count arithmetic are
  * reproducible in DuckDB — the binary plumbing is oracle-checked even
  * though the codec itself is a stub (see [[graft.multimodal.Multimodal]]).
  */
object MultimodalOps {

  def all: Seq[GraftQuery] = Seq(mediaMeta, mediaFeatures, frameStats)

  private def media(spark: org.apache.spark.sql.SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Multimodal.synthesize(Tables.documents(spark, dir)).as[MediaRow]
  }

  /** Metadata + fingerprint scan over the opaque payload column — all
    * builtin functions (octet length, md5), no decode.
    */
  val mediaMeta: GraftQuery = GraftQuery.sql(
    "q39_media_meta",
    """SELECT doc_id AS media_id,
      |  ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
      |  doc_id % 640 + 16 AS width,
      |  doc_id % 480 + 16 AS height,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  md5(text) AS fp
      |FROM documents
      |ORDER BY media_id""".stripMargin) { (spark, dir) =>
    media(spark, dir)
      .select(
        col("media_id"), col("kind"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("fp"))
      .orderBy("media_id")
  }

  /** REAL image decode, end-to-end oracle-checked: per-row PNGs are
    * generated on the executors (dimensions + constant fill color derived
    * from `doc_id`), then `javax.imageio` decodes the payload bytes back to
    * dimensions, channel count, and exact per-channel pixel means. PNG byte
    * streams are encoder-specific, but every DECODED fact is pure arithmetic
    * over the generator inputs — so DuckDB verifies a genuine encode→decode
    * round-trip without ever seeing a PNG. (The audio/model-feature path
    * stays a spec-locked stub: [[Multimodal.decodeFeatures]].)
    */
  val mediaFeatures: GraftQuery = GraftQuery.sql(
    "q40_media_features",
    """SELECT doc_id AS media_id,
      |  CAST(doc_id % 64 + 16 AS BIGINT) AS dec_width,
      |  CAST(doc_id % 48 + 16 AS BIGINT) AS dec_height,
      |  CAST(3 AS BIGINT) AS n_channels,
      |  CAST(doc_id % 256 AS BIGINT) AS mean_r,
      |  CAST((doc_id * 7 + 31) % 256 AS BIGINT) AS mean_g,
      |  CAST((doc_id * 13 + 7) % 256 AS BIGINT) AS mean_b
      |FROM documents
      |ORDER BY media_id""".stripMargin) { (spark, dir) =>
    Multimodal.decodeImageMeta(
        Multimodal.synthesizeImages(Tables.documents(spark, dir)))
      .toDF()
      .orderBy("media_id")
  }

  /** Frame sampling (16-byte frames, stride 4) aggregated per media row —
    * count arithmetic is SQL-expressible, so the explode/aggregate path is
    * oracle-checked end-to-end.
    */
  val frameStats: GraftQuery = GraftQuery.sql(
    "q41_frame_stats",
    """WITH m AS (
      |  SELECT doc_id AS media_id, octet_length(encode(text)) // 16 AS n_frames
      |  FROM documents
      |)
      |SELECT media_id,
      |  CAST(ceil(n_frames / 4.0) AS BIGINT) AS n_sampled,
      |  CAST(ceil(n_frames / 4.0) AS BIGINT) * 16 AS total_frame_bytes
      |FROM m WHERE n_frames > 0
      |ORDER BY media_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Multimodal.sampleFrames(media(spark, dir), frameSize = 16, stride = 4)
      .groupByKey(_.media_id)
      .mapGroups { (id, it) =>
        var n = 0L; var bytes = 0L
        it.foreach { f => n += 1; bytes += f.frame_bytes.length }
        (id, n, bytes)
      }
      .toDF("media_id", "n_sampled", "total_frame_bytes")
      .orderBy("media_id")
  }
}
