package graft.operators

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.multimodal.{MediaRow, Multimodal}

/** Multimodal (binary-column) surface for the driver contract.
  *
  * Media tables are synthesized deterministically from `documents` (q39/q41:
  * payload = utf-8 text bytes; q40: real per-row PNGs; q73: real per-row
  * WAVs), so metadata, decoded-pixel, and decoded-sample arithmetic are all
  * reproducible in DuckDB — both JDK codecs (`javax.imageio`,
  * `javax.sound.sampled`) are oracle-checked end-to-end (see
  * [[graft.multimodal.Multimodal]]).
  */
object MultimodalOps {

  def all: Seq[GraftQuery] = Seq(mediaMeta, mediaFeatures, frameStats, wavAudio)

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
    * round-trip without ever seeing a PNG. (The audio path gets the same
    * treatment in q73: [[Multimodal.decodeAudioMeta]].)
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

  /** REAL audio decode, end-to-end oracle-checked (the q40 move for WAV):
    * per-row RIFF/WAVE PCM16 payloads are generated on the executors
    * (channels / sample rate / frame count / integer-LCG samples all
    * derived from `doc_id`), then `javax.sound.sampled` decodes the payload
    * bytes back to format facts and per-channel RMS/peak. WAV byte streams
    * are fixed-layout, but the oracle never parses one — every DECODED fact
    * is pure (integer) arithmetic over the generator inputs, with the two
    * IEEE-double steps (sum/n, sqrt, ×1000/sr) rounded to 6 decimals on
    * both sides (the repo's decimal-replay idiom).
    */
  val wavAudio: GraftQuery = GraftQuery.sql(
    "q73_wav_audio",
    """WITH cfg AS (
      |  SELECT doc_id AS media_id,
      |    doc_id % 2 + 1 AS nch,
      |    ([8000, 12000, 16000])[CAST(doc_id % 3 AS INT) + 1] AS sr,
      |    256 + doc_id % 257 AS nf
      |  FROM documents
      |), chs AS (
      |  SELECT *, unnest(range(0, nch)) AS ch FROM cfg
      |), smp AS (
      |  SELECT media_id, ch, nch, sr, nf,
      |    ((media_id * 73 + ch * 37 + i * 2654435761) % 65536) - 32768 AS s
      |  FROM (SELECT *, unnest(range(0, nf)) AS i FROM chs)
      |), agg AS (
      |  SELECT media_id,
      |    any_value(sr) AS sr, any_value(nch) AS nch, any_value(nf) AS nf,
      |    sum(CASE WHEN ch = 0 THEN s * s ELSE 0 END) AS ss0,
      |    sum(CASE WHEN ch = 1 THEN s * s ELSE 0 END) AS ss1,
      |    max(CASE WHEN ch = 0 THEN abs(s) END) AS pk0,
      |    max(CASE WHEN ch = 1 THEN abs(s) END) AS pk1
      |  FROM smp GROUP BY media_id
      |)
      |SELECT media_id,
      |  CAST(sr AS BIGINT) AS sample_rate,
      |  CAST(nch AS BIGINT) AS n_channels,
      |  CAST(nf AS BIGINT) AS n_frames,
      |  round(nf * 1000.0 / sr, 6) AS duration_ms,
      |  round(sqrt(CAST(ss0 AS DOUBLE) / nf), 6) AS rms_ch0,
      |  CASE WHEN nch > 1 THEN round(sqrt(CAST(ss1 AS DOUBLE) / nf), 6) END AS rms_ch1,
      |  CAST(pk0 AS BIGINT) AS peak_ch0,
      |  CAST(pk1 AS BIGINT) AS peak_ch1
      |FROM agg
      |ORDER BY media_id""".stripMargin) { (spark, dir) =>
    Multimodal.decodeAudioMeta(
        Multimodal.synthesizeWavs(Tables.documents(spark, dir)))
      .toDF()
      .select(
        col("media_id"), col("sample_rate"), col("n_channels"), col("n_frames"),
        round(col("duration_ms"), 6).as("duration_ms"),
        round(col("rms_ch0"), 6).as("rms_ch0"),
        round(col("rms_ch1"), 6).as("rms_ch1"),
        col("peak_ch0"), col("peak_ch1"))
      .orderBy("media_id")
  }
}
