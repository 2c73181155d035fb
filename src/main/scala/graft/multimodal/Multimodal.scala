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

/** Decoded-audio facts re-derived from the WAV payload itself via
  * `javax.sound.sampled`: format header facts (sample rate, channel count,
  * frame count), duration, and per-channel signal stats (RMS, peak) computed
  * from the PCM samples. `*_ch1` are None for mono payloads.
  */
final case class AudioMeta(
    media_id: Long,
    sample_rate: Long,
    n_channels: Long,
    n_frames: Long,
    duration_ms: Double,
    rms_ch0: Double,
    rms_ch1: Option[Double],
    peak_ch0: Long,
    peak_ch1: Option[Long])

/** Multimodal (image/audio/video-as-binary) pipeline plumbing.
  *
  * The Spark-side mechanics are real — schema, partition-preserving
  * `mapPartitions` batches, column pruning, typed encoders. The codecs are
  * real too, both JDK-native: `javax.imageio` for PNG/JPEG/BMP
  * ([[encodePng]]/[[decodeImageMeta]]/[[resizeImage]]) and
  * `javax.sound.sampled` for WAV/PCM audio
  * ([[encodeWavPcm16]]/[[decodeAudioMeta]]), all running as genuine
  * per-partition executor work. [[decodeFeatures]] dispatches on the
  * payload's magic bytes: WAV payloads get features from the real audio
  * decode; any other codec falls back to a deterministic byte-histogram
  * baseline (swapping in a richer backend — JNI codec, ONNX runtime, ... —
  * touches exactly [[byteHistogramFeatures]] and nothing in the plan).
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

  /** Encode interleaved PCM16 samples as a canonical 44-byte-header RIFF/
    * WAVE byte stream — the format `javax.sound.sampled` reads back
    * ([[decodeAudioMeta]]; MultimodalSpec cross-checks the header against
    * the JDK's own WAV writer). `samples(ch)(i)` = channel ch, frame i.
    */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Array[Short]]): Array[Byte] = {
    val nch = samples.length
    require(nch >= 1, "at least one channel")
    val nFrames = samples(0).length
    require(samples.forall(_.length == nFrames), "channels must be equal length")
    val dataSize = nFrames * nch * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(nch.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * nch * 2) // byte rate
      .putShort((nch * 2).toShort) // block align
      .putShort(16.toShort) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < nFrames) {
      var c = 0
      while (c < nch) { buf.putShort(samples(c)(i)); c += 1 }
      i += 1
    }
    buf.array()
  }

  /** The deterministic PCM sample generator shared by [[synthesizeWavs]]
    * and the q73 oracle: pure integer arithmetic (an LCG-style mix), so the
    * waveform is bit-identical in any engine — no `sin` ULP divergence.
    */
  def synthSample(mediaId: Long, ch: Int, i: Int): Short =
    (((mediaId * 73L + ch * 37L + i * 2654435761L) % 65536L) - 32768L).toShort

  /** Synthetic AUDIO table: real RIFF/WAVE PCM16 payloads generated per row
    * on the executors — channel count, sample rate, and frame count derived
    * from `doc_id`, samples from [[synthSample]] — so the real decode path
    * is verifiable against plain arithmetic (same move as
    * [[synthesizeImages]] for PNG).
    */
  def synthesizeWavs(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val nch = (id % 2 + 1).toInt
        val sr = Array(8000, 12000, 16000)((id % 3).toInt)
        val nFrames = (256 + id % 257).toInt
        val samples = Array.tabulate(nch, nFrames)((c, i) => synthSample(id, c, i))
        MediaRow(id, "audio", sr, nFrames, encodeWavPcm16(sr, samples))
      }
    }
  }

  /** REAL audio decode (`javax.sound.sampled` — WAV/PCM in every JDK):
    * re-derive format facts and per-channel signal stats from the payload
    * bytes alone. Batched per partition like the image codec. RMS values
    * are raw IEEE doubles (sqrt of an exact integer sum of squares);
    * callers wanting cross-engine-stable output round them (q73 rounds to
    * 6 decimals, the repo's decimal-replay idiom).
    */
  def decodeAudioMeta(media: Dataset[MediaRow]): Dataset[AudioMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(it => it.map(decodeAudioMetaOne))
  }

  private def isWav(p: Array[Byte]): Boolean =
    p.length >= 44 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

  /** Fallback features for payloads with no JDK codec: a 256-bin byte
    * histogram folded to `dim` floats — deterministic, order-independent,
    * and shaped exactly like a real embedding batch. Swapping in a richer
    * backend (JNI codec, ONNX runtime, ...) replaces exactly this function.
    */
  private def byteHistogramFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    val hist = new Array[Long](dim)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) % dim) += 1
      i += 1
    }
    val n = math.max(payload.length, 1).toFloat
    hist.map(_ / n)
  }

  /** WAV features from the REAL decode: format + signal stats packed (and
    * zero-padded / truncated) to the fixed `dim` a feature batch needs.
    */
  private def wavFeatures(meta: AudioMeta, dim: Int): Array[Float] = {
    val raw = Array(
      meta.sample_rate.toFloat, meta.n_channels.toFloat, meta.n_frames.toFloat,
      meta.duration_ms.toFloat, meta.rms_ch0.toFloat, meta.peak_ch0.toFloat,
      meta.rms_ch1.getOrElse(0.0).toFloat, meta.peak_ch1.getOrElse(0L).toFloat)
    java.util.Arrays.copyOf(raw, dim)
  }

  /** Batched feature extraction over the opaque payload column. One
    * executor task per partition, payload column read once, metadata
    * carried through — the Scala analogue of a `mapInPandas` batch UDF.
    * WAV payloads (RIFF magic) go through the real `javax.sound.sampled`
    * decode; anything else takes the histogram fallback.
    */
  def decodeFeatures(media: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val feats =
          if (isWav(m.payload))
            wavFeatures(decodeAudioMetaOne(m), dim)
          else byteHistogramFeatures(m.payload, dim)
        MediaFeatures(m.media_id, m.payload.length.toLong, feats)
      }
    }
  }

  /** Single-row decode core shared by [[decodeAudioMeta]] and the
    * [[decodeFeatures]] dispatch.
    */
  private def decodeAudioMetaOne(m: MediaRow): AudioMeta = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(m.payload))
    try {
      val fmt = ais.getFormat
      require(
        fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
        s"media ${m.media_id}: expected little-endian PCM16, got $fmt")
      val nch = fmt.getChannels
      val sr = fmt.getSampleRate.toLong
      val bytes = ais.readAllBytes()
      val nFrames = bytes.length / (2 * nch)
      val sumSq = new Array[Long](nch)
      val peak = new Array[Long](nch)
      var p = 0
      var f = 0
      while (f < nFrames) {
        var c = 0
        while (c < nch) {
          val s = ((bytes(p + 1).toInt << 8) | (bytes(p) & 0xff)).toLong
          sumSq(c) += s * s
          val a = math.abs(s)
          if (a > peak(c)) peak(c) = a
          p += 2; c += 1
        }
        f += 1
      }
      def rms(c: Int): Double =
        if (nFrames == 0) 0.0 else math.sqrt(sumSq(c).toDouble / nFrames)
      AudioMeta(m.media_id, sr, nch.toLong, nFrames.toLong,
        nFrames * 1000.0 / sr, rms(0),
        if (nch > 1) Some(rms(1)) else None,
        peak(0), if (nch > 1) Some(peak(1)) else None)
    } finally ais.close()
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
