package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{MediaRow, Multimodal}

/** Binary-column pipeline invariants: determinism, partition-count
  * invariance, and frame-reconstruction round-trip.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixture: Seq[MediaRow] = (0L until 20L).map { i =>
    MediaRow(i, if (i % 2 == 0) "image" else "video", 64, 48,
      Array.tabulate(((i + 1) * 7).toInt)(j => ((i * 31 + j) % 251).toByte))
  }

  test("feature extraction is deterministic and partition-count invariant") {
    val ds1 = fixture.toDS().repartition(1)
    val ds7 = fixture.toDS().repartition(7)
    val f1 = Multimodal.decodeFeatures(ds1).collect().sortBy(_.media_id)
    val f7 = Multimodal.decodeFeatures(ds7).collect().sortBy(_.media_id)
    assert(f1.length == 20)
    assert(f1.map(_.features.toSeq).toSeq == f7.map(_.features.toSeq).toSeq)
    // histogram fractions sum to ~1 and have the requested dimension
    f1.foreach { f =>
      assert(f.features.length == 8)
      assert(math.abs(f.features.map(_.toDouble).sum - 1.0) < 1e-6)
    }
  }

  test("frame sampling with stride 1 reconstructs the payload prefix") {
    val ds = fixture.toDS()
    val frames = Multimodal.sampleFrames(ds, frameSize = 16, stride = 1)
      .collect().groupBy(_.media_id)
    fixture.foreach { m =>
      val nFrames = m.payload.length / 16
      val got = frames.getOrElse(m.media_id, Array.empty)
      assert(got.length == nFrames, s"media ${m.media_id}")
      val rebuilt = got.sortBy(_.frame_idx).flatMap(_.frame_bytes)
      assert(rebuilt.toSeq == m.payload.take(nFrames * 16).toSeq)
    }
  }

  test("metadata-only queries never touch the payload column (pruned scan)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toString
    fixture.toDS().write.mode("overwrite").parquet(dir)
    val meta = spark.read.parquet(dir).select("media_id", "kind", "width", "height")
    val plan = meta.queryExecution.executedPlan.toString
    assert(!plan.contains("payload"), s"payload not pruned:\n$plan")
    assert(meta.count() == 20)
  }

  test("png encode → decode recovers exact dimensions, channels, and fill color") {
    val rows = Seq(3L, 17L, 254L).map { id =>
      MediaRow(id, "image", (id % 64 + 16).toInt, (id % 48 + 16).toInt,
        Multimodal.encodePng((id % 64 + 16).toInt, (id % 48 + 16).toInt,
          (id % 256).toInt, ((id * 7 + 31) % 256).toInt, ((id * 13 + 7) % 256).toInt))
    }
    val got = Multimodal.decodeImageMeta(rows.toDS()).collect().sortBy(_.media_id)
    got.zip(rows.sortBy(_.media_id)).foreach { case (m, src) =>
      assert(m.dec_width == src.width && m.dec_height == src.height)
      assert(m.n_channels == 3)
      assert(m.mean_r == src.media_id % 256)
      assert(m.mean_g == (src.media_id * 7 + 31) % 256)
      assert(m.mean_b == (src.media_id * 13 + 7) % 256)
    }
  }

  test("real resize re-encodes at the target dimensions, preserving a constant fill") {
    val src = Seq(MediaRow(1L, "image", 40, 30,
      Multimodal.encodePng(40, 30, 120, 7, 200))).toDS()
    val out = Multimodal.decodeImageMeta(Multimodal.resizeImage(src, 8, 8))
      .collect()(0)
    assert(out.dec_width == 8 && out.dec_height == 8)
    // bilinear interpolation of a constant image is the same constant
    assert(out.mean_r == 120 && out.mean_g == 7 && out.mean_b == 200)
  }

  test("golden WAV: decode recovers the exact hand-computed header facts and signal stats") {
    // 3 frames, stereo, 8 kHz — small enough that every decoded number is
    // hand-checkable: ch0 = [100, -200, 300], ch1 = [-32768, 0, 32767]
    val ch0 = Array[Short](100, -200, 300)
    val ch1 = Array[Short](-32768, 0, 32767)
    val wav = Multimodal.encodeWavPcm16(8000, Array(ch0, ch1))
    val m = Multimodal.decodeAudioMeta(
      Seq(MediaRow(9L, "audio", 8000, 3, wav)).toDS()).collect()(0)
    assert(m.sample_rate == 8000 && m.n_channels == 2 && m.n_frames == 3)
    assert(math.abs(m.duration_ms - 3 * 1000.0 / 8000) < 1e-12)
    assert(math.abs(m.rms_ch0 - math.sqrt((100.0 * 100 + 200 * 200 + 300 * 300) / 3)) < 1e-12)
    assert(math.abs(m.rms_ch1.get - math.sqrt((32768.0 * 32768 + 32767.0 * 32767) / 3)) < 1e-12)
    assert(m.peak_ch0 == 300 && m.peak_ch1.contains(32768L))
  }

  test("hand-rolled WAV header parses identically to the JDK's own WAV writer") {
    // same samples through javax.sound.sampled's AudioSystem.write — if the
    // JDK codec reads both to the same AudioMeta, our 44-byte canonical
    // header is a well-formed WAV, not just self-consistent
    val nFrames = 64
    val samples = Array.tabulate(2, nFrames)((c, i) => Multimodal.synthSample(5L, c, i))
    val ours = Multimodal.encodeWavPcm16(12000, samples)
    val fmt = new javax.sound.sampled.AudioFormat(12000f, 16, 2, true, false)
    val pcm = java.nio.ByteBuffer.allocate(nFrames * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until nFrames).foreach { i =>
      pcm.putShort(samples(0)(i)); pcm.putShort(samples(1)(i))
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm.array()), fmt, nFrames.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val theirs = bos.toByteArray
    val both = Seq(MediaRow(1L, "audio", 12000, nFrames, ours),
      MediaRow(2L, "audio", 12000, nFrames, theirs)).toDS()
    val decoded = Multimodal.decodeAudioMeta(both).collect().sortBy(_.media_id)
    assert(decoded.length == 2)
    val (a, b) = (decoded(0), decoded(1))
    assert(a.sample_rate == b.sample_rate && a.n_channels == b.n_channels &&
      a.n_frames == b.n_frames && a.rms_ch0 == b.rms_ch0 &&
      a.rms_ch1 == b.rms_ch1 && a.peak_ch0 == b.peak_ch0 && a.peak_ch1 == b.peak_ch1)
    assert(a.n_frames == nFrames && a.sample_rate == 12000 && a.n_channels == 2)
  }

  test("synthesizeWavs → decodeAudioMeta matches direct arithmetic over the generator") {
    val docs = (0L until 12L).toDF("doc_id")
    val got = Multimodal.decodeAudioMeta(Multimodal.synthesizeWavs(docs))
      .collect().sortBy(_.media_id)
    assert(got.length == 12)
    got.foreach { m =>
      val id = m.media_id
      val nch = (id % 2 + 1).toInt
      val sr = Array(8000, 12000, 16000)((id % 3).toInt)
      val nf = (256 + id % 257).toInt
      assert(m.sample_rate == sr && m.n_channels == nch && m.n_frames == nf, s"id=$id")
      (0 until nch).foreach { c =>
        val ss = (0 until nf).map { i =>
          val s = Multimodal.synthSample(id, c, i).toLong; s * s
        }.sum
        val pk = (0 until nf).map(i => math.abs(Multimodal.synthSample(id, c, i).toLong)).max
        val rms = math.sqrt(ss.toDouble / nf)
        if (c == 0) { assert(m.rms_ch0 == rms && m.peak_ch0 == pk, s"id=$id ch0") }
        else { assert(m.rms_ch1.contains(rms) && m.peak_ch1.contains(pk), s"id=$id ch1") }
      }
    }
  }

  test("decodeFeatures dispatches WAV payloads to the real audio decode") {
    val wav = MediaRow(1L, "audio", 8000, 4,
      Multimodal.encodeWavPcm16(8000, Array(Array[Short](1, -2, 3, -4))))
    val txt = MediaRow(2L, "image", 0, 0, "not a wav".getBytes("UTF-8"))
    val f = Multimodal.decodeFeatures(Seq(wav, txt).toDS()).collect().sortBy(_.media_id)
    // WAV row: [sr, nch, frames, duration, rms0, peak0, rms1, peak1]
    assert(f(0).features(0) == 8000f && f(0).features(1) == 1f && f(0).features(2) == 4f)
    assert(f(0).features(5) == 4f) // peak of |{1,-2,3,-4}|
    // non-WAV row: histogram fractions still sum to ~1
    assert(math.abs(f(1).features.map(_.toDouble).sum - 1.0) < 1e-6)
  }
}
