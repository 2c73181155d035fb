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
}
