package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal
import graft.sources.TableCatalog

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("media table carries byte-exact payloads with typed metadata") {
    val docs = TableCatalog.load(spark, TestSpark.sfDir, "documents")
    val media = Multimodal.asMediaTable(docs, "doc_id", "text", "text/plain")
    val row = media.filter(_.asset_id == 0L).head()
    assert(row.media_type == "text/plain")
    assert(row.n_bytes == row.payload.length)
  }

  test("decode stub is deterministic and partition-shape independent") {
    val docs = TableCatalog.load(spark, TestSpark.sfDir, "documents")
    val media = Multimodal.asMediaTable(docs, "doc_id", "text", "text/plain")
    val f1 = Multimodal.decodeFeatures(media)
      .collect().map(f => f.asset_id -> f.features.toSeq).toMap
    val f2 = Multimodal.decodeFeatures(media, targetPartitions = 7)
      .collect().map(f => f.asset_id -> f.features.toSeq).toMap
    assert(f1 == f2, "features must not depend on partitioning")
    assert(f1.values.forall(_.length == 4))
  }

  test("byte-budget task sizing: partitions track total payload bytes") {
    val docs = TableCatalog.load(spark, TestSpark.sfDir, "documents")
    val media = Multimodal.asMediaTable(docs, "doc_id", "text", "text/plain")
    val total = media.collect().map(_.n_bytes).sum
    val p = Multimodal.partitionsForBytes(media, targetBytesPerPartition = 10000)
    assert(p == ((total + 9999) / 10000).toInt, s"p=$p total=$total")
    assert(Multimodal.partitionsForBytes(media, Long.MaxValue) == 1)
    assert(Multimodal.partitionsForBytes(media, 1, maxPartitions = 64) == 64)
    val sized = Multimodal.decodeFeaturesSized(media, 10000)
      .rdd.getNumPartitions
    assert(sized == p)
    // empty input sizes to one partition instead of NPEing on a null sum
    assert(Multimodal.partitionsForBytes(
      media.filter(_.asset_id < 0), 10000) == 1)
  }

  test("frame sampling emits strided payload chunks, byte-exact") {
    val spark2 = spark
    import spark2.implicits._
    val payload = Array.tabulate(2500)(_.toByte)
    val media = Seq(Multimodal.MediaRow(7L, "video/raw", 2500L, payload))
      .toDS()
    val frames = Multimodal.sampleFrames(media, frameBytes = 1000, stride = 2)
      .collect().sortBy(_.frame_idx)
    // chunks 0,1,2 (1000,1000,500 bytes); stride 2 keeps chunk 0 and 2
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2))
    assert(frames(0).frame.toSeq == payload.slice(0, 1000).toSeq)
    assert(frames(1).frame.toSeq == payload.slice(2000, 2500).toSeq)
  }

  // ---- real javax.imageio decode path --------------------------------

  /** Deterministic synthetic photo-like PNG: smooth gradients + a few
    * rectangles, with optional per-pixel noise and a brightness shift. */
  private def pngBytes(seed: Int, w: Int, h: Int, noise: Int = 0,
                       brighten: Int = 0): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rnd = new scala.util.Random(seed)
    val rects = Array.fill(4)((rnd.nextInt(w), rnd.nextInt(h),
      rnd.nextInt(w / 2) + 4, rnd.nextInt(h / 2) + 4, rnd.nextInt(256)))
    val nrnd = new scala.util.Random(seed * 31 + 7)
    for (y <- 0 until h; x <- 0 until w) {
      var v = (x * 255 / w + y * 128 / h) / 2 + 40
      rects.foreach { case (rx, ry, rw, rh, rv) =>
        if (x >= rx && x < rx + rw && y >= ry && y < ry + rh) v = rv
      }
      if (noise > 0) v += nrnd.nextInt(2 * noise + 1) - noise
      v = math.max(0, math.min(255, v + brighten))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("real PNG decode: true dimensions, sane features, undecodable " +
      "payloads dropped not fatal") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, "image/png", 0L, pngBytes(1, 64, 48)),
      Multimodal.MediaRow(2L, "image/png", 0L, pngBytes(2, 33, 77)),
      Multimodal.MediaRow(3L, "image/png", 0L,
        Array[Byte](1, 2, 3, 4)) // garbage: must be dropped, not fatal
    ).toDS()
    val out = Multimodal.decodeImageFeatures(rows).collect()
      .map(f => f.asset_id -> f).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L).width == 64 && out(1L).height == 48)
    assert(out(2L).width == 33 && out(2L).height == 77)
    out.values.foreach { f =>
      assert(f.features.length == 8)
      assert(f.features.forall(v => v >= 0f && v <= 1f), f.features.toSeq)
      // grayscale synthesis: R, G, B means coincide
      assert(math.abs(f.features(0) - f.features(2)) < 1e-6)
    }
  }

  test("DCT pHash on actually-decoded pixels: invariant to re-scaling, " +
      "robust to noise and brightness, far for distinct images; the " +
      "Hamming-banded dedup join finds exactly the planted pairs") {
    import spark.implicits._
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val base = pngBytes(42, 96, 72)
    val noisy = pngBytes(42, 96, 72, noise = 6)
    val bright = pngBytes(42, 96, 72, brighten = 25)
    val distinct1 = pngBytes(7, 96, 72)
    val distinct2 = pngBytes(9, 96, 72)
    // the same scene re-rendered at a different size ~ a re-encoded copy
    val rescaled = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(base))
      val small = new java.awt.image.BufferedImage(48, 36,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = small.createGraphics()
      g.drawImage(img.getScaledInstance(48, 36,
        java.awt.Image.SCALE_AREA_AVERAGING), 0, 0, null)
      g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(small, "png", bos)
      bos.toByteArray
    }
    val media = Seq(
      Multimodal.MediaRow(1L, "image/png", base.length.toLong, base),
      Multimodal.MediaRow(2L, "image/png", noisy.length.toLong, noisy),
      Multimodal.MediaRow(3L, "image/png", bright.length.toLong, bright),
      Multimodal.MediaRow(4L, "image/png", rescaled.length.toLong, rescaled),
      Multimodal.MediaRow(5L, "image/png", distinct1.length.toLong, distinct1),
      Multimodal.MediaRow(6L, "image/png", distinct2.length.toLong, distinct2)
    ).toDS()
    val sigs = Multimodal.decodeImageSignatures(media)
    val m = sigs.collect().map(s => s.asset_id -> s.phash).toMap
    assert(m.size == 6)
    // near-dups of asset 1 stay within the standard pHash dedup radius
    // (~6 of 64): brightness CLAMPS at 255 inside the bright rectangles
    // and resampling shifts block borders — genuine small structural
    // changes, a few bits each, nowhere near distinct-content distance
    assert(ham(m(1L), m(2L)) <= 6, s"noise ${ham(m(1L), m(2L))}")
    assert(ham(m(1L), m(3L)) <= 6, s"brightness ${ham(m(1L), m(3L))}")
    assert(ham(m(1L), m(4L)) <= 6, s"rescale ${ham(m(1L), m(4L))}")
    // distinct content is far — the byte-stripe stub has NO such property
    // across re-encodes, the pixel-level hash must
    assert(ham(m(1L), m(5L)) >= 16, s"distinct ${ham(m(1L), m(5L))}")
    assert(ham(m(1L), m(6L)) >= 16, s"distinct ${ham(m(1L), m(6L))}")
    assert(ham(m(5L), m(6L)) >= 16, s"distinct ${ham(m(5L), m(6L))}")
    // end-to-end: the q107-shaped banded join over REAL signatures
    val pairs = graft.ops.Dedup.hammingBandPairs(
        sigs.toDF(), "asset_id", "phash", maxHamming = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val dupCluster = Set(1L, 2L, 3L, 4L)
    pairs.foreach { case (a, b) =>
      assert(dupCluster(a) && dupCluster(b), s"false pair ($a,$b)")
    }
    assert(pairs.exists { case (a, b) => Set(a, b) == Set(1L, 2L) } ||
      ham(m(1L), m(2L)) == 0, "noise pair must surface")
  }

  test("resize scales dimensions into the box preserving aspect ratio") {
    val spark2 = spark
    import spark2.implicits._
    val feats = Seq(
      Multimodal.MediaFeatures(1L, "image/x", 10L, 640, 480, Array(0f)),
      Multimodal.MediaFeatures(2L, "image/x", 10L, 100, 50, Array(0f)),
      Multimodal.MediaFeatures(3L, "image/x", 10L, 0, 0, Array(0f)))
      .toDS()
    val out = Multimodal.resizeTo(feats, 320, 320)
      .select("asset_id", "out_width", "out_height")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(out(1L) == ((320, 240)), out(1L).toString)
    assert(out(2L) == ((100, 50)), "already inside the box stays unscaled")
    assert(out(3L) == ((1, 1)), "degenerate dims clamp to 1")
  }

  test("WAV round-trip: javax.sound parse recovers the exact int16 " +
      "samples and sample rate") {
    val samples = Array(0, 12000, -12000, 32767, -32768, 1, -1)
    val bytes = Multimodal.wavBytes(samples, 8000)
    val Some((sr, parsed)) = Multimodal.readWav(bytes)
    assert(sr == 8000)
    assert(parsed.toSeq == samples.toSeq)
  }

  test("decodeWavFrames: hand-computed RMS and zero-crossing rate, " +
      "partial last frame kept, corrupt payload drops") {
    import spark.implicits._
    val good = Multimodal.MediaRow(1L, "audio/wav", 0L,
      Multimodal.wavBytes(Array(3, -3, 3, -3, 0, 0), 8000))
    val bad = Multimodal.MediaRow(2L, "audio/wav", 0L,
      Array.tabulate[Byte](64)(i => (i * 37).toByte))
    val out = Multimodal
      .decodeWavFrames(Seq(good, bad).toDS(), frameSamples = 3)
      .collect().sortBy(_.frame_idx)
    assert(out.forall(_.asset_id == 1L), "corrupt payload must drop")
    assert(out.length == 2)
    // frame 0 = [3,-3,3]: rms 3.0, both adjacent pairs flip sign
    assert(out(0).n == 3 && out(0).rms == 3.0 && out(0).zcr == 1.0,
      out(0).toString)
    // frame 1 = [-3,0,0]: rms sqrt(3), one flip (zero counts non-negative)
    assert(out(1).n == 3 && out(1).rms == 1.732051 && out(1).zcr == 0.5,
      out(1).toString)
  }

  test("triangle fixture: full-period frames are symmetric (zcr 2/p " +
      "scaled) and decode ≡ closed form") {
    val p = 40L
    val synth = (0L until 80L).map(i =>
      Multimodal.triangleSample(i, p, 12000L))
    // one full period spans exactly [-amp, amp]: the peak lands at
    // m = p/2 (3A - 2A = A), the trough at m = 0
    assert(synth.max == 12000L, s"peak must hit +amp: ${synth.max}")
    assert(synth.min == -12000L, s"trough must hit -amp: ${synth.min}")
    val flips = synth.sliding(2).count(w => (w(0) >= 0) != (w(1) >= 0))
    assert(flips == 4, s"two crossings per period over 2 periods: $flips")
  }

  test("decodeWavFrames: a 1-sample partial last frame reports zcr 0, " +
      "not NaN") {
    import spark.implicits._
    // 513 samples at frame 512 leaves a single-sample tail
    val row = Multimodal.MediaRow(1L, "audio/wav", 0L,
      Multimodal.wavBytes(Array.fill(513)(100), 8000))
    val out = Multimodal.decodeWavFrames(Seq(row).toDS(), frameSamples = 512)
      .collect().sortBy(_.frame_idx)
    assert(out.length == 2)
    assert(out(1).n == 1 && out(1).zcr == 0.0 && out(1).rms == 100.0,
      out(1).toString)
  }
  test("bmpBytes -> ImageIO round-trip is pixel-exact, including padded " +
      "rows, bottom-up order and BGR byte order") {
    // w=10: 3w=30 bytes/row pads to 32 — the padding path must not
    // shift later rows
    val bytes = Multimodal.bmpBytes(10, 8,
      (x, y) => (x * 20, y * 30, (x + y) * 7))
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth == 10 && img.getHeight == 8)
    for (y <- 0 until 8; x <- 0 until 10) {
      val p = img.getRGB(x, y)
      assert(((p >> 16) & 0xff) == x * 20, s"R($x,$y)")
      assert(((p >> 8) & 0xff) == y * 30, s"G($x,$y)")
      assert((p & 0xff) == (x + y) * 7, s"B($x,$y)")
    }
  }

  test("decodeBmpStats: real decode matches a hand-computed tiny image; " +
      "undecodable payloads drop") {
    import spark.implicits._
    val good = Multimodal.bmpBytes(4, 2, (x, y) => (x, 10 + y, 100))
    val rows = Seq(
      Multimodal.MediaRow(1L, "image/bmp", good.length.toLong, good),
      Multimodal.MediaRow(2L, "image/bmp", 3L, Array[Byte](1, 2, 3)))
    val out = Multimodal.decodeBmpStats(rows.toDS()).collect()
    assert(out.length == 1 && out.head.asset_id == 1L)
    val st = out.head
    // r: x in 0..3 twice -> sum 12, min 0, max 3; g: 10,11 x4 -> 84
    assert(st.r_sum == 12 && st.r_min == 0 && st.r_max == 3)
    assert(st.g_sum == 84 && st.g_min == 10 && st.g_max == 11)
    assert(st.b_sum == 800 && st.b_min == 100 && st.b_max == 100)
    assert(st.luma_sum == 299L * 12 + 587L * 84 + 114L * 800)
  }

  test("decodeBlockHash: hand-computed bits on a half-dark image; " +
      "uniform brightness shift leaves the hash identical") {
    import spark.implicits._
    // 8x8 image (1x1 blocks): left half luma 0, right half bright ->
    // bits set exactly where x >= 4 (block sum*64 > total iff bright)
    val half = Multimodal.bmpBytes(8, 8,
      (x, _) => if (x < 4) (0, 0, 0) else (100, 100, 100))
    val out = Multimodal.decodeBlockHash(Seq(
      Multimodal.MediaRow(1L, "image/bmp", half.length.toLong, half))
      .toDS()).collect().head
    val expected = (0 until 64).filter(k => k % 8 >= 4)
    val gotBits = (0 until 64).filter { k =>
      val v = if (k >= 32) out.bits_hi >> (k - 32) else out.bits_lo >> k
      (v & 1L) == 1L
    }
    assert(gotBits == expected, s"$gotBits")
    // invariance on the synthetic gradient corpus: +40 shift, same hash
    val ids = spark.range(0, 30).select(col("id"))
      .as[java.lang.Long]
    val base = Multimodal.decodeBlockHash(Multimodal.synthBmpTable(ids))
      .collect().map(b => b.asset_id -> (b.bits_hi, b.bits_lo)).toMap
    val shifted = Multimodal.decodeBlockHash(
        Multimodal.synthBmpTable(ids, shift = 40))
      .collect().map(b => b.asset_id -> (b.bits_hi, b.bits_lo)).toMap
    assert(base == shifted, "blockhash must be brightness-shift invariant")
    assert(base.values.toSet.size > 1, "fixture must vary across assets")
    // non-multiple-of-8 dimensions are out of contract and must DROP,
    // not mis-hash
    val odd = Multimodal.bmpBytes(10, 8, (x, y) => (x, y, 0))
    assert(Multimodal.decodeBlockHash(Seq(
      Multimodal.MediaRow(9L, "image/bmp", odd.length.toLong, odd))
      .toDS()).isEmpty)
  }
}
