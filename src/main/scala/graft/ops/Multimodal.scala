package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, processed per-partition in batches.
  *
  * The decode step itself is STUBBED — this container has no image/audio
  * codecs — with a deterministic fake featurizer, but everything Spark-side
  * is real and load-bearing: the binary schema, the typed Dataset boundary,
  * the mapPartitions batch shape (one decoder init per partition, then
  * streaming over rows — exactly how a JNI/FFmpeg/PIL decoder is amortized
  * on executors), and partition sizing before the expensive stage.
  */
object Multimodal {

  /** One media asset: opaque bytes + typed metadata. */
  case class MediaRow(asset_id: Long, media_type: String, n_bytes: Long,
                      payload: Array[Byte])

  /** Stub decode output: fixed-width feature vector + dimensions a real
    * decoder would emit. */
  case class MediaFeatures(asset_id: Long, media_type: String, n_bytes: Long,
                           width: Int, height: Int, features: Array[Float])

  /** Wrap any table with a string column as a binary media table — the
    * ingest shape an image/audio corpus arrives in (payload bytes + type
    * tag + size). */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String,
                   mediaType: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        col(idCol).cast("long").as("asset_id"),
        lit(mediaType).as("media_type"),
        octet_length(col(payloadCol)).cast("long").as("n_bytes"),
        col(payloadCol).cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** STUB for the real decoder: deterministic pseudo-features from the
    * payload bytes (FNV-1a over 4 byte-stripes), plus fake dimensions.
    * A real implementation replaces only the body of `decodeOne`; the
    * partition-batched execution shape around it stays. */
  private def decodeOne(row: MediaRow): MediaFeatures = {
    val stripes = new Array[Float](4)
    var i = 0
    val fnv = Array.fill(4)(0xcbf29ce484222325L)
    while (i < row.payload.length) {
      val s = i % 4
      fnv(s) = (fnv(s) ^ (row.payload(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    var s = 0
    while (s < 4) { stripes(s) = (fnv(s) >>> 40).toFloat / (1 << 24); s += 1 }
    MediaFeatures(row.asset_id, row.media_type, row.n_bytes,
      width = (row.n_bytes % 640).toInt, height = (row.n_bytes % 480).toInt,
      features = stripes)
  }

  /** Partition-batched decode: mapPartitions so per-partition setup (codec
    * init, model load) happens once per task, not per row — the pattern that
    * makes expensive decode viable on a 1000-executor cluster. Repartition
    * first so each task holds a bounded byte volume. */
  def decodeFeatures(media: Dataset[MediaRow],
                     targetPartitions: Int = 0): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val sized =
      if (targetPartitions > 0) media.repartition(targetPartitions) else media
    sized.mapPartitions { rows =>
      // real impl: val codec = Codec.open() — once per partition
      rows.map(decodeOne)
    }
  }

  /** One sampled frame of a media asset: payload slice + frame index. */
  case class MediaFrame(asset_id: Long, frame_idx: Int, n_bytes: Long,
                        frame: Array[Byte])

  /** Frame sampling: emit every `stride`-th fixed-size chunk of the
    * payload as a "frame" (STUB for a container-aware demuxer — a real
    * implementation replaces the chunking with codec frame extraction;
    * the Spark shape stays: one fan-out iterator per partition, bounded
    * memory per row, no full-payload buffering of the output). */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 1024,
                   stride: Int = 10): Dataset[MediaFrame] = {
    require(frameBytes > 0 && stride > 0, "frameBytes and stride positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        // a null payload yields zero frames (like an empty one) instead of
        // failing the whole stage for one bad row
        val len = if (r.payload == null) 0 else r.payload.length
        val nFrames =
          ((len + frameBytes - 1) / frameBytes + stride - 1) / stride
        (0 until nFrames).iterator.map { i =>
          val start = i * stride * frameBytes
          val end = math.min(start + frameBytes, r.payload.length)
          MediaFrame(r.asset_id, i * stride, (end - start).toLong,
            java.util.Arrays.copyOfRange(r.payload, start, end))
        }
      }
    }
  }

  /** Resize metadata transform: scales the decoder's emitted dimensions to
    * fit a bounding box preserving aspect ratio (the real image op would
    * also transform pixels; the dimension math and column contract are the
    * load-bearing Spark side). Pure projection — no UDF. */
  def resizeTo(features: Dataset[MediaFeatures], maxW: Int,
               maxH: Int): DataFrame = {
    require(maxW > 0 && maxH > 0, "bounding box must be positive")
    val scale = least(
      lit(maxW).cast("double") / greatest(col("width"), lit(1)),
      lit(maxH).cast("double") / greatest(col("height"), lit(1)),
      lit(1.0))
    // round, not floor: the binding dimension's ratio is rarely exactly
    // representable in binary and floor would undersize it by one pixel
    features.toDF()
      .withColumn("out_width",
        greatest(round(col("width") * scale).cast("int"), lit(1)))
      .withColumn("out_height",
        greatest(round(col("height") * scale).cast("int"), lit(1)))
  }

  /** Partition count for a byte budget: total payload bytes / target,
    * clamped to [1, maxPartitions]. Media rows are wildly non-uniform
    * (a 4 KB thumbnail vs a 2 GB video), so sizing tasks by ROW count
    * starves some executors and OOMs others; sizing by BYTES bounds each
    * task's decode memory. The byte total comes from the n_bytes metadata
    * column — a cheap narrow aggregate, no payload scan. */
  def partitionsForBytes(media: Dataset[MediaRow],
                         targetBytesPerPartition: Long,
                         maxPartitions: Int = 100000): Int = {
    require(targetBytesPerPartition > 0, "target bytes must be positive")
    // sum over zero rows is null — an empty dataset sizes to one partition
    val row = media.agg(org.apache.spark.sql.functions.sum("n_bytes")).head
    val total = if (row.isNullAt(0)) 0L else row.getLong(0)
    val p = (total + targetBytesPerPartition - 1) / targetBytesPerPartition
    math.min(math.max(p, 1L), maxPartitions.toLong).toInt
  }

  /** Decode with byte-budget task sizing: repartition so each task decodes
    * about `targetBytesPerPartition` of payload, then run the batched
    * decode. */
  def decodeFeaturesSized(media: Dataset[MediaRow],
                          targetBytesPerPartition: Long): Dataset[MediaFeatures] =
    decodeFeatures(media,
      partitionsForBytes(media, targetBytesPerPartition))

  // ------------------------------------------------------------------
  // REAL image decode path (pure-JVM javax.imageio — PNG/JPEG/BMP/GIF).
  // The stub decoders above stay for payloads with no container codec;
  // these run on actual pixels, same partition-batched execution shape.
  // ------------------------------------------------------------------

  /** Decode real image bytes with javax.imageio: true width/height plus
    * an 8-float feature head (mean R, G, B, global luma, quadrant lumas)
    * — the shape a real embedding model's preprocessing emits. Rows
    * whose payload no codec accepts are DROPPED (flatMap), the standard
    * ingest posture for a web-scale media corpus where a fraction of
    * blobs is always truncated or mislabeled; count in vs out to audit.
    * ImageIO is initialized per JVM, re-used across the partition — the
    * same once-per-task amortization as [[decodeFeatures]]. */
  def decodeImageFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        readImage(r.payload).map { img =>
          val w = img.getWidth; val h = img.getHeight
          var sr = 0.0; var sg = 0.0; var sb = 0.0
          val quad = new Array[Double](4)
          val quadN = new Array[Long](4)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              val red = (p >> 16) & 0xff
              val green = (p >> 8) & 0xff
              val blue = p & 0xff
              sr += red; sg += green; sb += blue
              val luma = 0.299 * red + 0.587 * green + 0.114 * blue
              val q = (if (y * 2 >= h) 2 else 0) + (if (x * 2 >= w) 1 else 0)
              quad(q) += luma; quadN(q) += 1
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          MediaFeatures(r.asset_id, r.media_type, r.n_bytes, w, h,
            Array((sr / n / 255.0).toFloat, (sg / n / 255.0).toFloat,
              (sb / n / 255.0).toFloat,
              ((0.299 * sr + 0.587 * sg + 0.114 * sb) / n / 255.0).toFloat,
              (quad(0) / math.max(quadN(0), 1) / 255.0).toFloat,
              (quad(1) / math.max(quadN(1), 1) / 255.0).toFloat,
              (quad(2) / math.max(quadN(2), 1) / 255.0).toFloat,
              (quad(3) / math.max(quadN(3), 1) / 255.0).toFloat))
        }
      }
    }
  }

  /** The REAL DCT perceptual hash (pHash; Zauner, "Implementation and
    * Benchmarking of Perceptual Image Hash Functions", 2010 — public
    * method) over actually-decoded pixels: grayscale → 32×32 box-average
    * resize → 2-D DCT-II → the low-frequency 8×8 block (DC dropped) →
    * bit b = coefficient > median. Robust to re-encoding, scaling and
    * small noise — the properties the byte-stripe stub documents it
    * lacks. Undecodable payloads are dropped, as in
    * [[decodeImageFeatures]]. */
  def decodeImageSignatures(media: Dataset[MediaRow]): Dataset[MediaSignature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap(r => readImage(r.payload)
        .map(img => MediaSignature(r.asset_id, r.n_bytes, dctPhash(img))))
    }
  }

  private def readImage(payload: Array[Byte])
      : Option[java.awt.image.BufferedImage] =
    if (payload == null || payload.isEmpty) None
    else try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload)))
    catch { case _: java.io.IOException => None }

  /** 32×32 box-average grayscale resize + 2-D DCT-II + 8×8 low-frequency
    * median threshold — the published pHash recipe on real pixels. */
  private[graft] def dctPhash(img: java.awt.image.BufferedImage): Long = {
    val N = 32
    val w = img.getWidth; val h = img.getHeight
    val gray = Array.ofDim[Double](N, N)
    var ty = 0
    while (ty < N) {
      val y0 = ty * h / N; val y1 = math.max((ty + 1) * h / N, y0 + 1)
      var tx = 0
      while (tx < N) {
        val x0 = tx * w / N; val x1 = math.max((tx + 1) * w / N, x0 + 1)
        var s = 0.0; var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            val p = img.getRGB(x, y)
            s += 0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) +
              0.114 * (p & 0xff)
            x += 1
          }
          y += 1
        }
        gray(ty)(tx) = s / ((math.min(y1, h) - y0).max(1) *
          (math.min(x1, w) - x0).max(1))
        tx += 1
      }
      ty += 1
    }
    // separable DCT-II: rows then columns (cos table built once per call;
    // a partition-wide decoder would hoist it, the cost is negligible
    // beside getRGB)
    val cos = Array.tabulate(N, N)((k, n) =>
      math.cos(math.Pi / N * (n + 0.5) * k))
    val tmp = Array.ofDim[Double](N, N)
    var k = 0
    while (k < N) {
      var y = 0
      while (y < N) {
        var s = 0.0; var n = 0
        while (n < N) { s += gray(y)(n) * cos(k)(n); n += 1 }
        tmp(y)(k) = s
        y += 1
      }
      k += 1
    }
    val dct = Array.ofDim[Double](N, N)
    var kx = 0
    while (kx < N) {
      var ky = 0
      while (ky < N) {
        var s = 0.0; var n = 0
        while (n < N) { s += tmp(n)(kx) * cos(ky)(n); n += 1 }
        dct(ky)(kx) = s
        ky += 1
      }
      kx += 1
    }
    // low-frequency 8×8 block, DC coefficient dropped from the median
    val coefs = for (y <- 0 until 8; x <- 0 until 8 if x != 0 || y != 0)
      yield dct(y)(x)
    val sorted = coefs.sorted
    val median = sorted(31) // 63 coefficients -> exact middle
    var sig = 0L
    var b = 0
    for (y <- 0 until 8; x <- 0 until 8; if x != 0 || y != 0) {
      if (dct(y)(x) > median) sig |= 1L << b
      b += 1
    }
    sig
  }

  /** One asset's 64-bit perceptual signature. */
  case class MediaSignature(asset_id: Long, n_bytes: Long, phash: Long)

  // ------------------------------------------------------------------
  // REAL audio decode path (javax.sound.sampled — RIFF/WAV PCM parses
  // pure-JVM, no codec or audio device needed). Same partition-batched
  // shape; frame-level features are what an audio-quality filter or a
  // speech-segment miner consumes.
  // ------------------------------------------------------------------

  /** One frame of decoded audio: exact sample count, RMS level and
    * zero-crossing rate (the cheap voicing/noise discriminators). */
  case class AudioFrame(asset_id: Long, frame_idx: Long, sample_rate: Long,
                        n: Long, rms: Double, zcr: Double)

  /** 16-bit mono PCM WAV bytes for an integer sample array — the RIFF
    * container a real ingest delivers; used by the synthetic fixture and
    * the specs (all-integer samples, so the decode round-trip is exact). */
  private[graft] def wavBytes(samples: Array[Int], sampleRate: Int)
      : Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16) // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => bb.putShort(s.toShort))
    bb.array()
  }

  /** The synthetic fixture waveform: an ALL-INTEGER triangle wave (period
    * `p`, amplitude `amp`) — deliberately trig-free so a SQL oracle can
    * replay every sample exactly (platform sin() is only 1-ulp-accurate
    * and a round() on 12000·sin could flip on the boundary; integer
    * division cannot). */
  private[graft] def triangleSample(i: Long, p: Long, amp: Long): Long = {
    val m = i % p
    if (m < p / 2) (m * 4 * amp) / p - amp
    else 3 * amp - (m * 4 * amp) / p
  }

  /** A deterministic synthetic WAV corpus keyed by asset id: period
    * 40 + (id mod 20)·8 samples at `sr` Hz — 20 distinct pitches. Stands
    * in for an ingest bucket the container has no real audio for; the
    * DECODE side below is the real, reusable component. */
  def synthWavTable(ids: Dataset[java.lang.Long], sr: Int = 8000,
                    nSamples: Int = 2000, amp: Int = 12000)
      : Dataset[MediaRow] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.map { idBoxed =>
      val id = idBoxed.longValue()
      val p = 40L + (id % 20) * 8
      val samples = Array.tabulate(nSamples)(i =>
        triangleSample(i.toLong, p, amp.toLong).toInt)
      val bytes = wavBytes(samples, sr)
      MediaRow(id, "audio/wav", bytes.length.toLong, bytes)
    }
  }

  /** Parse real WAV bytes via javax.sound.sampled into int samples
    * (first channel). None for payloads no parser accepts — dropped
    * upstream like undecodable images. */
  private[graft] def readWav(payload: Array[Byte])
      : Option[(Int, Array[Int])] =
    if (payload == null || payload.isEmpty) None
    else try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val f = ais.getFormat
      if (f.getSampleSizeInBits != 16 ||
        f.getEncoding !=
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) None
      else {
        val raw = ais.readAllBytes()
        val ch = f.getChannels
        val frame = 2 * ch
        val n = raw.length / frame
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          val lo = raw(i * frame) & 0xff
          val hi = raw(i * frame + 1)
          out(i) =
            if (f.isBigEndian) ((lo << 8) | (hi & 0xff)).toShort.toInt
            else ((hi << 8) | lo).toShort.toInt
          i += 1
        }
        Some((f.getSampleRate.toInt, out))
      }
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** REAL audio decode + frame features: parse the WAV container, cut
    * the sample stream into `frameSamples`-sample frames (last partial
    * frame kept with its true length), and emit per-frame RMS and
    * zero-crossing rate. Sums of squares stay in exact longs (16-bit
    * samples: |s| ≤ 32768 ⇒ Σs² < 2⁶³ for any frame under 2³² samples);
    * the only floating point is the final sqrt/divide, so features are
    * bit-reproducible — and SQL-replayable when the samples are known.
    * Zero-crossing counts sign flips between CONSECUTIVE samples within
    * the frame, zero counted as non-negative. Undecodable payloads are
    * dropped (the web-corpus ingest posture). Same partition-batched
    * execution shape as the image path. */
  def decodeWavFrames(media: Dataset[MediaRow],
                      frameSamples: Int = 512): Dataset[AudioFrame] = {
    require(frameSamples >= 2, s"frameSamples must be >= 2: $frameSamples")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        readWav(r.payload).iterator.flatMap { case (sr, samples) =>
          samples.grouped(frameSamples).zipWithIndex.map {
            case (fr, idx) =>
              var ss = 0L
              var zc = 0L
              var i = 0
              while (i < fr.length) {
                ss += fr(i).toLong * fr(i)
                if (i > 0 && ((fr(i - 1) >= 0) != (fr(i) >= 0))) zc += 1
                i += 1
              }
              val n = fr.length
              // a 1-sample partial last frame has zero adjacent pairs:
              // zcr is 0, not 0/0 (BigDecimal(NaN) would throw and fail
              // the whole task on any length ≡ 1 mod frameSamples)
              val zcr = if (n > 1) zc.toDouble / (n - 1) else 0.0
              AudioFrame(r.asset_id, idx.toLong, sr.toLong, n.toLong,
                BigDecimal(math.sqrt(ss.toDouble / n))
                  .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
                BigDecimal(zcr)
                  .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
          }
        }
      }
    }
  }

  // ------------------------------------------------------------------
  // REAL image decode under the oracle gate (q234–q236) — the visual
  // twin of the WAV path above: a deterministic synthetic BMP corpus
  // (closed-form integer gradient patterns keyed by asset id) goes
  // through the genuine javax.imageio BMP parser, and every emitted
  // feature is all-integer, so a SQL oracle replays the container
  // parse + pixel walk bit-for-bit. The DCT pHash path
  // ([[decodeImageSignatures]]) stays for real-world robustness; the
  // blockhash below is its oracle-checkable integer sibling
  // (blockhash.io's published mean-threshold method).
  // ------------------------------------------------------------------

  /** 24-bit uncompressed BMP bytes (BITMAPINFOHEADER, bottom-up rows,
    * 4-byte row padding) for a pixel function (x, y) → (r, g, b) with
    * (0,0) the TOP-left of the decoded image. */
  private[graft] def bmpBytes(w: Int, h: Int,
                              px: (Int, Int) => (Int, Int, Int))
      : Array[Byte] = {
    val rowSize = (w * 3 + 3) / 4 * 4
    val dataLen = rowSize * h
    val bb = java.nio.ByteBuffer.allocate(54 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
      .putInt(54 + dataLen).putInt(0).putInt(54)
      .putInt(40).putInt(w).putInt(h) // positive height = bottom-up
      .putShort(1).putShort(24).putInt(0).putInt(dataLen)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var row = h - 1 // write bottom-up so decoded (x,y) matches px(x,y)
    while (row >= 0) {
      var x = 0
      while (x < w) {
        val (r, g, b) = px(x, row)
        bb.put(b.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var pad = rowSize - w * 3
      while (pad > 0) { bb.put(0.toByte); pad -= 1 }
      row -= 1
    }
    bb.array()
  }

  /** The synthetic fixture pattern: channel `ch` of asset `id` at (x,y)
    * is (a·x + b·y + c) mod 180 with all-integer params from the id —
    * mod 180 caps values at 179, leaving +40 brightness-shift headroom
    * with no 8-bit wrap (q236's invariance plant needs it). Trig-free
    * for the same reason the WAV fixture is ([[triangleSample]]): a SQL
    * oracle replays every pixel exactly. */
  private[graft] def gradPixel(id: Long, ch: Int, x: Int, y: Int): Int =
    (((1 + (id + ch) % 7) * x + (1 + (id * 3 + ch) % 5) * y +
      (id * 7 + ch * 31) % 97) % 180).toInt

  /** A deterministic synthetic BMP corpus keyed by asset id; `shift`
    * adds a uniform brightness offset (used by q236's planted copies —
    * values stay < 256 by the mod-180 headroom). */
  def synthBmpTable(ids: Dataset[java.lang.Long], w: Int = 32, h: Int = 32,
                    shift: Int = 0): Dataset[MediaRow] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.map { idBoxed =>
      val id = idBoxed.longValue()
      val bytes = bmpBytes(w, h, (x, y) =>
        (gradPixel(id, 0, x, y) + shift, gradPixel(id, 1, x, y) + shift,
          gradPixel(id, 2, x, y) + shift))
      MediaRow(id, "image/bmp", bytes.length.toLong, bytes)
    }
  }

  /** Per-image integer channel statistics off REAL decoded pixels. */
  case class ImageStats(asset_id: Long, width: Int, height: Int,
                        r_sum: Long, g_sum: Long, b_sum: Long,
                        r_min: Long, r_max: Long, g_min: Long,
                        g_max: Long, b_min: Long, b_max: Long,
                        luma_sum: Long)

  /** REAL image decode + integer stats: the genuine javax.imageio
    * parse (container header, bottom-up row order, BGR byte order,
    * row padding — the components under test), then an exact integer
    * pixel walk: per-channel sum/min/max and the Σ(299r+587g+114b)
    * integer luma sum. No floating point anywhere, so a SQL oracle
    * replays the decode bit-for-bit when the pixels are known.
    * Undecodable payloads drop ([[decodeImageFeatures]]'s posture);
    * same partition-batched execution shape. */
  def decodeBmpStats(media: Dataset[MediaRow]): Dataset[ImageStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        readImage(r.payload).map { img =>
          val w = img.getWidth; val h = img.getHeight
          val sums = new Array[Long](3)
          val mins = Array.fill(3)(255L)
          val maxs = new Array[Long](3)
          var luma = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              val c = Array((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
              var i = 0
              while (i < 3) {
                sums(i) += c(i)
                if (c(i) < mins(i)) mins(i) = c(i)
                if (c(i) > maxs(i)) maxs(i) = c(i)
                i += 1
              }
              luma += 299L * c(0) + 587L * c(1) + 114L * c(2)
              x += 1
            }
            y += 1
          }
          ImageStats(r.asset_id, w, h, sums(0), sums(1), sums(2),
            mins(0), maxs(0), mins(1), maxs(1), mins(2), maxs(2), luma)
        }
      }
    }
  }

  /** One asset's 64-bit blockhash, split into two non-negative 32-bit
    * halves so an oracle compares them without signed-overflow games. */
  case class BlockHash(asset_id: Long, n_bytes: Long, bits_hi: Long,
                       bits_lo: Long)

  /** Integer blockhash (blockhash.io's mean-threshold method) on REAL
    * decoded pixels: 8×8 pixel blocks, bit k = (block luma sum × 64 >
    * total luma sum) with k = (y/bh)·8 + (x/bw) — the comparison stays
    * in exact integers (luma = 299r+587g+114b, never divided), so the
    * hash is bit-reproducible AND SQL-replayable. Brightness-shift
    * invariant by construction: a uniform +s shifts every block sum by
    * s·pixels/64 of the total shift, leaving every comparison's two
    * sides offset by the same amount — q236 plants exactly that.
    * Requires dimensions divisible by 8 (the fixture's 32×32 is);
    * non-conforming or undecodable payloads drop. */
  def decodeBlockHash(media: Dataset[MediaRow]): Dataset[BlockHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        readImage(r.payload)
          .filter(i => i.getWidth % 8 == 0 && i.getHeight % 8 == 0)
          .map { img =>
            val w = img.getWidth; val h = img.getHeight
            val bw = w / 8; val bh = h / 8
            val blocks = new Array[Long](64)
            var total = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = img.getRGB(x, y)
                val l = 299L * ((p >> 16) & 0xff) +
                  587L * ((p >> 8) & 0xff) + 114L * (p & 0xff)
                blocks((y / bh) * 8 + x / bw) += l
                total += l
                x += 1
              }
              y += 1
            }
            var hi = 0L; var lo = 0L
            var k = 0
            while (k < 64) {
              if (blocks(k) * 64 > total) {
                if (k >= 32) hi |= 1L << (k - 32) else lo |= 1L << k
              }
              k += 1
            }
            BlockHash(r.asset_id, r.n_bytes, hi, lo)
          }
      }
    }
  }

  /** STUB perceptual hash: 64 FNV-1a lanes striped over payload bytes
    * (byte i feeds lane i mod 64), signature bit b = parity of lane b.
    * Locality property the real pHash also has (and that the dedup join
    * downstream relies on): a payload differing in k bytes flips at most
    * min(k, 64) lanes → Hamming distance ≤ k. The stub is NOT robust to
    * byte insertion/deletion (a real DCT-based pHash is; this one shifts
    * every later stripe) — document-level near-dup over re-encoded media
    * needs the real decoder dropped into this body. Same partition-batched
    * execution shape as [[decodeFeatures]]. */
  def decodeSignatures(media: Dataset[MediaRow]): Dataset[MediaSignature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // real impl: val codec = Codec.open() — once per partition
      rows.map { r =>
        val fnv = Array.fill(64)(0xcbf29ce484222325L)
        var i = 0
        val n = if (r.payload == null) 0 else r.payload.length
        while (i < n) {
          val lane = i & 63
          fnv(lane) = (fnv(lane) ^ (r.payload(i) & 0xffL)) * 0x100000001b3L
          i += 1
        }
        var sig = 0L
        var b = 0
        while (b < 64) { sig |= (fnv(b) & 1L) << b; b += 1 }
        MediaSignature(r.asset_id, r.n_bytes, sig)
      }
    }
  }
}
