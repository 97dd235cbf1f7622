package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, processed in executor-local batches.
  *
  * Two tiers of fidelity:
  *  - REAL: uncompressed 24-bit BMP and PCM16 WAV decode/resize/stats
  *    via the dependency-free [[Codecs]] — actual pixel and sample
  *    work, oracle-gated end to end (q_mm_image / q_mm_audio /
  *    q_mm_resize re-derive every statistic from the synthesis
  *    formulas in SQL).
  *  - STUB: compressed/container formats (JPEG/MP4 video) stay behind
  *    [[StubCodec]] — no codec libraries ship in this environment;
  *    `decode` parses only the 16-byte fake header. Swap StubCodec for
  *    a real codec (e.g. javacpp-ffmpeg) without touching the operator
  *    shapes.
  *
  * Batch shape mirrors Arrow-batched UDF execution (mapInPandas):
  * `mapPartitions` + grouped iterator, so per-batch setup cost (codec
  * init, model load) amortizes across rows — the property that matters
  * at 100 TB, where per-row init would dominate.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("data", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("format", StringType))))))

  /** Deterministic fake codec. Header layout (16 bytes, big-endian):
    * int32 width | int32 height | int32 sampleRate | int32 nFrames.
    */
  object StubCodec {
    def encodeHeader(w: Int, h: Int, sr: Int, nf: Int, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(16 + payload.length)
      bb.putInt(w).putInt(h).putInt(sr).putInt(nf).put(payload)
      bb.array()
    }
    /** STUB: a real implementation would hand `data` to an image/audio
      * decoder; here we only read the fake header + payload bytes.
      */
    def decode(data: Array[Byte]): (Int, Int, Int, Int, Array[Byte]) = {
      val bb = java.nio.ByteBuffer.wrap(data)
      (bb.getInt, bb.getInt, bb.getInt, bb.getInt,
        java.util.Arrays.copyOfRange(data, 16, data.length))
    }
  }

  /** Synthesize a deterministic media table from a text table (the test
    * corpus has no binary columns): payload bytes derive from the text,
    * metadata from its length. Used by tests and the SparkEntry query.
    */
  def synthesize(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val enc = udf((id: Long, text: String) => {
      val payload = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val w = 16 + (id % 16).toInt
      val h = 16 + (id % 8).toInt
      StubCodec.encodeHeader(w, h, 16000, 1 + (id % 10).toInt, payload)
    })
    val kind = when(col(idCol) % 3 === 0, "image")
      .when(col(idCol) % 3 === 1, "audio").otherwise("video")
    df.select(
      col(idCol).as("media_id"),
      kind.as("kind"),
      enc(col(idCol), col(textCol)).as("data"),
      struct(
        (lit(16) + col(idCol) % 16).cast("int").as("width"),
        (lit(16) + col(idCol) % 8).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (lit(1) + col(idCol) % 10).cast("int").as("n_frames"),
        lit("stub").as("format")).as("meta"))
  }

  private val featureSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),
    StructField("n_bytes", IntegerType),
    StructField("features", ArrayType(FloatType))))

  /** Batched feature extraction: 16-bin byte histogram per item,
    * normalized. Partition-local, batch size mirrors Arrow batch sizing.
    */
  def extractFeatures(media: DataFrame, batchSize: Int = 256): DataFrame = {
    val spark = media.sparkSession
    val rows = media.select(col("media_id"), col("kind"), col("data")).rdd
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch setup would live here (codec/model init)
          batch.map { r =>
            val data = r.getAs[Array[Byte]]("data")
            val (_, _, _, _, payload) = StubCodec.decode(data)
            val hist = new Array[Float](16)
            var i = 0
            while (i < payload.length) { hist((payload(i) & 0xff) / 16) += 1f; i += 1 }
            val n = math.max(payload.length, 1).toFloat
            var b = 0
            while (b < 16) { hist(b) /= n; b += 1 }
            Row(r.getLong(0), r.getString(1), data.length, hist.toSeq)
          }
        }
      }
    spark.createDataFrame(rows, featureSchema)
  }

  /** "Resize" stub: crops/pads the payload to w*h bytes deterministically,
    * rewriting the header — exercises binary rewrite plumbing. Same
    * batched-iterator shape as [[extractFeatures]] (per-batch setup slot
    * for the real codec); input/output schema is [[mediaSchema]].
    */
  def resize(media: DataFrame, w: Int, h: Int, batchSize: Int = 256): DataFrame = {
    val spark = media.sparkSession
    val ordered = media.select(col("media_id"), col("kind"), col("data"), col("meta"))
    val rows = ordered.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup would live here (codec init)
        batch.map { r =>
          val (_, _, sr, nf, payload) = StubCodec.decode(r.getAs[Array[Byte]](2))
          val out = java.util.Arrays.copyOf(payload, w * h)
          val meta = r.getStruct(3)
          Row(r.getLong(0), r.getString(1),
            StubCodec.encodeHeader(w, h, sr, nf, out),
            Row(w, h, meta.get(2), meta.get(3), meta.get(4)))
        }
      }
    }
    spark.createDataFrame(rows, ordered.schema)
  }

  // ---- REAL image/audio paths (dependency-free BMP + WAV codecs) ----

  /** Deterministic real-media table: id%3==0 → an actual 24-bit BMP
    * whose pixel (x,y) channels follow closed-form integer formulas
    * (r=(7x+13y+id)%256, g=(11x+5y+3id)%256, b=(3x+17y+7id)%256 over a
    * w=8+id%5 × h=8+id%3 canvas), id%3==1 → an actual PCM16 WAV with a
    * deterministic integer waveform (s_i=((37i+11id)%2048)−1024 at
    * 8 kHz), else the stub "video" container. The formulas make every
    * downstream pixel/sample statistic re-derivable in ANSI SQL, so the
    * REAL codec round-trip is oracle-gated.
    */
  def synthesizeReal(df: DataFrame, idCol: String): DataFrame = {
    val enc = udf((id: Long) => {
      (id % 3) match {
        case 0 =>
          val w = 8 + (id % 5).toInt
          val h = 8 + (id % 3).toInt
          // container rotation over closed-form pixels: the oracles then
          // gate ALL THREE decoders (BMP, every PNG filter, GIF's LZW)
          if (id % 9 == 3) {
            // palette image: index (x+y+id)%16, palette a closed-form
            // ramp — channel means stay SQL-derivable
            val pal = Array.tabulate(16)(i =>
              Array(17 * i, (7 * i) % 256, (11 * i) % 256))
            val indices = Array.tabulate(w * h) { p =>
              val x = p % w; val y = p / w
              ((x + y + id) % 16).toByte
            }
            Codecs.encodeGif(w, h, pal, indices)
          } else {
            val rgb = new Array[Byte](w * h * 3)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = (y * w + x) * 3
                rgb(p) = ((7 * x + 13 * y + id) % 256).toByte
                rgb(p + 1) = ((11 * x + 5 * y + 3 * id) % 256).toByte
                rgb(p + 2) = ((3 * x + 17 * y + 7 * id) % 256).toByte
                x += 1
              }
              y += 1
            }
            if (id % 6 == 0) Codecs.encodeBmp(w, h, rgb)
            else Codecs.encodePng(w, h, rgb, filterType = (id % 5).toInt)
          }
        case 1 =>
          val n = 64 + (id % 64).toInt
          val samples = Array.tabulate(n)(i =>
            (((37L * i + 11 * id) % 2048) - 1024).toShort)
          Codecs.encodeWav(8000, samples)
        case _ =>
          // REAL video too: an 8x8 C420 Y4M whose luma bytes follow a
          // closed-form formula per frame (chroma planes constant 128)
          val (w, h) = (8, 8)
          val nFrames = 1 + (id % 10).toInt
          val frames = (0 until nFrames).map { f =>
            val frame = new Array[Byte](w * h + 2 * (w / 2) * (h / 2))
            var i = 0
            while (i < w * h) {
              frame(i) = ((5L * i + 19L * f + id) % 256).toByte; i += 1
            }
            java.util.Arrays.fill(frame, w * h, frame.length, 128.toByte)
            frame
          }
          Codecs.encodeY4m(w, h, "25:1", frames)
      }
    })
    val kind = when(col(idCol) % 3 === 0, "image")
      .when(col(idCol) % 3 === 1, "audio").otherwise("video")
    df.select(col(idCol).as("media_id"), kind.as("kind"),
      enc(col(idCol)).as("data"))
  }

  private val imageStatsSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_r", DoubleType, nullable = false),
    StructField("mean_g", DoubleType, nullable = false),
    StructField("mean_b", DoubleType, nullable = false)))

  /** REAL image statistics: decode each image (format-sniffed BMP or
    * PNG — header offsets, bottom-up BGR rows and padding for BMP;
    * inflate + five-filter reconstruction for PNG) and average the
    * actual channel bytes. Batched iterator, kind filter before the
    * decode — same shape as [[extractFeatures]]; any codec defect
    * shifts a mean and fails the q_mm_image oracle.
    */
  def imageStats(media: DataFrame, batchSize: Int = 256): DataFrame = {
    val spark = media.sparkSession
    val rows = media.filter(col("kind") === "image")
      .select(col("media_id"), col("data")).rdd
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val (w, h, rgb, _) = Codecs.decodeImage(r.getAs[Array[Byte]]("data"))
            val sums = new Array[Long](3)
            var i = 0
            while (i < rgb.length) { sums(i % 3) += rgb(i) & 0xff; i += 1 }
            val n = (w * h).toDouble
            def mean(c: Int): Double =
              BigDecimal(sums(c) / n).setScale(6, BigDecimal.RoundingMode.HALF_UP)
                .toDouble
            Row(r.getLong(0), w, h, mean(0), mean(1), mean(2))
          }
        }
      }
    spark.createDataFrame(rows, imageStatsSchema)
  }

  /** REAL nearest-neighbor image resize: decode (BMP or PNG, sniffed)
    * → resample → re-encode in the SOURCE format. Output schema
    * matches the input (media_id, kind, data).
    */
  def resizeImages(media: DataFrame, dstW: Int, dstH: Int,
      batchSize: Int = 256): DataFrame = {
    val spark = media.sparkSession
    val ordered = media.filter(col("kind") === "image")
      .select(col("media_id"), col("kind"), col("data"))
    val rows = ordered.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val (w, h, rgb, fmt) = Codecs.decodeImage(r.getAs[Array[Byte]]("data"))
          Row(r.getLong(0), r.getString(1),
            Codecs.encodeImage(dstW, dstH,
              Codecs.resizeRgb(w, h, rgb, dstW, dstH), fmt))
        }
      }
    }
    spark.createDataFrame(rows, ordered.schema)
  }

  private val imageHashSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("ahash", LongType, nullable = false),
    StructField("dhash", LongType, nullable = false)))

  /** Pure-integer perceptual hash kernel shared with the tests:
    * luminance = (299·r + 587·g + 114·b) / 1000 (integer division),
    * nearest-neighbor sampling with [[Codecs.resizeRgb]]'s source-pixel
    * election (sx = x·w / W, floor), bit order p = y·W + x from the
    * MSB. aHash: 8×8, bit = (64·lum > Σlum) — strict, ties to 0.
    * dHash: 9×8 grid, bit = lum(x+1,y) > lum(x,y).
    */
  private[graft] def perceptualHashes(w: Int, h: Int,
      rgb: Array[Byte]): (Long, Long) = {
    def lumAt(gx: Int, gy: Int, gw: Int, gh: Int): Long = {
      val sx = gx * w / gw
      val sy = gy * h / gh
      val s = (sy * w + sx) * 3
      (299L * (rgb(s) & 0xff) + 587L * (rgb(s + 1) & 0xff) +
        114L * (rgb(s + 2) & 0xff)) / 1000L
    }
    val a = Array.tabulate(64)(p => lumAt(p % 8, p / 8, 8, 8))
    val sum = a.sum
    var ahash = 0L
    var p = 0
    while (p < 64) {
      if (64L * a(p) > sum) ahash |= 1L << (63 - p)
      p += 1
    }
    var dhash = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (lumAt(x + 1, y, 9, 8) > lumAt(x, y, 9, 8))
          dhash |= 1L << (63 - (y * 8 + x))
        x += 1
      }
      y += 1
    }
    (ahash, dhash)
  }

  /** Perceptual image hashes (aHash + dHash) for image near-dup
    * detection — the LAION-style multimodal dedup step: 8 bytes per
    * image instead of pixels, then [[Dedup.hammingPairs64]] bands the
    * signatures exactly like SimHash text near-dup. All-integer math
    * (see [[perceptualHashes]]) so the q_mm_phash oracle rebuilds every
    * bit relationally from the closed-form pixels.
    */
  def imageHashes(media: DataFrame, batchSize: Int = 256): DataFrame = {
    val spark = media.sparkSession
    val rows = media.filter(col("kind") === "image")
      .select(col("media_id"), col("data")).rdd
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val (w, h, rgb, _) = Codecs.decodeImage(r.getAs[Array[Byte]]("data"))
            val (a, d) = perceptualHashes(w, h, rgb)
            Row(r.getLong(0), a, d)
          }
        }
      }
    spark.createDataFrame(rows, imageHashSchema)
  }

  private val audioStatsSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("duration_s", DoubleType, nullable = false),
    StructField("rms", DoubleType, nullable = false)))

  /** REAL audio statistics from decoded PCM: sample count, duration,
    * RMS amplitude — the silence/clipping screens of an audio ingest
    * pipeline. Integer sample sums keep the numbers oracle-exact.
    */
  def audioStats(media: DataFrame, batchSize: Int = 256): DataFrame = {
    val spark = media.sparkSession
    val rows = media.filter(col("kind") === "audio")
      .select(col("media_id"), col("data")).rdd
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val (sr, samples) = Codecs.decodeWav(r.getAs[Array[Byte]]("data"))
            var sq = 0L
            var i = 0
            while (i < samples.length) {
              sq += samples(i).toLong * samples(i); i += 1
            }
            val n = samples.length.toLong
            def r6(x: Double): Double =
              BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            Row(r.getLong(0), sr, n,
              r6(n.toDouble / sr),
              r6(math.sqrt(sq.toDouble / math.max(n, 1L))))
          }
        }
      }
    spark.createDataFrame(rows, audioStatsSchema)
  }

  private val audioFpSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("sig", LongType, nullable = false)))

  /** Audio FINGERPRINT from decoded PCM — the audio member of the
    * signature family beside [[perceptualHashes]] for images: the
    * clip partitions into `frames` equal spans (sample i → frame
    * ⌊i·F/n⌋, exact integer math), each frame's energy is the exact
    * integer Σs², and bit f of the signature is set iff
    * E_f > E_{f+1} — the energy-CONTOUR descriptor (chromaprint's
    * core idea minus the filterbank), invariant to uniform gain and
    * robust to small edits. F−1 bits pack into one BIGINT, so audio
    * near-dup is [[graft.ops.Dedup.hammingPairs64]] over 8-byte
    * signatures — the same banded path as SimHash/pHash, nothing
    * audio-specific past this scan. All-integer math end to end:
    * the q_mm_afp oracle replays every bit relationally from the
    * closed-form fixtures.
    */
  def audioFingerprints(media: DataFrame, frames: Int = 16,
      batchSize: Int = 256): DataFrame = {
    require(frames >= 2 && frames <= 64, s"audioFingerprints: bad frames $frames")
    val spark = media.sparkSession
    val rows = media.filter(col("kind") === "audio")
      .select(col("media_id"), col("data")).rdd
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val (_, samples) = Codecs.decodeWav(r.getAs[Array[Byte]]("data"))
            val n = samples.length
            val e = new Array[Long](frames)
            var i = 0
            while (i < n) {
              val f = (i.toLong * frames / n).toInt
              e(f) += samples(i).toLong * samples(i)
              i += 1
            }
            var sig = 0L
            var f = 0
            while (f < frames - 1) {
              if (e(f) > e(f + 1)) sig |= 1L << f
              f += 1
            }
            Row(r.getLong(0), n.toLong, sig)
          }
        }
      }
    spark.createDataFrame(rows, audioFpSchema)
  }

  private val videoFrameSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("luma_mean", DoubleType, nullable = false)))

  /** REAL frame sampling: decode the Y4M container, keep every k-th
    * frame, report its luma-plane mean — the scene/brightness screen of
    * a video ingest pipeline, computed from actual frame bytes. Same
    * batched-iterator shape; kind filter before the decode.
    */
  def sampleFramesReal(media: DataFrame, everyK: Int = 2,
      batchSize: Int = 256): DataFrame = {
    require(everyK >= 1, s"everyK must be >= 1: $everyK")
    val spark = media.sparkSession
    val rows = media.filter(col("kind") === "video")
      .select(col("media_id"), col("data")).rdd
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.flatMap { r =>
            val (w, h, frames) = Codecs.decodeY4m(r.getAs[Array[Byte]]("data"))
            (0 until frames.length by everyK).map { i =>
              val luma = frames(i)
              var s = 0L
              var p = 0
              while (p < w * h) { s += luma(p) & 0xff; p += 1 }
              val mean = BigDecimal(s / (w * h).toDouble)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
              Row(r.getLong(0), i, mean)
            }
          }
        }
      }
    spark.createDataFrame(rows, videoFrameSchema)
  }

  private val sceneSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("delta_mean", DoubleType, nullable = false),
    StructField("is_cut", LongType, nullable = false)))

  /** Scene-change detection over the REAL decoded Y4M stream: every
    * consecutive frame pair's mean-luma delta, flagged as a cut when
    * it reaches `threshold` (mean-luma units). The first hard-cut
    * heuristic of any video curation pipeline (shot segmentation
    * before frame sampling / per-shot dedup). Decision arithmetic is
    * exact-integer end to end — luma SUMS compared as
    * |s_f − s_{f−1}|·1e6 ≥ τmicro·(w·h) — so no float threshold ever
    * decides a cut, and the q_mm_scenes oracle replays every verdict
    * from the closed-form fixtures. Output: one row per transition
    * (frame_idx ≥ 1), (media_id, frame_idx, delta_mean, is_cut).
    */
  def sceneChanges(media: DataFrame, threshold: Double = 6.0,
      batchSize: Int = 256): DataFrame = {
    require(threshold >= 0, s"sceneChanges: bad threshold $threshold")
    val tMicro = math.round(threshold * 1e6)
    val spark = media.sparkSession
    val rows = media.filter(col("kind") === "video")
      .select(col("media_id"), col("data")).rdd
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.flatMap { r =>
            val (w, h, frames) = Codecs.decodeY4m(r.getAs[Array[Byte]]("data"))
            val px = w * h
            val sums = frames.map { luma =>
              var s = 0L
              var p = 0
              while (p < px) { s += luma(p) & 0xff; p += 1 }
              s
            }
            (1 until sums.length).map { i =>
              val d = math.abs(sums(i) - sums(i - 1))
              val mean = BigDecimal(d / px.toDouble)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
              Row(r.getLong(0), i, mean,
                if (d * 1000000L >= tMicro * px) 1L else 0L)
            }
          }
        }
      }
    spark.createDataFrame(rows, sceneSchema)
  }

  private val videoFpSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("sig", LongType, nullable = false)))

  /** Video FINGERPRINT: the luma-contour signature completing the
    * per-modality family (pHash for images, [[audioFingerprints]] for
    * audio) — bit f set iff frame f's exact luma SUM exceeds frame
    * f+1's (same-size frames, so sum compare ≡ mean compare with zero
    * float math), up to 63 transitions packed into one BIGINT. Robust
    * to uniform brightness/gain shifts of the whole clip; re-encoded
    * or trimmed-tail copies stay within a few contour bits, so video
    * near-dup is [[graft.ops.Dedup.hammingPairs64]] over 8-byte
    * signatures like every other modality. All-integer; the
    * q_mm_vfp oracle replays every bit from the closed-form frames.
    */
  def videoFingerprints(media: DataFrame,
      batchSize: Int = 256): DataFrame = {
    val spark = media.sparkSession
    val rows = media.filter(col("kind") === "video")
      .select(col("media_id"), col("data")).rdd
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val (w, h, frames) = Codecs.decodeY4m(r.getAs[Array[Byte]]("data"))
            val px = w * h
            val sums = frames.map { luma =>
              var s = 0L
              var p = 0
              while (p < px) { s += luma(p) & 0xff; p += 1 }
              s
            }
            var sig = 0L
            var f = 0
            while (f < sums.length - 1 && f < 63) {
              if (sums(f) > sums(f + 1)) sig |= 1L << f
              f += 1
            }
            Row(r.getLong(0), sums.length.toLong, sig)
          }
        }
      }
    spark.createDataFrame(rows, videoFpSchema)
  }

  private val frameSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame_bytes", BinaryType)))

  /** Frame sampling stub for "video": every k-th chunk of the payload as
    * one frame row. Output: (media_id, frame_idx, frame_bytes). Batched
    * iterator like [[extractFeatures]]; the kind filter runs BEFORE the
    * codec stage so non-video bytes are never decoded.
    */
  def sampleFrames(media: DataFrame, everyK: Int = 2, batchSize: Int = 256): DataFrame = {
    val spark = media.sparkSession
    val rows = media.filter(col("kind") === "video")
      .select(col("media_id"), col("data")).rdd
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch setup would live here (codec init)
          batch.flatMap { r =>
            val (w, h, _, nFrames, payload) = StubCodec.decode(r.getAs[Array[Byte]]("data"))
            val frameSize = math.max(1,
              math.min(w * h, math.max(payload.length / math.max(nFrames, 1), 1)))
            (0 until nFrames by everyK).map { i =>
              val from = math.min(i * frameSize, payload.length)
              val until = math.min(from + frameSize, payload.length)
              Row(r.getLong(0), i, java.util.Arrays.copyOfRange(payload, from, until))
            }
          }
        }
      }
    spark.createDataFrame(rows, frameSchema)
  }
}
