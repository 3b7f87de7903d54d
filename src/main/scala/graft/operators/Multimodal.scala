package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, processed with the typed Dataset API per partition.
  *
  * Three decode paths:
  *  - `decodeStub` — clearly-marked STUB for codecs absent from this
  *    container (video, compressed audio): deterministic fake features
  *    from raw bytes.
  *  - `decodeImages` — REAL image decode via `javax.imageio` (PNG):
  *    parses actual PNG bytes into dimensions + per-channel means, oracle
  *    value-matched (`mm_image_decode`).
  *  - `decodeAudio` — REAL audio decode via `javax.sound.sampled` (WAV
  *    s16le PCM): parses the RIFF container, streams frames, extracts
  *    rate/channels/sum/peak, oracle value-matched (`mm_audio_decode`).
  * Either way the Spark-side shape is identical — schema (binary payload
  * + metadata), partition-wise processing via `mapPartitions` (one
  * decoder instance per task), and columnar hand-off back to SQL.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media: Array[Byte], width: Int, height: Int)
  case class MediaFeatures(doc_id: Long, n_bytes: Long, header_hex: String,
                           feature: Array[Float])

  /** STUB decoder — stands in for image/audio decode + feature extraction.
    * Deterministic: 8 stride-averaged byte means as the "embedding".
    */
  private def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val n = math.max(1, bytes.length / 8)
    Array.tabulate(8) { i =>
      val s = bytes.slice(i * n, math.min((i + 1) * n, bytes.length))
      if (s.isEmpty) 0.0f else s.map(b => (b & 0xff).toFloat).sum / s.length
    }
  }

  /** Fake media table derived from documents (payload = UTF-8 bytes). */
  def fromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"),
        lit(640).as("width"), lit(480).as("height"))
      .as[MediaRow]
  }

  /** Per-partition decode + feature extraction. One decoder per task. */
  def extractFeatures(ds: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // a real pipeline would initialize the codec once per partition here
      it.map { r =>
        MediaFeatures(
          r.doc_id,
          r.media.length.toLong,
          r.media.take(4).map(b => f"${b & 0xff}%02x").mkString,
          decodeStub(r.media))
      }
    }
  }

  // --- real (non-stub) image path: PNG via javax.imageio, pure JVM ---

  case class ImageRow(doc_id: Long, png: Array[Byte])
  case class ImageFeatures(doc_id: Long, width: Int, height: Int,
                           mean_r: Double, mean_g: Double, mean_b: Double)

  /** Deterministic 8-bit RGB test card for `seed`: channel values are
    * simple arithmetic in (seed, x, y), so expected per-channel means are
    * computable in closed form — the oracle recomputes them in SQL while
    * the engine arrives at them through a REAL PNG encode→decode
    * round-trip (javax.imageio), proving the codec path end-to-end.
    */
  def syntheticPng(seed: Long, w: Int = 16, h: Int = 16): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((seed * 7 + x * 3 + y * 5) % 256).toInt
        val g = ((seed * 11 + x) % 256).toInt
        val b = ((seed * 13 + y) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  // --- real (non-stub) audio path: WAV/PCM via javax.sound, pure JVM ---

  case class AudioRow(doc_id: Long, wav: Array[Byte])
  case class AudioFeatures(doc_id: Long, sample_rate: Int, channels: Int,
                           n_samples: Long, sum_samples: Long, peak_abs: Long)

  /** Deterministic 16-bit PCM mono WAV for `seed`: sample i is simple
    * integer arithmetic in (seed, i), so the decoded sum/peak are
    * closed-form — the oracle recomputes them in SQL while the engine
    * goes through a REAL RIFF/WAVE encode→decode round-trip
    * (javax.sound.sampled), proving the audio codec path end-to-end.
    */
  def syntheticWav(seed: Long, n: Int = 256, rate: Int = 8000): Array[Byte] = {
    val data = new Array[Byte](n * 2) // little-endian s16le
    var i = 0
    while (i < n) {
      val v = ((seed * 31 + i * 17) % 20001 - 10000).toShort
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL decode: parse the WAV container with javax.sound (one decoder
    * per task), stream the PCM frames, and extract rate/channels/
    * sample-sum/peak — integer features, so the oracle match is exact.
    */
  def decodeAudio(ds: Dataset[AudioRow]): Dataset[AudioFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.wav))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
          s"doc ${r.doc_id}: expected s16le PCM, got $fmt")
        val bytes = ais.readAllBytes()
        var (i, sum, peak, n) = (0, 0L, 0L, 0L)
        while (i + 1 < bytes.length) {
          val v = ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort.toLong
          sum += v
          if (math.abs(v) > peak) peak = math.abs(v)
          n += 1
          i += 2
        }
        AudioFeatures(r.doc_id, fmt.getSampleRate.toInt, fmt.getChannels, n, sum, peak)
      }
    }
  }

  /** REAL decode: parse the PNG bytes with javax.imageio (one reader per
    * task via mapPartitions) and extract dimensions + per-channel means.
    */
  def decodeImages(ds: Dataset[ImageRow]): Dataset[ImageFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.png))
        require(img != null, s"doc ${r.doc_id}: not a decodable image")
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
        val n = (w * h).toDouble
        ImageFeatures(r.doc_id, w, h, sr / n, sg / n, sb / n)
      }
    }
  }

  // --- video frame-sampling path: raw-gray container, seek-based ---

  case class VideoRow(doc_id: Long, video: Array[Byte])
  case class FrameSample(doc_id: Long, frame_idx: Int, n_frames: Int, mean_gray: Double)

  /** Deterministic raw-grayscale "video" for `seed`: `GRV1` magic +
    * big-endian (w, h, nFrames) header + nFrames uncompressed w×h frames
    * with pixel(f, p) = (seed*7 + f*13 + p*3) mod 256 — closed-form, so
    * the oracle recomputes the sampled-frame means in SQL while the
    * engine arrives at them by parsing the actual container bytes.
    * (A real codec — H.264 etc. — is absent from this JVM; this path
    * proves the PLUMBING: container parse, frame seek, stride sampling.)
    */
  def syntheticVideo(seed: Long, w: Int = 8, h: Int = 8, nFrames: Int = 12): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16 + nFrames * w * h)
    bb.put("GRV1".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bb.putInt(w); bb.putInt(h); bb.putInt(nFrames)
    var f = 0
    while (f < nFrames) {
      var p = 0
      while (p < w * h) {
        bb.put(((seed * 7 + f * 13 + p * 3) % 256).toByte)
        p += 1
      }
      f += 1
    }
    bb.array()
  }

  /** Sample every `every`-th frame and extract its mean gray level.
    *
    * The 100 TB posture is in the seek: frame offsets are computed from
    * the header (`16 + f*w*h`), so UNSAMPLED frames are never read —
    * decode cost scales with frames KEPT, not frames stored, exactly how
    * a production frame sampler seeks between key frames. One parser per
    * task (mapPartitions); rows stay columnar on the way back to SQL.
    */
  def sampleFrames(ds: Dataset[VideoRow], every: Int = 3): Dataset[FrameSample] = {
    import ds.sparkSession.implicits._
    require(every >= 1, s"sampleFrames: every must be >= 1, got $every")
    ds.mapPartitions { it =>
      it.flatMap { r =>
        val bb = java.nio.ByteBuffer.wrap(r.video)
        val magic = new Array[Byte](4); bb.get(magic)
        require(new String(magic, java.nio.charset.StandardCharsets.US_ASCII) == "GRV1",
          s"doc ${r.doc_id}: not a GRV1 container")
        val w = bb.getInt(); val h = bb.getInt(); val n = bb.getInt()
        val frameBytes = w * h
        require(r.video.length == 16 + n * frameBytes,
          s"doc ${r.doc_id}: truncated container")
        (0 until n by every).iterator.map { f =>
          val off = 16 + f * frameBytes // seek: skipped frames untouched
          var s = 0L; var p = 0
          while (p < frameBytes) { s += (r.video(off + p) & 0xff); p += 1 }
          FrameSample(r.doc_id, f, n, s.toDouble / frameBytes)
        }
      }
    }
  }
}
