package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, processed with the typed Dataset API per partition.
  *
  * Two decode paths:
  *  - `decodeStub` — clearly-marked STUB for codecs absent from this
  *    container (audio/video): deterministic fake features from raw bytes.
  *  - `decodeImages` — REAL image decode via `javax.imageio` (PNG):
  *    parses actual PNG bytes into dimensions + per-channel means, oracle
  *    value-matched (`mm_image_decode`).
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
}
