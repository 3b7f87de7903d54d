package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, processed with the typed Dataset API per partition.
  *
  * The decode step is a clearly-marked STUB (no image/audio codecs in
  * this container): `decodeStub` derives deterministic fake features from
  * the raw bytes. The Spark-side shape is the real thing — schema
  * (binary payload + metadata), partition-wise batch processing via
  * `mapPartitions` (one iterator per partition ≙ one decoder instance
  * per task, the pattern a real codec needs), and columnar hand-off back
  * to SQL. Swapping `decodeStub` for a real decoder changes no plumbing.
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
}
