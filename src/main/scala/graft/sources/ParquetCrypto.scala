package graft.sources

import org.apache.parquet.crypto.keytools.LocalWrapKmsClient
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet Modular Encryption (PME) through Spark's built-in
  * parquet-hadoop crypto layer — the analog of the reference's
  * `encryption_config` parquet option
  * (/root/reference/extension/parquet/parquet_extension.cpp:376,
  * parquet_crypto.cpp). The reference implements AES-GCM footer+column
  * encryption inside its reader; Spark's parquet-hadoop 1.16 ships the
  * standard PME implementation (`org.apache.parquet.crypto`), so the
  * engine's job is wiring: a KMS client supplying master keys and the
  * hadoop configuration that keys the factory.
  *
  * [[GraftKmsClient]] is a LOCAL master-key provider (keys come from the
  * hadoop conf, base64) — the offline stand-in for a real KMS; the
  * `LocalWrapKmsClient` base class performs standard AES-GCM key
  * wrapping with them, so the files themselves are spec-compliant PME
  * (footer key + per-column keys, key material inline in the footer).
  * A production deployment swaps the client class for its KMS — the
  * file format and everything else is unchanged.
  *
  * Scale posture: encryption is a per-file concern — every executor
  * encrypts/decrypts its own splits via the same hadoop conf; no driver
  * state, no extra shuffle, column pruning and predicate pushdown work
  * unchanged on encrypted files (PME encrypts pages + footer metadata,
  * and the reader decrypts only the projected columns' pages).
  */
object ParquetCrypto {
  val FactoryConf = "parquet.crypto.factory.class"
  val KmsConf = "parquet.encryption.kms.client.class"
  val KeyListConf = "graft.parquet.kms.keys" // id:base64[,id:base64...]
  val Factory = "org.apache.parquet.crypto.keytools.PropertiesDrivenCryptoFactory"

  /** Two demo 128-bit master keys (dev/test only — a deployment provides
    * its own via the same conf).
    */
  val DemoKeys: String = {
    val b64 = java.util.Base64.getEncoder
    "kf:" + b64.encodeToString("0123456789abcdef".getBytes) +
      ",kc:" + b64.encodeToString("fedcba9876543210".getBytes)
  }

  // KeyToolkit caches KMS clients and unwrapped keys JVM-wide; a client
  // initialized under an older key list would keep serving stale master
  // keys after the list changes — drop the caches when it does. Guarded
  // JVM-wide because the caches are.
  private var lastKeyList: String = null
  private def refreshKeyCaches(keyList: String): Unit = synchronized {
    if (lastKeyList != null && lastKeyList != keyList)
      org.apache.parquet.crypto.keytools.KeyToolkit.removeCacheEntriesForAllTokens()
    lastKeyList = keyList
  }

  /** The crypto factory/KMS wiring as per-operation datasource options —
    * Spark folds these into the job-local hadoop conf
    * (`newHadoopConfWithOptions`), so nothing leaks into the session's
    * shared `hadoopConfiguration` and concurrent plain-parquet writes in
    * the same session are unaffected.
    */
  private def cryptoOptions(keyList: String): Map[String, String] = Map(
    FactoryConf -> Factory,
    KmsConf -> classOf[GraftKmsClient].getName,
    KeyListConf -> keyList)

  /** Write `df` as PME-encrypted parquet: `footerKeyId` seals the
    * footer, `columnKeys` maps keyId → columns (unlisted columns are
    * written with the footer key). Thread-safe: all crypto properties
    * travel as per-write options, never through the shared conf.
    */
  def writeEncrypted(df: DataFrame, path: String, footerKeyId: String,
      columnKeys: Map[String, Seq[String]], keyList: String = DemoKeys): Unit = {
    refreshKeyCaches(keyList)
    val keyOpts =
      if (columnKeys.nonEmpty) Map(
        "parquet.encryption.footer.key" -> footerKeyId,
        "parquet.encryption.column.keys" ->
          columnKeys.map { case (k, cols) => s"$k:${cols.mkString(",")}" }.mkString(";"))
      else
        // footer-only: the factory requires column keys unless uniform
        // encryption (one key for footer + all columns) is requested
        Map("parquet.encryption.uniform.key" -> footerKeyId)
    df.write.mode("overwrite")
      .options(cryptoOptions(keyList) ++ keyOpts)
      .parquet(path)
  }

  /** Read PME-encrypted parquet (the factory reads key material from the
    * footer and unwraps through the KMS client). Per-read options only.
    */
  def readEncrypted(spark: SparkSession, path: String,
      keyList: String = DemoKeys): DataFrame = {
    refreshKeyCaches(keyList)
    spark.read.options(cryptoOptions(keyList)).parquet(path)
  }
}

/** Master keys resolved from the hadoop conf (`graft.parquet.kms.keys`,
  * `id:base64` pairs); the parquet-hadoop base class does the actual
  * AES-GCM local wrapping. Instantiated reflectively by KeyToolkit on
  * both write and read paths, per executor.
  */
class GraftKmsClient extends LocalWrapKmsClient {
  override protected def initializeInternal(): Unit = ()

  override protected def getMasterKeyFromServer(keyId: String): Array[Byte] = {
    val listed = Option(hadoopConfiguration.get(ParquetCrypto.KeyListConf)).getOrElse(
      throw new org.apache.parquet.crypto.KeyAccessDeniedException(
        s"no master keys configured (${ParquetCrypto.KeyListConf})"))
    listed.split(',').map(_.trim.split(':')).collectFirst {
      case Array(id, b64) if id == keyId => java.util.Base64.getDecoder.decode(b64)
    }.getOrElse(throw new org.apache.parquet.crypto.KeyAccessDeniedException(keyId))
  }
}
