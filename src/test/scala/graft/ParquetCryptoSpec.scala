package graft

import graft.sources.ParquetCrypto
import org.scalatest.funsuite.AnyFunSuite

/** sources/ParquetCrypto: Parquet modular encryption through Spark's
  * parquet-hadoop crypto layer — lossless roundtrip, files genuinely
  * unreadable without the keys, wrong keys refused, and column
  * pruning/pushdown still working on encrypted files.
  */
class ParquetCryptoSpec extends AnyFunSuite {
  import SparkTestSession._

  private def data() = spark.range(5000).selectExpr(
    "id AS k", "CAST(id % 97 AS DOUBLE) AS v",
    "concat('row_', id) AS s")

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_pme").toString + "/t"

  test("encrypt + decrypt roundtrip is lossless") {
    val dir = freshDir()
    ParquetCrypto.writeEncrypted(data(), dir, "kf", Map("kc" -> Seq("v", "s")))
    val back = ParquetCrypto.readEncrypted(spark, dir)
      .orderBy("k").collect().toSeq
    val orig = data().orderBy("k").collect().toSeq
    assert(back == orig)
  }

  test("the file is genuinely encrypted: plain read fails") {
    val dir = freshDir()
    ParquetCrypto.writeEncrypted(data(), dir, "kf", Map.empty)
    // a reader with no crypto factory must not see the data
    val conf = spark.sparkContext.hadoopConfiguration
    val prevFactory = conf.get(ParquetCrypto.FactoryConf)
    conf.unset(ParquetCrypto.FactoryConf)
    try {
      val e = intercept[Exception] {
        spark.read.parquet(dir).collect()
      }
      def messages(t: Throwable): String =
        if (t == null) "" else t.toString + " | " + messages(t.getCause)
      assert(messages(e).toLowerCase.contains("encrypt"), messages(e))
    } finally if (prevFactory != null) conf.set(ParquetCrypto.FactoryConf, prevFactory)
  }

  test("unknown master key is refused") {
    val dir = freshDir()
    ParquetCrypto.writeEncrypted(data(), dir, "kf", Map.empty)
    // KeyToolkit caches unwrapped keys JVM-wide — drop them so the bad
    // key list is actually consulted
    org.apache.parquet.crypto.keytools.KeyToolkit.removeCacheEntriesForAllTokens()
    val badKeys = "other:" + java.util.Base64.getEncoder
      .encodeToString("xxxxxxxxxxxxxxxx".getBytes)
    val e = intercept[Exception] {
      ParquetCrypto.readEncrypted(spark, dir, keyList = badKeys).collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.toString + " | " + messages(t.getCause)
    assert(messages(e).contains("kf") || messages(e).toLowerCase.contains("key"),
      messages(e))
  }

  test("column pruning and pushdown survive encryption") {
    val dir = freshDir()
    ParquetCrypto.writeEncrypted(data(), dir, "kf", Map("kc" -> Seq("v")))
    val q = ParquetCrypto.readEncrypted(spark, dir)
      .filter("k >= 4990").select("k", "v")
    val scan = q.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scan.nonEmpty)
    assert(scan.head.requiredSchema.fieldNames.toSet == Set("k", "v"),
      scan.head.requiredSchema.treeString)
    assert(scan.head.metadata("PushedFilters").contains("GreaterThanOrEqual"),
      scan.head.metadata("PushedFilters"))
    assert(q.count() == 10)
  }
}
