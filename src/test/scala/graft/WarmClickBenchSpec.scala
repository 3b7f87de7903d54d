package graft

import org.scalatest.funsuite.AnyFunSuite

/** CI-gated warm-vs-cold differential over the full ClickBench text set
  * at a small hits factor. The bench arm evaluates these texts on the
  * WARM clustered cache (UserID cluster key, sorted-run string keys,
  * packed/collapse physical rules — GraftSession.clusterKeys), while the
  * driver's oracle gate runs COLD parquet scans; this spec closes that
  * gap automatically every round instead of relying on the manual
  * graft.WarmCbCheck main (same differential, scaled down).
  */
class WarmClickBenchSpec extends AnyFunSuite {
  import SparkTestSession._

  test("all ClickBench texts: warm clustered-cache results == cold results") {
    val dir = graft.sources.HitsFixture.ensureScaled(spark, 1L)
    val cold = spark.read.parquet(s"$dir/hits.parquet")
    Tables.cacheMode = true
    try {
      val warm = Tables(spark, dir, "hits")
      warm.count() // materialize the clustered cache once
      val bad = queries.ClickBench.texts.flatMap { case (name, sql) =>
        try {
          warm.createOrReplaceTempView("hits")
          val w = spark.sql(sql).collect().map(_.toString).sorted.toSeq
          cold.createOrReplaceTempView("hits")
          val c = spark.sql(sql).collect().map(_.toString).sorted.toSeq
          if (w == c) None
          else Some(s"$name: warm=${w.size} cold=${c.size} rows, first diff=" +
            w.zip(c).find { case (a, b) => a != b }.orElse(
              Some((w.drop(c.size).headOption, c.drop(w.size).headOption))))
        } catch {
          case e: Throwable =>
            Some(s"$name: warm arm THREW ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
      assert(bad.isEmpty, bad.mkString("\n"))
    } finally {
      Tables.cacheMode = false
      Tables.clearCache()
      spark.catalog.dropTempView("hits")
    }
  }
}
