package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.columnar.InMemoryRelation

/** Dev diagnostic: q15 under warm cacheMode throws in an AttributeMap
  * lookup — inspect where the stale ordering ids live.
  */
object DebugQ15 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val sf = "/root/testdata/sf0.001"
    Tables.cacheMode = true
    val df = SparkEntry.queries("q15_top_supplier")(spark, sf)
    val cachedPlan = df.queryExecution.withCachedData
    cachedPlan.collectWithSubqueries { case rel: InMemoryRelation =>
      println(s"REL out=${rel.output.take(2).map(a => a.name + "#" + a.exprId.id)} " +
        s"ord=${rel.outputOrdering.map(_.child.toString)}")
    }
    try {
      df.collect()
      println("q15 warm OK")
    } catch {
      case e: Throwable =>
        println("q15 warm FAILED: " + e.getMessage)
    }
    spark.stop()
  }
}
