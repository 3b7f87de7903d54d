package graft
import org.apache.spark.sql.SparkSession
object ExplainCb {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[8]").config("spark.ui.enabled", "false"))
      .config("spark.sql.shuffle.partitions", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.cacheMode = true
    val fn = queries.OlapShapes.queries(args.headOption.getOrElse("cb_filter_multi_agg"))
    val df = fn(spark, "/root/testdata/sf0.1")
    df.collect()
    println(df.queryExecution.executedPlan.toString.take(3000))
    spark.stop()
  }
}
