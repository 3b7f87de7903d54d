package graft.functions

import org.apache.spark.sql.{Column, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

/** product(x) aggregate — reference registers `product` as a distributive
  * aggregate (/root/reference/extension/core_functions/function_list.cpp).
  * The multiply monoid is commutative/associative, so partial aggregation
  * (map-side combine) applies exactly like sum.
  */
object ProductAgg extends Aggregator[java.lang.Double, Double, Double] {
  override def zero: Double = 1.0
  override def reduce(b: Double, a: java.lang.Double): Double =
    if (a == null) b else b * a
  override def merge(b1: Double, b2: Double): Double = b1 * b2
  override def finish(r: Double): Double = r
  override def bufferEncoder = Encoders.scalaDouble
  override def outputEncoder = Encoders.scalaDouble
}

/** Column helpers + SQL registration for graft's parity functions. */
object GraftFunctions {

  lazy val productUdaf = functions.udaf(ProductAgg, Encoders.DOUBLE)

  def product(c: Column): Column = productUdaf(c)

  /** Register SQL names so `spark.sql` can call the parity functions. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_similarity", e => CosineSimilarity(e(0), e(1)), "scala_udf")
    reg.createOrReplaceTempFunction("inner_product", e => InnerProduct(e(0), e(1)), "scala_udf")
    reg.createOrReplaceTempFunction("l2_distance", e => L2Distance(e(0), e(1)), "scala_udf")
    reg.createOrReplaceTempFunction("jaccard_sim", e => JaccardSimilarity(e(0), e(1)), "scala_udf")
    reg.createOrReplaceTempFunction("hamming", e => HammingDistance(e(0), e(1)), "scala_udf")
    reg.createOrReplaceTempFunction("jaro_winkler", e => JaroWinklerSimilarity(e(0), e(1)), "scala_udf")
    reg.createOrReplaceTempFunction("damerau_levenshtein", e => DamerauLevenshtein(e(0), e(1)), "scala_udf")
    reg.createOrReplaceTempFunction("bar", e => UnicodeBar.expr(e(0), e(1), e(2),
      if (e.length > 3) e(3)
      else org.apache.spark.sql.catalyst.expressions.Literal(80.0d)), "scala_udf")
    reg.createOrReplaceTempFunction("even", e => EvenCeil(e.head), "scala_udf")
    reg.createOrReplaceTempFunction("gcd", e => Gcd(e(0), e(1)), "scala_udf")
    reg.createOrReplaceTempFunction("lcm", e => Lcm(e(0), e(1)), "scala_udf")
    spark.udf.register("product_agg", productUdaf)
  }
}
