package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Holistic-aggregate rewrites composed from Spark builtins —
  * SURVEY.md §2.4 custom-aggregate list (reference implementations:
  * /root/reference/extension/core_functions/aggregate/holistic/mad.cpp,
  * distributive/entropy.cpp, nested/histogram.cpp).
  *
  * Each is expressed as a bounded number of hash aggregates rather than
  * a per-group value buffer, so memory stays O(groups), shuffles stay
  * key-partitioned, and the plans scale to arbitrarily large groups.
  */
object StatsOps {

  /** Median absolute deviation: median(|x - median(x)|) per group.
    * Two percentile passes; the per-group medians are broadcast back.
    *
    * MEMORY BOUND: Spark's exact `percentile` buffers every value of a
    * group in its aggregation buffer — a hot group at warehouse scale
    * OOMs the executor. This exact form exists for engine parity
    * (oracle-verifiable); [[madApprox]] is the at-scale default.
    */
  def mad(df: DataFrame, keys: Seq[String], values: Seq[(String, String)]): DataFrame = {
    val medAgg = df.groupBy(keys.map(col): _*).agg(
      expr(s"percentile(${values.head._1}, 0.5)").as(s"_med_${values.head._1}"),
      values.tail.map(v => expr(s"percentile(${v._1}, 0.5)").as(s"_med_${v._1}")): _*)
    df.join(broadcast(medAgg), keys)
      .groupBy(keys.map(col): _*)
      .agg(
        expr(s"percentile(abs(${values.head._1} - _med_${values.head._1}), 0.5)").as(values.head._2),
        values.tail.map(v =>
          expr(s"percentile(abs(${v._1} - _med_${v._1}), 0.5)").as(v._2)): _*)
  }

  /** At-scale MAD: same two-pass shape as [[mad]] but on
    * `approx_percentile` (KLL-sketch-backed), whose state is O(accuracy)
    * per group instead of O(group size). Relative rank error ≤
    * 1/accuracy; results are estimator-specific (no cross-engine oracle).
    */
  def madApprox(df: DataFrame, keys: Seq[String], values: Seq[(String, String)],
                accuracy: Int = 10000): DataFrame = {
    val medAgg = df.groupBy(keys.map(col): _*).agg(
      expr(s"approx_percentile(${values.head._1}, 0.5, $accuracy)").as(s"_med_${values.head._1}"),
      values.tail.map(v =>
        expr(s"approx_percentile(${v._1}, 0.5, $accuracy)").as(s"_med_${v._1}")): _*)
    df.join(broadcast(medAgg), keys)
      .groupBy(keys.map(col): _*)
      .agg(
        expr(s"approx_percentile(abs(${values.head._1} - _med_${values.head._1}), 0.5, $accuracy)")
          .as(values.head._2),
        values.tail.map(v =>
          expr(s"approx_percentile(abs(${v._1} - _med_${v._1}), 0.5, $accuracy)").as(v._2)): _*)
  }

  /** Shannon entropy (log₂) of the value distribution per group:
    * H = log₂(T) - Σ c·log₂(c) / T  — one count aggregate + one sum.
    */
  def entropy(df: DataFrame, keys: Seq[String], valueCol: String, out: String): DataFrame = {
    df.groupBy((keys :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("_c"))
      .groupBy(keys.map(col): _*)
      .agg((log2(sum(col("_c"))) - sum(col("_c") * log2(col("_c"))) / sum(col("_c"))).as(out))
  }

  /** Equi-width binned histogram (reference: equi-width bin variants of
    * histogram, extension/core_functions/aggregate/nested/histogram.cpp):
    * `[lo, hi)` split into `nbins` equal bins, out-of-range values clamp
    * into the edge bins; output is a deterministic "binIndex:count,..."
    * string per group. Pure two-phase hash aggregation — O(groups×bins)
    * state, no per-group value buffering.
    */
  def histogramEquiWidth(df: DataFrame, keys: Seq[String], valueCol: String,
                         lo: Double, hi: Double, nbins: Int, out: String): DataFrame = {
    require(nbins > 0 && hi > lo)
    val width = (hi - lo) / nbins
    val bin = least(lit(nbins - 1),
      greatest(lit(0), floor((col(valueCol) - lit(lo)) / lit(width)))).cast("int")
    df.withColumn("_bin", bin)
      .groupBy((keys.map(col) :+ col("_bin")): _*)
      .agg(count(lit(1)).as("_c"))
      .groupBy(keys.map(col): _*)
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("_bin").as("k"), col("_c").as("c")))),
          s => concat(s.getField("k").cast("string"), lit(":"), s.getField("c").cast("string"))),
        ",").as(out))
  }

  /** histogram(x) per group, encoded as a deterministic "k:c,..." string
    * sorted by key (map columns don't compare stably across engines).
    */
  def histogramString(df: DataFrame, keys: Seq[String], valueCol: String, out: String): DataFrame = {
    df.groupBy((keys :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("_c"))
      .groupBy(keys.map(col): _*)
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col(valueCol).as("k"), col("_c").as("c")))),
          s => concat(s.getField("k").cast("string"), lit(":"), s.getField("c").cast("string"))),
        ",").as(out))
  }
}
