package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Positional join — align two DataFrames row-by-row, padding the shorter
  * side with NULLs (reference:
  * /root/reference/src/execution/operator/join/physical_positional_join.cpp).
  *
  * Spark has no row-identity across a shuffle, so position must be made
  * explicit. `monotonically_increasing_id` encodes (partition id << 33 |
  * offset-in-partition); one tiny aggregation job collects per-partition
  * counts, and contiguous global positions are then pure column
  * arithmetic — the data path stays inside Tungsten/whole-stage codegen
  * (the previous `rdd.zipWithIndex` dropped every row through an
  * InternalRow→Row→InternalRow round-trip). Callers that need a
  * *semantic* order (not file order) must sort first.
  */
object PositionalJoin {

  private val LocalMask = (1L << 33) - 1

  private def indexed(df: DataFrame, idx: String): DataFrame = {
    val withMid = df.withColumn("_mid", monotonically_increasing_id())
    // per-partition row counts -> cumulative start offsets (k = #partitions
    // values; the collect is the same metadata-sized job zipWithIndex runs)
    val counts = withMid
      .groupBy(shiftright(col("_mid"), 33).as("_pid"))
      .agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.map(_._1).zip(counts.scanLeft(0L)(_ + _._2).init).toMap
    val offsetExpr = typedlit(offsets)
    withMid
      .withColumn(idx,
        element_at(offsetExpr, shiftright(col("_mid"), 33)) +
          col("_mid").bitwiseAND(lit(LocalMask)))
      .drop("_mid")
  }

  def apply(left: DataFrame, right: DataFrame): DataFrame = {
    val l = indexed(left, "_pos_l")
    val r = indexed(right, "_pos_r")
    l.join(r, col("_pos_l") === col("_pos_r"), "full_outer")
      .withColumn("pos", coalesce(col("_pos_l"), col("_pos_r")) + 1)
      .drop("_pos_l", "_pos_r")
  }
}
