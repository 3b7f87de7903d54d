package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Positional join — align two DataFrames row-by-row, padding the shorter
  * side with NULLs (reference:
  * /root/reference/src/execution/operator/join/physical_positional_join.cpp).
  *
  * Spark has no row-identity across a shuffle, so position must be made
  * explicit. `zipWithIndex` computes per-partition offsets with one tiny
  * job (a count per partition — no global sort, no single-partition
  * collapse), then the two sides equi-join on the index. Callers that
  * need a *semantic* order (not file order) must sort first.
  */
object PositionalJoin {

  private def indexed(df: DataFrame, idx: String): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema.add(idx, LongType, nullable = false)
    val rdd = df.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    spark.createDataFrame(rdd, schema)
  }

  def apply(left: DataFrame, right: DataFrame): DataFrame = {
    val l = indexed(left, "_pos_l")
    val r = indexed(right, "_pos_r")
    l.join(r, col("_pos_l") === col("_pos_r"), "full_outer")
      .withColumn("pos", coalesce(col("_pos_l"), col("_pos_r")) + 1)
      .drop("_pos_l", "_pos_r")
  }
}
