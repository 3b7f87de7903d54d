package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salting for skewed equi-joins — the manual fallback when AQE's
  * runtime skew splitting (spark.sql.adaptive.skewJoin, enabled in
  * GraftSession.tune) can't apply: e.g. a skewed *aggregation* key, or a
  * shuffle join against a side too large to broadcast where one key
  * holds a double-digit percentage of all rows.
  *
  * The big (skewed) side gets a random salt in [0, buckets); the small
  * side is replicated `buckets` times with every salt value. The join key
  * becomes (key, salt), spreading each hot key over `buckets` reducers.
  * Replication costs buckets× the small side — use only when skew is
  * real and the small side is modest (but above broadcast threshold).
  */
object SkewJoin {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 buckets: Int = 16, joinType: String = "inner"): DataFrame = {
    // right/full outer would emit each unmatched small-side row once per
    // salt replica (buckets× duplicates); restrict to the types where
    // replication is sound
    val ok = Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi")
    require(ok.contains(joinType.toLowerCase.replace("_", "")) ||
      ok.contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left/left_semi join types, got $joinType " +
        "(unmatched small-side rows would be duplicated once per salt bucket)")
    val salted = big.withColumn("_salt", (rand(42) * buckets).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Skew-safe aggregation: two-phase groupBy where the first phase
    * groups on (key, salt) so one hot key fans out over many reducers,
    * and the second phase merges the per-salt partials.
    * `aggs` maps input column → (partial agg, merge agg) is fixed to the
    * common reaggregatable set: sum and count (avg derivable).
    */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
                     buckets: Int = 16): DataFrame = {
    df.withColumn("_salt", (rand(42) * buckets).cast("int"))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_s"), count(lit(1)).as("_c"))
      .groupBy(col(key))
      .agg(sum(col("_s")).as(s"sum_$valueCol"), sum(col("_c")).as("n"))
  }
}
