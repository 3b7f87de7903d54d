package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalable band (range-interval) join — the single-inequality-pair shape
  * the reference executes with a piecewise merge join / IEJoin
  * (/root/reference/src/execution/physical_plan/plan_comparison_join.cpp:41-103,
  * physical_iejoin.cpp); Spark's only built-in plan for it is a
  * (broadcast) nested-loop join, which is quadratic in the fact×fact
  * case — the engine's last known scale-killer shape.
  *
  * Rewrite: for pairs with `right.key ∈ [left.key + lo, left.key + hi]`,
  * quantize both sides into fixed-width value buckets of width
  * `w = hi - lo` (the interval hull). A right row lands in exactly ONE
  * bucket; a left row's interval spans two consecutive buckets, so the
  * left side explodes, the sides EQUI-join on the bucket id, and the
  * exact predicate filters the within-bucket candidates. Each matching
  * pair is emitted exactly once (the right row's bucket is unique and the
  * left's exploded bucket ids are distinct), so no distinct is needed.
  *
  * Bucket-id arithmetic: when both keys are integral and the interval
  * endpoints are whole numbers, bucket ids are computed in EXACT decimal
  * floor-division (`(a - pmod(a, w)) / w` — the numerator is exactly
  * divisible, so no rounding can occur) and the left side explodes to the
  * tight 2 buckets. For fractional keys the ids come from double
  * division, where a key within an ulp of a bucket boundary can floor to
  * either side on the two sides of the join independently; the left side
  * absorbs that by exploding to `lb-1 .. lb+2` (the 4 buckets that bound
  * every ±1-ulp disagreement a genuine match can produce — offsets -2 and
  * +3 require the pair to be ~w apart from the hull, i.e. a non-match).
  *
  * Scale: one hash shuffle per side on the bucket id — O(n) — with
  * candidate count O(matches + rows·density) instead of O(n²); a skewed
  * value window (many rows inside one w-wide span) is ordinary join skew,
  * handled by AQE skew splitting / salting like any hot key. This is the
  * DataFrame-algebra form of the range-bucket strategy SURVEY §2.3
  * reserves; open/closed interval endpoints are enforced by the exact
  * predicate, the buckets only need to cover the closed hull.
  */
object RangeJoin {

  private def isIntegral(df: DataFrame, key: String): Boolean =
    df.schema(key).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }

  private def isWhole(x: Double): Boolean = x == math.floor(x) && !x.isInfinite

  /** Exact floor-division bucket id for integral keys: pmod makes the
    * numerator exactly divisible by w, so the decimal division is exact
    * and the cast truncation is a no-op.
    */
  private def exactBucket(key: Column, off: Long, w: Long): Column = {
    val a = key.cast(DecimalType(38, 0)) + lit(off)
    ((a - pmod(a, lit(w))) / lit(w)).cast("long")
  }

  /** Candidate pairs before the exact predicate (exposed for the
    * sub-quadratic candidate-count pin in RangeJoinSpec).
    * Columns: left.* ++ right.*; both sides must share no column names.
    */
  private[graft] def bandCandidates(left: DataFrame, right: DataFrame,
                                    leftKey: String, rightKey: String,
                                    lo: Double, hi: Double): DataFrame = {
    require(hi > lo, s"band interval must have positive width, got [$lo, $hi]")
    require(!(left.columns ++ right.columns).contains("__band_bucket"),
      "__band_bucket is reserved by RangeJoin")
    val exact = isIntegral(left, leftKey) && isIntegral(right, rightKey) &&
      isWhole(lo) && isWhole(hi)
    if (exact) {
      val w = (hi - lo).toLong
      val lb = exactBucket(col(leftKey), lo.toLong, w)
      val l = left.withColumn("__band_bucket", explode(array(lb, lb + lit(1L))))
      val r = right.withColumn("__band_bucket", exactBucket(col(rightKey), 0L, w))
      l.join(r, "__band_bucket").drop("__band_bucket")
    } else {
      val w = hi - lo
      // the lb-1..lb+2 explode absorbs ≤1 bucket of floor/rounding error
      // per side; that bound only holds while the quotient stays below
      // 2^51 (beyond it one ulp of key/w exceeds a whole bucket and a
      // genuine match could silently fall outside the window). Guard
      // loudly instead of returning an incomplete join.
      def checkedQuotient(q: Column): Column =
        when(abs(q) > lit(2251799813685248.0), // 2^51
          raise_error(concat(lit("RangeJoin: |key/width| exceeds 2^51 ("),
            q.cast("string"),
            lit(") — double bucketing can drop matches; rescale the keys"))))
          .otherwise(q)
      val lb = floor(checkedQuotient((col(leftKey) + lit(lo)) / lit(w))).cast("long")
      val l = left.withColumn("__band_bucket",
        explode(array(lb - lit(1L), lb, lb + lit(1L), lb + lit(2L))))
      val r = right.withColumn("__band_bucket",
        floor(checkedQuotient(col(rightKey) / lit(w))).cast("long"))
      l.join(r, "__band_bucket").drop("__band_bucket")
    }
  }

  /** Inner band join: pairs where `cond` holds, with candidate generation
    * restricted to `right.key` within the closed hull
    * `[left.key + lo, left.key + hi]`. `cond` is the EXACT predicate
    * (may be any open/closed/compound refinement of the hull).
    */
  def band(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           lo: Double, hi: Double, cond: Column): DataFrame =
    bandCandidates(left, right, leftKey, rightKey, lo, hi).filter(cond)
}
