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

  /** TWO-inequality join (IEJoin class):
    * `left.x <(=) right.x AND left.y >(=) right.y` — the interval-overlap
    * / crossing-pairs shape Spark can only plan as a nested-loop join
    * (reference: src/execution/operator/join/physical_iejoin.cpp,
    * Khayyat et al.'s IEJoin; planned for exactly-2-inequality joins in
    * plan_comparison_join.cpp).
    *
    * Distributed structure (the paper's block decomposition,
    * re-expressed Spark-first):
    *  1. `blocks` quantile boundaries on x over BOTH sides (one
    *     approxQuantile pass) assign each row a block — balanced by
    *     construction, skew-safe.
    *  2. Per-(side, block) min/max of x and y — a metadata-sized
    *     aggregate collected to the driver (like PositionalJoin's
    *     offsets) — prune the B² block pairs to those whose ranges can
    *     satisfy BOTH inequalities.
    *  3. Each side broadcast-joins its feasible pair ids (a row lands in
    *     ONE block, so each (l, r) meets in at most one pair — no dedup),
    *     both sides shuffle once on pair id.
    *  4. Per pair, a sweep kernel: sort by x, insert left rows into an
    *     ordered-by-y structure as the x pointer passes them, enumerate
    *     `y > b.y` via a tail view — O(k log k + output) per pair, never
    *     a cross product.
    *
    * Valves/limits: replication is bounded by the feasible pairs per
    * block (≤ `blocks`; metadata pruning keeps it near the diagonal for
    * correlated keys). A pair's rows must fit in one task — raise
    * `blocks` for bigger inputs.
    *
    * Exactness: the sweep orders keys as doubles, which collapses
    * distinct int64/decimal values beyond 2^53 — so the sweep and the
    * block pruning both run NON-strict (a monotone cast guarantees
    * `a < b ⇒ d(a) <= d(b)`, making the double-keyed candidates a
    * SUPERSET of the true matches) and the exact typed predicate on the
    * original columns is re-applied as a final filter. −0.0 keys are
    * normalized to 0.0 on insert and probe (java.lang.Double orders
    * −0.0 below 0.0; SQL says they are equal). Rows with NULL keys
    * never match and are filtered; NaN keys are unsupported (the
    * double sweep and Spark's NaN total order disagree).
    * Column names must be disjoint across sides.
    */
  def ieJoin(left: DataFrame, right: DataFrame,
             leftX: String, rightX: String, strictX: Boolean,
             leftY: String, rightY: String, strictY: Boolean,
             blocks: Int = 32): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.StructType
    require(left.columns.intersect(right.columns).isEmpty,
      "ieJoin requires disjoint column names")
    val spark = left.sparkSession
    val l0 = left.filter(col(leftX).isNotNull && col(leftY).isNotNull)
    val r0 = right.filter(col(rightX).isNotNull && col(rightY).isNotNull)

    // 1. shared block boundaries on x (quantiles of the union)
    val probs = (1 until blocks).map(_.toDouble / blocks).toArray
    val bnd: Array[Double] =
      if (probs.isEmpty) Array.empty
      else l0.select(col(leftX).cast("double").as("__x"))
        .unionAll(r0.select(col(rightX).cast("double").as("__x")))
        .stat.approxQuantile("__x", probs, 0.001).distinct.sorted
    def blockExpr(key: Column): Column =
      bnd.zipWithIndex.foldRight(lit(bnd.length)) { case ((b, i), rest) =>
        when(key.cast("double") <= lit(b), lit(i)).otherwise(rest)
      }

    val l1 = l0.withColumn("__blk", blockExpr(col(leftX)))
    val r1 = r0.withColumn("__blk", blockExpr(col(rightX)))

    // 2. per-block metadata -> feasible pairs (driver; ≤ 2·blocks rows)
    def summary(df: DataFrame, x: String, y: String): Map[Int, (Double, Double, Double, Double)] =
      df.groupBy(col("__blk"))
        .agg(min(col(x).cast("double")), max(col(x).cast("double")),
          min(col(y).cast("double")), max(col(y).cast("double")))
        .collect()
        .map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
        .toMap
    val lsum = summary(l1, leftX, leftY)
    val rsum = summary(r1, rightX, rightY)
    val pairs: Seq[(Int, Int, Int)] = { // (pairId, lb, rb)
      val b = Seq.newBuilder[(Int, Int, Int)]
      var id = 0
      for ((lb, (lMinX, _, _, lMaxY)) <- lsum.toSeq.sortBy(_._1);
           (rb, (_, rMaxX, rMinY, _)) <- rsum.toSeq.sortBy(_._1)) {
        // non-strict even under strict predicates: double min/max may
        // collapse adjacent exact values, so pruning must keep any pair
        // the exact predicate could match (candidates are a superset;
        // the exact post-filter settles strictness)
        val xOk = lMinX <= rMaxX
        val yOk = lMaxY >= rMinY
        if (xOk && yOk) { b += ((id, lb, rb)); id += 1 }
      }
      b.result()
    }
    if (pairs.isEmpty)
      return left.limit(0).crossJoin(right.limit(0))

    // 3. replicate each side to its feasible pairs (broadcast pair list),
    // shuffle both on pair id
    import spark.implicits._
    val lPairs = broadcast(pairs.map(p => (p._1, p._2)).toDF("__pid", "__lb"))
    val rPairs = broadcast(pairs.map(p => (p._1, p._3)).toDF("__pid", "__rb"))
    val lTagged = l1.join(lPairs, col("__blk") === col("__lb"))
      .select(col("__pid") +: col(leftX).cast("double").as("__x") +:
        col(leftY).cast("double").as("__y") +: left.columns.map(col): _*)
    val rTagged = r1.join(rPairs, col("__blk") === col("__rb"))
      .select(col("__pid") +: col(rightX).cast("double").as("__x") +:
        col(rightY).cast("double").as("__y") +: right.columns.map(col): _*)
    val parts = math.max(pairs.size, spark.sessionState.conf.numShufflePartitions)
    val part = new org.apache.spark.HashPartitioner(parts)
    def keyed(df: DataFrame) =
      df.rdd.map(r => (r.getInt(0), r))
    // 4. per-pair sweep: L sorted by x feeds an ordered-by-y multimap as
    // the R pointer (also x-sorted) passes; tail enumeration emits
    // CANDIDATES. Both bounds run NON-strict here (even when the
    // predicate is strict) so double rounding beyond 2^53 can only add
    // false positives, never drop a true match — the exact typed filter
    // below settles strictness. Keys normalize −0.0 → 0.0 (TreeMap's
    // Double order puts −0.0 below 0.0; SQL equates them).
    def normKey(v: Double): Double = if (v == 0.0) 0.0 else v
    val joined = keyed(lTagged).cogroup(keyed(rTagged), part).flatMap {
      case (_, (lIt, rIt)) =>
        val lArr = lIt.toArray.sortBy(_.getDouble(1))
        val rArr = rIt.toArray.sortBy(_.getDouble(1))
        if (lArr.isEmpty || rArr.isEmpty) Iterator.empty
        else {
          val ys = new java.util.TreeMap[Double, java.util.ArrayList[Row]]()
          var i = 0
          rArr.iterator.flatMap { b =>
            val bx = b.getDouble(1)
            while (i < lArr.length && lArr(i).getDouble(1) <= bx) {
              val l = lArr(i)
              val k = normKey(l.getDouble(2))
              var list = ys.get(k)
              if (list == null) { list = new java.util.ArrayList[Row](1); ys.put(k, list) }
              list.add(l)
              i += 1
            }
            val tail = ys.tailMap(normKey(b.getDouble(2)), true)
            val out = Seq.newBuilder[Row]
            val it = tail.values().iterator()
            while (it.hasNext) {
              val bucket = it.next()
              var j = 0
              while (j < bucket.size()) {
                val l = bucket.get(j)
                out += Row.fromSeq(
                  l.toSeq.drop(3) ++ b.toSeq.drop(3))
                j += 1
              }
            }
            out.result()
          }
        }
    }
    // exact post-filter on the ORIGINAL typed columns: the double sweep
    // produced a candidate superset; this settles strictness and any
    // beyond-2^53 collapse (cheap — candidates only)
    val xCond = if (strictX) col(leftX) < col(rightX) else col(leftX) <= col(rightX)
    val yCond = if (strictY) col(leftY) > col(rightY) else col(leftY) >= col(rightY)
    spark.createDataFrame(joined,
        StructType(left.schema.fields ++ right.schema.fields))
      .filter(xCond && yCond)
  }
}
