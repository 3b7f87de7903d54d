package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 quantization for embedding columns — the standard
  * memory-reduction path for similarity search at warehouse scale
  * (the shape FAISS ships as its SQ8 scalar quantizer; expressed here
  * as pure DataFrame algebra so Catalyst owns the plan).
  *
  * Symmetric per-vector quantization: `scale = max(|x|) / 127`,
  * `q[i] = round(x[i] / scale)` stored as `array<tinyint>` — 4× smaller
  * than float32, so a 100 TB float corpus becomes a 25 TB index that
  * fits in a quarter of the executor memory, and the scan half of a
  * brute-force search moves 4× less data. Cosine similarity is
  * SCALE-FREE — `cos(a·s_a, b·s_b) = cos(a, b)` — so quantized cosine
  * needs no dequantization at all; inner product re-applies the two
  * stored scales. Quantized vectors are cast back to float for the
  * distance kernel, reusing the codegen'd
  * [[graft.functions.VectorExpressions]] loops (exact over int8 values:
  * every int8 is representable in float32).
  *
  * Composes with the coarse quantizers: IVF ([[IvfAnn]]) prunes the
  * candidate lists, int8 shrinks what the survivors scan — the classic
  * IVF+SQ8 layout. All per-row expressions, no UDFs, no shuffle beyond
  * what the caller's top-k requires.
  */
object VectorQuant {

  /** Replaces `vecCol` with `qvec` (array<tinyint>) + `qscale` (float);
    * every OTHER column passes through untouched — that is what lets the
    * quantizer compose with IvfAnn (the inverted lists' `cid` survives,
    * giving the classic IVF+SQ8 layout). Zero vectors quantize to zeros
    * with scale 0 (dequantizes to zero).
    */
  def quantize(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val maxAbs = aggregate(col(vecCol), lit(0.0f), (acc, x) => greatest(acc, abs(x)))
    df
      // div widens to double in Spark SQL; pin the storage type
      .withColumn("qscale", (maxAbs / lit(127.0f)).cast("float"))
      .withColumn("qvec",
        when(col("qscale") === 0f,
          transform(col(vecCol), _ => lit(0).cast("tinyint")))
          .otherwise(transform(col(vecCol),
            x => round(x / col("qscale")).cast("tinyint"))))
      .drop(vecCol)
  }

  /** Driver-side quantization of a probe vector — BIT-IDENTICAL to
    * [[quantize]]'s formula: Spark promotes float/float division to
    * DOUBLE and its round() is HALF_UP (BigDecimal semantics, away from
    * zero), while float division + math.round diverges both on the
    * arithmetic (a float quotient can land exactly on a half step the
    * double quotient misses) and on negative halves (-2.5 → -2 vs -3).
    * A probe equal to a stored vector must get identical codes.
    */
  def quantizeProbe(v: Seq[Float]): (Seq[Byte], Float) = {
    val maxAbs = v.foldLeft(0f)((a, x) => math.max(a, math.abs(x)))
    val scale = maxAbs / 127f
    if (scale == 0f) (v.map(_ => 0: Byte), 0f)
    else (v.map(x => BigDecimal(x.toDouble / scale.toDouble)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toByte), scale)
  }

  /** Quantized cosine similarity — scale-free, computed on the int8
    * codes alone (cast to float for the codegen'd kernel).
    */
  def cosineQ(qa: Column, qb: Column): Column =
    VectorFunctions.cosine_similarity(qa.cast("array<float>"), qb.cast("array<float>"))

  /** Approximate inner product: the stored scales re-linearize the codes. */
  def innerQ(qa: Column, scaleA: Column, qb: Column, scaleB: Column): Column =
    VectorFunctions.inner_product(qa.cast("array<float>"), qb.cast("array<float>")) *
      scaleA * scaleB

  /** Brute-force top-k by quantized cosine against a float probe.
    * Input must be `quantize` output; the probe is quantized driver-side
    * and broadcast as a literal (bytes, not a join).
    */
  def searchCosine(quantized: DataFrame, idCol: String,
                   probe: Seq[Float], topK: Int): DataFrame = {
    val (qp, _) = quantizeProbe(probe)
    // a zero vector (or zero probe) makes cosine 0/0 = NaN, and Spark
    // orders NaN as the LARGEST double — without the guard every zero
    // row would outrank all genuine neighbors in the descending top-k
    val sim = cosineQ(col("qvec"), typedlit(qp)).cast("double")
    quantized.select(col(idCol),
        when(isnan(sim), lit(Double.NegativeInfinity)).otherwise(sim).as("cos_sim_q"))
      .orderBy(col("cos_sim_q").desc, col(idCol)).limit(topK)
  }
}
