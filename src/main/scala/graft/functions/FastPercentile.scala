package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Growable primitive double buffer — the aggregation state of
  * [[FastPercentileAgg]]. Plain flat array, no boxing.
  */
final class DoubleBuf(var arr: Array[Double], var n: Int) {
  def this() = this(new Array[Double](16), 0)
  def add(v: Double): Unit = {
    if (n == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
    arr(n) = v; n += 1
  }
  def merge(o: DoubleBuf): Unit = {
    if (n + o.n > arr.length)
      arr = java.util.Arrays.copyOf(arr, math.max(arr.length * 2, n + o.n))
    System.arraycopy(o.arr, 0, arr, n, o.n)
    n += o.n
  }
}

/** Exact percentile over a numeric column with unit frequency — the
  * flat-array twin of Spark's `Percentile`, whose aggregation state is
  * an OpenHashMap[boxed value → count] (one boxed key + hash probe per
  * row, boxed iteration + sort at eval). This buffers primitive doubles
  * and sorts once per group at eval; interpolation uses the
  * CONVEX-COMBINATION spelling `(1 - frac) * lower + frac * higher` —
  * the exact sequence of FP ops Spark's Percentile.getPercentile
  * executes for unit frequencies — so results are bit-identical. Do NOT
  * "simplify" to `lower + (higher - lower) * frac`: the two spellings
  * differ in the last ulp and flipped 238/10,000 oracle rounding edges
  * when tried (see eval() comment + PERF.md r13). The reference's
  * quantile_cont materializes per-group value vectors the same way
  * (src/core_functions/aggregate/holistic/quantile.cpp).
  *
  * Routed by [[graft.rules.FastPercentileRule]] for foldable
  * percentage(s) and frequency 1.
  */
case class FastPercentileAgg(
    child: Expression,
    percentages: Seq[Double],
    returnArray: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DoubleBuf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType =
    if (returnArray) ArrayType(DoubleType, containsNull = false) else DoubleType
  override def prettyName: String = "fast_percentile"

  override def createAggregationBuffer(): DoubleBuf = new DoubleBuf()

  private lazy val toDouble: Any => Double = child.dataType match {
    case DoubleType => v => v.asInstanceOf[Double]
    case FloatType => v => v.asInstanceOf[Float].toDouble
    case IntegerType | DateType => v => v.asInstanceOf[Int].toDouble
    case LongType => v => v.asInstanceOf[Long].toDouble
    case ShortType => v => v.asInstanceOf[Short].toDouble
    case ByteType => v => v.asInstanceOf[Byte].toDouble
    case d: DecimalType => v => v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble
  }

  override def update(buf: DoubleBuf, input: InternalRow): DoubleBuf = {
    val v = child.eval(input)
    if (v != null) buf.add(toDouble(v))
    buf
  }

  override def merge(buf: DoubleBuf, other: DoubleBuf): DoubleBuf = {
    buf.merge(other); buf
  }

  override def eval(buf: DoubleBuf): Any = {
    // Percentile.generateOutput returns null for an empty group in BOTH
    // the scalar and array forms (pinned by FastPercentileSpec)
    if (buf.n == 0) return null
    val a = java.util.Arrays.copyOf(buf.arr, buf.n)
    java.util.Arrays.sort(a)
    def at(p: Double): Double = {
      // Percentile.getPercentile's formula for unit frequencies — the
      // CONVEX-COMBINATION spelling, not lo + (hi-lo)*f: the two differ
      // in the last ulp and the oracle gates round at FP boundaries
      val pos = p * (a.length - 1)
      val lo = math.floor(pos).toInt
      val hi = math.ceil(pos).toInt
      val frac = pos - lo
      if (lo == hi) a(lo) else (1.0 - frac) * a(lo) + frac * a(hi)
    }
    if (returnArray) new GenericArrayData(percentages.map(at(_): Any).toArray)
    else at(percentages.head)
  }

  override def serialize(buf: DoubleBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): DoubleBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val arr = new Array[Double](math.max(n, 16))
    var i = 0
    while (i < n) { arr(i) = bb.getDouble; i += 1 }
    new DoubleBuf(arr, n)
  }

  override def withNewMutableAggBufferOffset(o: Int): FastPercentileAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FastPercentileAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): FastPercentileAgg = copy(child = c.head)
}
