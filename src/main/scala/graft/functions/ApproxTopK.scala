package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, NumericType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Space-Saving heavy-hitters sketch (Metwally et al.) — the reference's
  * `approx_top_k` (/root/reference/extension/core_functions/aggregate/
  * holistic/approx_top_k.cpp), implemented as a Catalyst
  * `TypedImperativeAggregate`: a mutable sketch buffer with
  * update/merge/serialize, the state protocol SURVEY §2.9 maps from the
  * reference's AggregateFunction (state_size/update/combine/finalize).
  *
  * Capacity is 4k counters; when the input's distinct count stays within
  * capacity the result is exact (deterministic, oracle-checkable).
  * Output: "value:count,..." for the top k (count desc, value asc).
  */
case class ApproxTopKSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, (Long, Long)]] {

  private val capacity = 4 * k

  /** Count ties break in the CHILD's type order (numeric children compare
    * numerically — "10" sorts after "2"), matching the exact
    * count+window rewrite the oracle runs; lexicographic order of the
    * rendered value would diverge for multi-digit numbers.
    *
    * Double/Float children can render non-decimal strings ("NaN",
    * "Infinity") that BigDecimal rejects; those fall back to string order
    * (before all finite values) so the ordering is total and never throws.
    */
  private lazy val keyOrdering: Ordering[String] = child.dataType match {
    case _: NumericType =>
      Ordering.by { (s: String) => (scala.util.Try(BigDecimal(s)).toOption, s) }(
        Ordering.Tuple2(Ordering.Option(Ordering.BigDecimal), Ordering.String))
    case _ => Ordering.String
  }
  private lazy val entryOrdering: Ordering[(String, (Long, Long))] =
    Ordering.by[(String, (Long, Long)), Long] { case (_, (c, _)) => -c }
      .orElse(Ordering.by[(String, (Long, Long)), String](_._1)(keyOrdering))

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override def prettyName: String = "approx_top_k"

  override def createAggregationBuffer(): mutable.HashMap[String, (Long, Long)] =
    mutable.HashMap.empty

  private def add(buf: mutable.HashMap[String, (Long, Long)],
                  key: String, count: Long, err: Long): Unit = {
    buf.get(key) match {
      case Some((c, e)) => buf(key) = (c + count, e + err)
      case None if buf.size < capacity => buf(key) = (count, err)
      case None =>
        // evict the minimum counter; new key inherits its count as error
        val (mk, (mc, _)) = buf.minBy { case (kk, (c, _)) => (c, kk) }(
          Ordering.Tuple2(Ordering.Long, keyOrdering))
        buf.remove(mk)
        buf(key) = (mc + count, mc + err)
    }
  }

  override def update(buf: mutable.HashMap[String, (Long, Long)],
                      input: InternalRow): mutable.HashMap[String, (Long, Long)] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.toString, 1L, 0L)
    buf
  }

  override def merge(buf: mutable.HashMap[String, (Long, Long)],
                     other: mutable.HashMap[String, (Long, Long)]): mutable.HashMap[String, (Long, Long)] = {
    other.toSeq.sorted(entryOrdering)
      .foreach { case (kk, (c, e)) => add(buf, kk, c, e) }
    buf
  }

  override def eval(buf: mutable.HashMap[String, (Long, Long)]): Any = {
    val top = buf.toSeq.sorted(entryOrdering).take(k)
    UTF8String.fromString(top.map { case (kk, (c, _)) => s"$kk:$c" }.mkString(","))
  }

  override def serialize(buf: mutable.HashMap[String, (Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (kk, (c, e)) => out.writeUTF(kk); out.writeLong(c); out.writeLong(e) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, (Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, (Long, Long)]
    (0 until n).foreach { _ => val kk = in.readUTF(); buf(kk) = (in.readLong(), in.readLong()) }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): ApproxTopKSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ApproxTopKSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object ApproxTopKSketch {
  def approx_top_k(c: Column, k: Int): Column =
    bridge.column(ApproxTopKSketch(bridge.expression(c), k)
      .toAggregateExpression(isDistinct = false))
}
