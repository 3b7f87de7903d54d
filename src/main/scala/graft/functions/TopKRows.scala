package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.catalyst.expressions.{Ascending, NullsFirst}
import org.apache.spark.sql.types._

/** One retained row of a [[TopKRowsAgg]] group state: the evaluated
  * sort key (its own little UnsafeRow, so merge/final never needs to
  * re-bind the order expressions against a buffer-schema row) and the
  * full payload row. Both are private copies.
  */
final class TopKEntry(val keys: UnsafeRow, val row: UnsafeRow)

/** Bounded top-k group state: entries sorted best-first (the row_number
  * order), size capped at k. Insertion is compare-against-worst fast
  * reject then a linear insert — k is small (rule caps it at 128).
  */
final class TopKBuf(val k: Int) {
  val entries = new Array[TopKEntry](k)
  var n: Int = 0
}

/** Grouped top-k as an aggregate — the engine's replacement for the
  * sort-everything plan Spark gives `row_number() OVER (PARTITION BY p
  * ORDER BY o) <= k` (a per-partition Sort + WindowGroupLimit + an
  * exchange + a second full Sort + WindowExec). This keeps a k-bounded
  * best-first buffer per group (insert = one compare against the
  * current worst for the overwhelming reject path), merges buffers
  * associatively, and emits the rows as a sorted struct array that
  * [[graft.rules.WindowTopKToAgg]] explodes back into rows with
  * `row_number = pos + 1`. Semantically exact for row_number: among
  * order-by ties row_number's pick is already engine-order-dependent,
  * and this operator keeps exactly k rows in order-by order, the same
  * guarantee. The reference reaches the same shape through its
  * perfect-order heap in physical_window (no full sort for rank-limit
  * patterns at small k); on a cluster the win compounds — the partial
  * side ships at most k rows per group per partition instead of a
  * sorted whole-partition stream.
  *
  * `payload` must be the window child's full output IN ORDER (the rule
  * guarantees it) so the update-side input row layout and the stored
  * payload layout coincide; `orders` are the window's sort orders over
  * those attributes.
  */
case class TopKRowsAgg(
    k: Int,
    payload: Seq[Expression],
    orders: Seq[SortOrder],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] {

  override def children: Seq[Expression] = payload ++ orders

  override def nullable: Boolean = false

  private lazy val structType: StructType =
    StructType(payload.zipWithIndex.map { case (e, i) =>
      val name = e match {
        case a: Attribute => a.name
        case _ => s"c$i"
      }
      StructField(name, e.dataType, e.nullable)
    })

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def prettyName: String = "graft_top_k_rows"

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  // projections build lazily AFTER the exec binds this instance's
  // expressions, so they close over bound references
  @transient private lazy val payloadProj = UnsafeProjection.create(payload)
  @transient private lazy val keysProj =
    UnsafeProjection.create(orders.map(_.child))

  private lazy val keyTypes: Array[DataType] =
    orders.map(_.child.dataType).toArray
  private lazy val descending: Array[Boolean] =
    orders.map(_.direction != Ascending).toArray
  private lazy val nullsFirst: Array[Boolean] =
    orders.map(_.nullOrdering == NullsFirst).toArray

  /** Per-field non-null comparator reading TYPED getters — the update
    * path runs one of these per input row (the reject compare), so no
    * per-compare boxing is allowed. Generic fallback only for the
    * non-primitive orderable types.
    */
  @transient private lazy val fieldCmp: Array[(InternalRow, InternalRow, Int) => Int] =
    keyTypes.map {
      case DoubleType => (a: InternalRow, b: InternalRow, i: Int) =>
        java.lang.Double.compare(a.getDouble(i), b.getDouble(i))
      case FloatType => (a: InternalRow, b: InternalRow, i: Int) =>
        java.lang.Float.compare(a.getFloat(i), b.getFloat(i))
      case LongType | TimestampType | TimestampNTZType =>
        (a: InternalRow, b: InternalRow, i: Int) =>
          java.lang.Long.compare(a.getLong(i), b.getLong(i))
      case IntegerType | DateType => (a: InternalRow, b: InternalRow, i: Int) =>
        Integer.compare(a.getInt(i), b.getInt(i))
      case ShortType => (a: InternalRow, b: InternalRow, i: Int) =>
        java.lang.Short.compare(a.getShort(i), b.getShort(i))
      case ByteType => (a: InternalRow, b: InternalRow, i: Int) =>
        java.lang.Byte.compare(a.getByte(i), b.getByte(i))
      case BooleanType => (a: InternalRow, b: InternalRow, i: Int) =>
        java.lang.Boolean.compare(a.getBoolean(i), b.getBoolean(i))
      case StringType => (a: InternalRow, b: InternalRow, i: Int) =>
        a.getUTF8String(i).compareTo(b.getUTF8String(i))
      case dt =>
        val ord = TypeUtils.getInterpretedOrdering(dt).asInstanceOf[Ordering[Any]]
        (a: InternalRow, b: InternalRow, i: Int) => ord.compare(a.get(i, dt), b.get(i, dt))
    }

  /** row_number ordering over evaluated key rows: negative = a first. */
  private def cmpKeys(a: InternalRow, b: InternalRow): Int = {
    var i = 0
    while (i < keyTypes.length) {
      val an = a.isNullAt(i)
      val bn = b.isNullAt(i)
      if (an || bn) {
        if (!an || !bn) return if (an == nullsFirst(i)) -1 else 1
      } else {
        val c = fieldCmp(i)(a, b, i)
        if (c != 0) return if (descending(i)) -c else c
      }
      i += 1
    }
    0
  }

  private def insert(buf: TopKBuf, keys: UnsafeRow, rowOf: () => UnsafeRow): Unit = {
    if (buf.n == buf.k && cmpKeys(keys, buf.entries(buf.n - 1).keys) >= 0) return
    // find insertion point from the end (stable: ties keep arrival order,
    // matching row_number's pick-any-among-ties semantics)
    var i = if (buf.n == buf.k) buf.n - 1 else buf.n
    while (i > 0 && cmpKeys(keys, buf.entries(i - 1).keys) < 0) i -= 1
    val e = new TopKEntry(keys.copy(), rowOf())
    var j = if (buf.n == buf.k) buf.n - 1 else buf.n
    while (j > i) { buf.entries(j) = buf.entries(j - 1); j -= 1 }
    buf.entries(i) = e
    if (buf.n < buf.k) buf.n += 1
  }

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    insert(buf, keysProj(input), () => payloadProj(input).copy())
    buf
  }

  override def merge(buf: TopKBuf, other: TopKBuf): TopKBuf = {
    var i = 0
    while (i < other.n) {
      val e = other.entries(i)
      // entries from a deserialized buffer are already private copies
      insert(buf, e.keys, () => e.row)
      i += 1
    }
    buf
  }

  override def eval(buf: TopKBuf): Any = {
    val out = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) { out(i) = buf.entries(i).row; i += 1 }
    new GenericArrayData(out)
  }

  private val keyFieldCount = orders.length
  private val payloadFieldCount = payload.length

  override def serialize(buf: TopKBuf): Array[Byte] = {
    var size = 4
    var i = 0
    while (i < buf.n) {
      size += 8 + buf.entries(i).keys.getSizeInBytes +
        buf.entries(i).row.getSizeInBytes
      i += 1
    }
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putInt(buf.n)
    i = 0
    while (i < buf.n) {
      val e = buf.entries(i)
      bb.putInt(e.keys.getSizeInBytes)
      e.keys.writeTo(bb)
      bb.putInt(e.row.getSizeInBytes)
      e.row.writeTo(bb)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new TopKBuf(k)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val kl = bb.getInt
      // UnsafeRow over a heap byte array addresses via
      // Platform.BYTE_ARRAY_OFFSET + position
      val keys = new UnsafeRow(keyFieldCount)
      keys.pointTo(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + bb.position(), kl)
      bb.position(bb.position() + kl)
      val rl = bb.getInt
      val row = new UnsafeRow(payloadFieldCount)
      row.pointTo(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + bb.position(), rl)
      bb.position(bb.position() + rl)
      buf.entries(i) = new TopKEntry(keys, row)
      i += 1
    }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKRowsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKRowsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TopKRowsAgg =
    copy(payload = c.take(payload.length),
      orders = c.drop(payload.length).map(_.asInstanceOf[SortOrder]))
}
