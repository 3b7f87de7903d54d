package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, UnsafeProjection}
import org.apache.spark.sql.columnar.{CachedBatch, CachedBatchSerializer}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarArray, ColumnarBatch, ColumnarMap}
import org.apache.spark.storage.StorageLevel
import org.apache.spark.unsafe.types.UTF8String

/** Vectorized in-memory columnar cache for the graft engine.
  *
  * Spark's default cached-batch serializer compresses values into column
  * byte buffers and can only serve them back *vectorized* when every column
  * is a primitive type — a schema with one string column falls back to
  * value-at-a-time row decoding, which dominates warm query time on
  * OLAP-shaped tables (TPC-H lineitem: `l_returnflag`/`l_linestatus`).
  *
  * This serializer stores cached batches as plain JVM primitive arrays
  * (strings/binary as one contiguous blob + offsets, the layout the
  * reference engine uses for its in-memory string vectors — see
  * /root/reference/src/include/duckdb/common/types/vector.hpp) and serves
  * them zero-copy through a [[ColumnVector]] view, so scans of cached
  * tables stay columnar end-to-end for ALL atomic types. Schemas with
  * nested/exotic columns fall back to cached UnsafeRows — correct, just
  * not vectorized.
  *
  * At scale this is the same trade Spark's own cache makes: batches live
  * in the block manager, spill to disk (all fields are Java-serializable
  * primitive arrays), and re-materialize by recomputing the source scan.
  * Enabled via `spark.sql.cache.serializer` (GraftSession.tune).
  */
class GraftCacheSerializer extends CachedBatchSerializer {

  import GraftCacheSerializer._

  override def supportsColumnarInput(schema: Seq[Attribute]): Boolean = false

  override def convertColumnarBatchToCachedBatch(
      input: RDD[ColumnarBatch], schema: Seq[Attribute],
      storageLevel: StorageLevel, conf: SQLConf): RDD[CachedBatch] =
    throw new UnsupportedOperationException("columnar input is declined above")

  override def convertInternalRowToCachedBatch(
      input: RDD[InternalRow], schema: Seq[Attribute],
      storageLevel: StorageLevel, conf: SQLConf): RDD[CachedBatch] = {
    val types = schema.map(_.dataType).toArray
    val batchSize = conf.columnBatchSize
    if (types.forall(vectorizable)) {
      input.mapPartitions ({ rows =>
        new Iterator[CachedBatch] {
          override def hasNext: Boolean = rows.hasNext
          override def next(): CachedBatch = {
            val builders = types.map(ColumnBuilder(_, batchSize))
            var n = 0
            while (rows.hasNext && n < batchSize) {
              val row = rows.next()
              var i = 0
              while (i < builders.length) { builders(i).append(row, i); i += 1 }
              n += 1
            }
            VectorCachedBatch(n, builders.map(_.result()))
          }
        }
      }, preservesPartitioning = true)
    } else {
      // fallback: copy rows as UnsafeRows (serializable, exact)
      val schemaSeq = schema.map(_.dataType)
      input.mapPartitions ({ rows =>
        val proj = UnsafeProjection.create(schemaSeq.toArray)
        new Iterator[CachedBatch] {
          override def hasNext: Boolean = rows.hasNext
          override def next(): CachedBatch = {
            val buf = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
            while (rows.hasNext && buf.length < batchSize) buf += proj(rows.next()).copy()
            RowCachedBatch(buf.toArray)
          }
        }
      }, preservesPartitioning = true)
    }
  }

  override def supportsColumnarOutput(schema: StructType): Boolean =
    schema.fields.forall(f => vectorizable(f.dataType))

  override def convertCachedBatchToColumnarBatch(
      input: RDD[CachedBatch], cacheAttributes: Seq[Attribute],
      selectedAttributes: Seq[Attribute], conf: SQLConf): RDD[ColumnarBatch] = {
    val columnIndices = selectedAttributes.map(a =>
      cacheAttributes.map(_.exprId).indexOf(a.exprId)).toArray
    val types = selectedAttributes.map(_.dataType).toArray
    input.map { cb =>
      val v = cb.asInstanceOf[VectorCachedBatch]
      val cols: Array[ColumnVector] =
        columnIndices.zip(types).map { case (i, t) => new GraftColumnVector(t, v.columns(i), v.numRows) }
      val batch = new ColumnarBatch(cols)
      batch.setNumRows(v.numRows)
      batch
    }
  }

  override def convertCachedBatchToInternalRow(
      input: RDD[CachedBatch], cacheAttributes: Seq[Attribute],
      selectedAttributes: Seq[Attribute], conf: SQLConf): RDD[InternalRow] = {
    val columnIndices = selectedAttributes.map(a =>
      cacheAttributes.map(_.exprId).indexOf(a.exprId)).toArray
    val types = selectedAttributes.map(_.dataType).toArray
    input.mapPartitions ({ batches =>
      // row-path consumers (sort, codegen input adapters) require
      // UnsafeRow-backed rows — project the columnar views through a
      // reused UnsafeProjection, exactly like the built-in serializer
      lazy val unsafeProj = UnsafeProjection.create(types)
      batches.flatMap {
        case v: VectorCachedBatch =>
          val cols: Array[ColumnVector] =
            columnIndices.zip(types).map { case (i, t) => new GraftColumnVector(t, v.columns(i), v.numRows) }
          val batch = new ColumnarBatch(cols)
          batch.setNumRows(v.numRows)
          import scala.jdk.CollectionConverters._
          batch.rowIterator().asScala.map(unsafeProj)
        case r: RowCachedBatch =>
          val proj = UnsafeProjection.create(types)
          if (columnIndices.zipWithIndex.forall { case (c, i) => c == i } &&
              columnIndices.length == cacheAttributes.length) r.rows.iterator
          else r.rows.iterator.map { row =>
            proj(new PrunedRow(row, columnIndices))
          }
      }
    }, preservesPartitioning = true)
  }

  /** No per-batch zone-map pruning: cached batches are served whole.
    * (Partition-level pruning and parquet zone maps still apply upstream;
    * see PlanSpec's PushedFilters pins.)
    */
  override def buildFilter(predicates: Seq[Expression], cachedAttributes: Seq[Attribute])
      : (Int, Iterator[CachedBatch]) => Iterator[CachedBatch] =
    (_, iter) => iter
}

object GraftCacheSerializer {

  def vectorizable(t: DataType): Boolean = t match {
    case BooleanType | ByteType | ShortType | IntegerType | DateType |
         LongType | TimestampType | TimestampNTZType | FloatType | DoubleType |
         StringType | BinaryType => true
    case _: YearMonthIntervalType | _: DayTimeIntervalType => true
    case _ => false
  }

  /** One cached batch: per-column primitive storage, zero-copy readable. */
  case class VectorCachedBatch(numRows: Int, columns: Array[ColumnStore]) extends CachedBatch {
    override def sizeInBytes: Long = columns.map(_.sizeInBytes).sum
  }

  case class RowCachedBatch(rows: Array[InternalRow]) extends CachedBatch {
    override def numRows: Int = rows.length
    override def sizeInBytes: Long = rows.map {
      case u: org.apache.spark.sql.catalyst.expressions.UnsafeRow => u.getSizeInBytes.toLong
      case _ => 64L
    }.sum
  }

  /** Column storage variants (all fields Java-serializable). */
  sealed trait ColumnStore extends Serializable {
    def nulls: Array[Boolean] // null mask, or null when no nulls
    def sizeInBytes: Long
    final def nullCount: Int = if (nulls == null) 0 else {
      var c = 0; var i = 0; while (i < nulls.length) { if (nulls(i)) c += 1; i += 1 }; c
    }
  }
  final case class BoolStore(values: Array[Boolean], nulls: Array[Boolean]) extends ColumnStore {
    def sizeInBytes: Long = values.length.toLong
  }
  final case class ByteStore(values: Array[Byte], nulls: Array[Boolean]) extends ColumnStore {
    def sizeInBytes: Long = values.length.toLong
  }
  final case class ShortStore(values: Array[Short], nulls: Array[Boolean]) extends ColumnStore {
    def sizeInBytes: Long = values.length * 2L
  }
  final case class IntStore(values: Array[Int], nulls: Array[Boolean]) extends ColumnStore {
    def sizeInBytes: Long = values.length * 4L
  }
  final case class LongStore(values: Array[Long], nulls: Array[Boolean]) extends ColumnStore {
    def sizeInBytes: Long = values.length * 8L
  }
  final case class FloatStore(values: Array[Float], nulls: Array[Boolean]) extends ColumnStore {
    def sizeInBytes: Long = values.length * 4L
  }
  final case class DoubleStore(values: Array[Double], nulls: Array[Boolean]) extends ColumnStore {
    def sizeInBytes: Long = values.length * 8L
  }
  /** Strings/binary: contiguous blob + (start, end) offsets — the dense
    * string-vector layout; `getUTF8String` is an O(1) view into the blob. */
  final case class BlobStore(blob: Array[Byte], offsets: Array[Int], nulls: Array[Boolean]) extends ColumnStore {
    def sizeInBytes: Long = blob.length + offsets.length * 4L
  }
  /** Dictionary-encoded strings: distinct values in first-seen order in
    * `dict` (offsets `dictOffsets`, length = entries + 1), per-row ids in
    * `ids` (0 at null positions). The layout the reference engine's
    * dictionary compression produces (reference:
    * /root/reference/src/storage/compression/dictionary/) — and what lets
    * [[CacheFilterExec]] evaluate string predicates once per distinct
    * value instead of once per row. Built only while the builder's
    * cardinality/byte valves hold; otherwise the column spills to
    * [[BlobStore]]. */
  final case class DictStore(dict: Array[Byte], dictOffsets: Array[Int],
      ids: Array[Int], nulls: Array[Boolean]) extends ColumnStore {
    def entries: Int = dictOffsets.length - 1
    def sizeInBytes: Long = dict.length + dictOffsets.length * 4L + ids.length * 4L
  }

  /** Dictionary valves: a batch's string column dict-encodes only while
    * it stays under both; beyond them the column is high-cardinality and
    * the dense blob layout is the better trade (no valve tuning exposed —
    * the spill is automatic and per batch). 4096 entries covers the
    * search-phrase-class dimension (a few thousand distinct values per
    * 10k-row batch) that 1024 spilled to plain blobs, which starved the
    * dict-id aggregation paths (DriverAgg dictKeys, PackedPartialAgg)
    * exactly where they matter most. */
  val MaxDictEntries = 4096
  val MaxDictBytes = 1 << 20

  /** Append-side builders. */
  abstract class ColumnBuilder {
    def append(row: InternalRow, ordinal: Int): Unit
    def result(): ColumnStore
    protected var nulls: Array[Boolean] = _
    protected var count = 0
    protected def markNull(cap: Int): Unit = {
      if (nulls == null) nulls = new Array[Boolean](cap)
      nulls(count) = true
    }
    protected def trimNulls(): Array[Boolean] =
      if (nulls == null) null else java.util.Arrays.copyOf(nulls, count)
  }

  object ColumnBuilder {
    def apply(t: DataType, cap: Int): ColumnBuilder = t match {
      case BooleanType => new ColumnBuilder {
        private val v = new Array[Boolean](cap)
        def append(r: InternalRow, i: Int): Unit = {
          if (r.isNullAt(i)) markNull(cap) else v(count) = r.getBoolean(i); count += 1
        }
        def result() = BoolStore(java.util.Arrays.copyOf(v, count), trimNulls())
      }
      case ByteType => new ColumnBuilder {
        private val v = new Array[Byte](cap)
        def append(r: InternalRow, i: Int): Unit = {
          if (r.isNullAt(i)) markNull(cap) else v(count) = r.getByte(i); count += 1
        }
        def result() = ByteStore(java.util.Arrays.copyOf(v, count), trimNulls())
      }
      case ShortType => new ColumnBuilder {
        private val v = new Array[Short](cap)
        def append(r: InternalRow, i: Int): Unit = {
          if (r.isNullAt(i)) markNull(cap) else v(count) = r.getShort(i); count += 1
        }
        def result() = ShortStore(java.util.Arrays.copyOf(v, count), trimNulls())
      }
      case IntegerType | DateType | _: YearMonthIntervalType => new ColumnBuilder {
        private val v = new Array[Int](cap)
        def append(r: InternalRow, i: Int): Unit = {
          if (r.isNullAt(i)) markNull(cap) else v(count) = r.getInt(i); count += 1
        }
        def result() = IntStore(java.util.Arrays.copyOf(v, count), trimNulls())
      }
      case LongType | TimestampType | TimestampNTZType | _: DayTimeIntervalType => new ColumnBuilder {
        private val v = new Array[Long](cap)
        def append(r: InternalRow, i: Int): Unit = {
          if (r.isNullAt(i)) markNull(cap) else v(count) = r.getLong(i); count += 1
        }
        def result() = LongStore(java.util.Arrays.copyOf(v, count), trimNulls())
      }
      case FloatType => new ColumnBuilder {
        private val v = new Array[Float](cap)
        def append(r: InternalRow, i: Int): Unit = {
          if (r.isNullAt(i)) markNull(cap) else v(count) = r.getFloat(i); count += 1
        }
        def result() = FloatStore(java.util.Arrays.copyOf(v, count), trimNulls())
      }
      case DoubleType => new ColumnBuilder {
        private val v = new Array[Double](cap)
        def append(r: InternalRow, i: Int): Unit = {
          if (r.isNullAt(i)) markNull(cap) else v(count) = r.getDouble(i); count += 1
        }
        def result() = DoubleStore(java.util.Arrays.copyOf(v, count), trimNulls())
      }
      case StringType => new ColumnBuilder {
        // dict-first: intern values into a bounded dictionary; when the
        // batch turns out high-cardinality, replay into the plain blob
        // layout once and append raw from then on. One-time cache-build
        // cost either way; the dict pays for itself on every warm read
        // via CacheFilterExec's per-entry predicate evaluation.
        private var dictMap = new java.util.HashMap[UTF8String, Integer](64)
        private var dictBlob = new Array[Byte](1024)
        private var dictUsed = 0
        private var dictOffsets = new Array[Int](MaxDictEntries + 1)
        private var ids = new Array[Int](cap)
        private var blob: Array[Byte] = null // non-null once spilled
        private var used = 0
        private var offsets: Array[Int] = null

        private def writeBlob(bytes: Array[Byte]): Unit = {
          if (used + bytes.length > blob.length)
            blob = java.util.Arrays.copyOf(blob,
              math.max(blob.length * 2, used + bytes.length))
          System.arraycopy(bytes, 0, blob, used, bytes.length)
          used += bytes.length
        }

        private def spill(): Unit = {
          blob = new Array[Byte](math.max(cap * 8, dictUsed * 2))
          offsets = new Array[Int](cap + 1)
          var r = 0
          while (r < count) {
            if (nulls == null || !nulls(r)) {
              val id = ids(r)
              val s = dictOffsets(id)
              val len = dictOffsets(id + 1) - s
              if (used + len > blob.length)
                blob = java.util.Arrays.copyOf(blob,
                  math.max(blob.length * 2, used + len))
              System.arraycopy(dictBlob, s, blob, used, len)
              used += len
            }
            offsets(r + 1) = used
            r += 1
          }
          dictMap = null; ids = null; dictBlob = null; dictOffsets = null
        }

        def append(r: InternalRow, i: Int): Unit = {
          val isNull = r.isNullAt(i)
          if (isNull) markNull(cap)
          if (blob == null) {
            if (!isNull) {
              val s = r.getUTF8String(i)
              var id = dictMap.get(s)
              if (id == null) {
                if (dictMap.size >= MaxDictEntries ||
                    dictUsed + s.numBytes > MaxDictBytes) {
                  spill()
                  writeBlob(s.getBytes)
                  offsets(count + 1) = used
                  count += 1
                  return
                }
                val bytes = s.getBytes
                if (dictUsed + bytes.length > dictBlob.length)
                  dictBlob = java.util.Arrays.copyOf(dictBlob,
                    math.max(dictBlob.length * 2, dictUsed + bytes.length))
                System.arraycopy(bytes, 0, dictBlob, dictUsed, bytes.length)
                dictUsed += bytes.length
                id = Integer.valueOf(dictMap.size)
                dictOffsets(id + 1) = dictUsed
                // the row's UTF8String is a view into a reused buffer —
                // key the map with an owned copy
                dictMap.put(UTF8String.fromBytes(bytes), id)
              }
              ids(count) = id
            } // null rows keep ids(count) = 0
          } else {
            if (!isNull) writeBlob(r.getUTF8String(i).getBytes)
            offsets(count + 1) = used
          }
          count += 1
        }

        def result(): ColumnStore =
          if (blob == null)
            DictStore(java.util.Arrays.copyOf(dictBlob, dictUsed),
              java.util.Arrays.copyOf(dictOffsets, dictMap.size + 1),
              java.util.Arrays.copyOf(ids, count), trimNulls())
          else BlobStore(java.util.Arrays.copyOf(blob, used),
            java.util.Arrays.copyOf(offsets, count + 1), trimNulls())
      }
      case BinaryType => new ColumnBuilder {
        private var blob = new Array[Byte](cap * 8)
        private var used = 0
        private val offsets = new Array[Int](cap + 1)
        def append(r: InternalRow, i: Int): Unit = {
          if (r.isNullAt(i)) markNull(cap)
          else {
            val bytes = r.getBinary(i)
            if (used + bytes.length > blob.length) {
              blob = java.util.Arrays.copyOf(blob,
                math.max(blob.length * 2, used + bytes.length))
            }
            System.arraycopy(bytes, 0, blob, used, bytes.length)
            used += bytes.length
          }
          offsets(count + 1) = used
          count += 1
        }
        def result() = BlobStore(java.util.Arrays.copyOf(blob, used),
          java.util.Arrays.copyOf(offsets, count + 1), trimNulls())
      }
      case other => throw new UnsupportedOperationException(s"not vectorizable: $other")
    }
  }

  /** Projection view for the row-fallback pruned read. */
  final class PrunedRow(var row: InternalRow, indices: Array[Int]) extends InternalRow {
    override def numFields: Int = indices.length
    override def isNullAt(i: Int): Boolean = row.isNullAt(indices(i))
    override def getBoolean(i: Int): Boolean = row.getBoolean(indices(i))
    override def getByte(i: Int): Byte = row.getByte(indices(i))
    override def getShort(i: Int): Short = row.getShort(indices(i))
    override def getInt(i: Int): Int = row.getInt(indices(i))
    override def getLong(i: Int): Long = row.getLong(indices(i))
    override def getFloat(i: Int): Float = row.getFloat(indices(i))
    override def getDouble(i: Int): Double = row.getDouble(indices(i))
    override def getDecimal(i: Int, p: Int, s: Int): Decimal = row.getDecimal(indices(i), p, s)
    override def getUTF8String(i: Int): UTF8String = row.getUTF8String(indices(i))
    override def getBinary(i: Int): Array[Byte] = row.getBinary(indices(i))
    override def getInterval(i: Int): org.apache.spark.unsafe.types.CalendarInterval =
      row.getInterval(indices(i))
    override def getStruct(i: Int, n: Int): InternalRow = row.getStruct(indices(i), n)
    override def getArray(i: Int): org.apache.spark.sql.catalyst.util.ArrayData =
      row.getArray(indices(i))
    override def getMap(i: Int): org.apache.spark.sql.catalyst.util.MapData =
      row.getMap(indices(i))
    override def get(i: Int, dt: DataType): AnyRef = row.get(indices(i), dt)
    override def getGeography(i: Int): org.apache.spark.unsafe.types.GeographyVal =
      row.getGeography(indices(i))
    override def getGeometry(i: Int): org.apache.spark.unsafe.types.GeometryVal =
      row.getGeometry(indices(i))
    override def getVariant(i: Int): org.apache.spark.unsafe.types.VariantVal =
      row.getVariant(indices(i))
    override def copy(): InternalRow =
      throw new UnsupportedOperationException("PrunedRow is a projection view")
    override def setNullAt(i: Int): Unit = throw new UnsupportedOperationException
    override def update(i: Int, v: Any): Unit = throw new UnsupportedOperationException
  }
}

/** Zero-copy read view over a [[GraftCacheSerializer.ColumnStore]].
  * The typed array is hoisted into a monomorphic field at construction so
  * the hot accessors are a field load + array index (no per-call cast).
  */
final class GraftColumnVector(
    t: DataType,
    val store: GraftCacheSerializer.ColumnStore,
    numRows: Int) extends ColumnVector(t) {
  import GraftCacheSerializer._

  private[this] val nulls = store.nulls
  private[this] lazy val nNulls = store.nullCount

  private[this] var boolV: Array[Boolean] = _
  private[this] var byteV: Array[Byte] = _
  private[this] var shortV: Array[Short] = _
  private[this] var intV: Array[Int] = _
  private[this] var longV: Array[Long] = _
  private[this] var floatV: Array[Float] = _
  private[this] var doubleV: Array[Double] = _
  private[this] var blob: Array[Byte] = _
  private[this] var offsets: Array[Int] = _
  private[this] var dictBlob: Array[Byte] = _
  private[this] var dictOffsets: Array[Int] = _
  store match {
    case BoolStore(v, _) => boolV = v
    case ByteStore(v, _) => byteV = v
    case ShortStore(v, _) => shortV = v
    case IntStore(v, _) => intV = v
    case LongStore(v, _) => longV = v
    case FloatStore(v, _) => floatV = v
    case DoubleStore(v, _) => doubleV = v
    case BlobStore(b, o, _) => blob = b; offsets = o
    case DictStore(d, o, ids, _) => dictBlob = d; dictOffsets = o; intV = ids
  }

  override def close(): Unit = ()
  override def hasNull: Boolean = nulls != null && nNulls > 0
  override def numNulls: Int = nNulls
  override def isNullAt(rowId: Int): Boolean = nulls != null && nulls(rowId)

  override def getBoolean(rowId: Int): Boolean = boolV(rowId)
  override def getByte(rowId: Int): Byte = byteV(rowId)
  override def getShort(rowId: Int): Short = shortV(rowId)
  override def getInt(rowId: Int): Int = intV(rowId)
  override def getLong(rowId: Int): Long = longV(rowId)
  override def getFloat(rowId: Int): Float = floatV(rowId)
  override def getDouble(rowId: Int): Double = doubleV(rowId)

  override def getUTF8String(rowId: Int): UTF8String =
    if (nulls != null && nulls(rowId)) null
    else if (dictBlob != null) {
      val id = intV(rowId)
      UTF8String.fromBytes(dictBlob, dictOffsets(id), dictOffsets(id + 1) - dictOffsets(id))
    }
    else UTF8String.fromBytes(blob, offsets(rowId), offsets(rowId + 1) - offsets(rowId))
  override def getBinary(rowId: Int): Array[Byte] =
    if (nulls != null && nulls(rowId)) null
    else java.util.Arrays.copyOfRange(blob, offsets(rowId), offsets(rowId + 1))

  override def getDecimal(rowId: Int, precision: Int, scale: Int): Decimal =
    throw new UnsupportedOperationException("decimal columns use the row fallback")
  override def getArray(rowId: Int): ColumnarArray =
    throw new UnsupportedOperationException("array columns use the row fallback")
  override def getMap(ordinal: Int): ColumnarMap =
    throw new UnsupportedOperationException("map columns use the row fallback")
  override def getChild(ordinal: Int): ColumnVector =
    throw new UnsupportedOperationException("nested columns use the row fallback")
}
