package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 implementation of the reference's `range`/
  * `generate_series` table function
  * (/root/reference/src/function/table/range.cpp), demonstrating the
  * TableFunction protocol mapping from SURVEY §2.9: `bind` ≙ inferSchema,
  * `init_global` ≙ planInputPartitions (parallel splits), `function` ≙
  * PartitionReader, and filter pushdown ≙ SupportsPushDownFilters (range
  * comparisons on `value` narrow the generated interval — the scan never
  * materializes pruned rows, exactly like the reference's table filters).
  *
  *   spark.read.format("graft.sources.SeriesSource")
  *     .option("start", 1).option("end", 1000000)
  *     .option("step", 1).option("numPartitions", 8).load()
  */
class SeriesSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeriesSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // getTable receives original-case keys; normalize like inferSchema does
    val opts = new CaseInsensitiveStringMap(properties)
    new SeriesTable(
      opts.getLong("start", 0L),
      opts.getLong("end", 1000L),
      opts.getLong("step", 1L),
      opts.getInt("numPartitions", 4))
  }
}

object SeriesSource {
  val schema: StructType = StructType(Seq(StructField("value", LongType, nullable = false)))
}

class SeriesTable(start: Long, end: Long, step: Long, parts: Int)
    extends Table with SupportsRead {
  require(step > 0, "step must be positive")
  override def name(): String = s"series($start,$end,$step)"
  override def schema(): StructType = SeriesSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeriesScanBuilder(start, end, step, parts)
}

class SeriesScanBuilder(var lo: Long, var hi: Long, step: Long, parts: Int)
    extends ScanBuilder with SupportsPushDownFilters {

  private val origin = lo // pushdown must not shift the step grid
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThan("value", v: Long) => lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("value", v: Long) => lo = math.max(lo, v); true
      case LessThan("value", v: Long) => hi = math.min(hi, v - 1); true
      case LessThanOrEqual("value", v: Long) => hi = math.min(hi, v); true
      case _ => false
    }
    pushed = accepted
    rejected
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = SeriesSource.schema
    override def description(): String = s"SeriesScan[$lo..$hi step $step]"
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] = {
      // align lo up to the step grid anchored at the original start
      if (lo > origin) {
        val over = (lo - origin) % step
        if (over != 0) lo = lo + (step - over)
      }
      if (hi < lo) return Array.empty
      val n = (hi - lo) / step + 1
      val per = math.max(1, n / parts)
      (0L until parts.toLong).flatMap { i =>
        val s = lo + i * per * step
        val e = if (i == parts - 1) hi else math.min(hi, s + (per - 1) * step)
        if (s > hi) None else Some(SeriesPartition(s, e, step): InputPartition)
      }.toArray
    }
    override def createReaderFactory(): PartitionReaderFactory = new SeriesReaderFactory
  }
}

case class SeriesPartition(lo: Long, hi: Long, step: Long) extends InputPartition

class SeriesReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SeriesPartition]
    new PartitionReader[InternalRow] {
      private var cur = sp.lo - sp.step
      private val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      override def next(): Boolean = { cur += sp.step; cur <= sp.hi }
      override def get(): InternalRow = { row.update(0, cur); row }
      override def close(): Unit = ()
    }
  }
}
