package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, TimestampType}

/** Calendar-unit timestamp truncation as pure integer arithmetic — valid
  * in a UTC session, where month/quarter/year/week boundaries are fixed
  * offsets of the epoch-day number (no zone rules, no java.time). The
  * civil-date conversions are the standard era/year-of-era day-count
  * algorithm every native engine compiles date_trunc to (reference:
  * extension/core_functions/scalar/date/date_trunc.cpp kernels; the
  * day-count form is the public-domain civil_from_days construction).
  * Week truncation floors to Monday (epoch day 0 = Thursday), matching
  * both Spark's and the reference's date_trunc('week').
  */
object DateTruncKernel {
  private final val MicrosPerDay = 86400000000L

  /** (year, month) of an epoch-day number (proleptic Gregorian). */
  private def civilYM(z0: Long): Long = { // packed: (year << 4) | month
    val z = z0 + 719468L
    val era = Math.floorDiv(z, 146097L)
    val doe = z - era * 146097L
    val yoe = (doe - doe / 1460 + doe / 36524 - doe / 146096) / 365
    val doy = doe - (365 * yoe + yoe / 4 - yoe / 100)
    val mp = (5 * doy + 2) / 153
    val m = if (mp < 10) mp + 3 else mp - 9
    val y = yoe + era * 400 + (if (m <= 2) 1 else 0)
    (y << 4) | m
  }

  private def daysFromCivil(y: Long, m: Long): Long = {
    val yy = if (m <= 2) y - 1 else y
    val era = Math.floorDiv(yy, 400L)
    val yoe = yy - era * 400
    val mp = if (m > 2) m - 3 else m + 9
    val doy = (153 * mp + 2) / 5
    val doe = yoe * 365 + yoe / 4 - yoe / 100 + doy
    era * 146097L + doe - 719468L
  }

  def truncMonth(us: Long): Long = {
    val ym = civilYM(Math.floorDiv(us, MicrosPerDay))
    daysFromCivil(ym >> 4, ym & 15) * MicrosPerDay
  }

  def truncQuarter(us: Long): Long = {
    val ym = civilYM(Math.floorDiv(us, MicrosPerDay))
    val q = (((ym & 15) - 1) / 3) * 3 + 1
    daysFromCivil(ym >> 4, q) * MicrosPerDay
  }

  def truncYear(us: Long): Long = {
    val ym = civilYM(Math.floorDiv(us, MicrosPerDay))
    daysFromCivil(ym >> 4, 1) * MicrosPerDay
  }

  /** Monday-floor: epoch day 0 (1970-01-01) is a Thursday. */
  def truncWeek(us: Long): Long = {
    val days = Math.floorDiv(us, MicrosPerDay)
    (days - Math.floorMod(days + 3, 7L)) * MicrosPerDay
  }

  // ---- dense calendar-bucket LUTs (the perfect-hash aggregate's key
  // domain: reference physical_perfecthash_aggregate.cpp direct-indexes
  // group state by the proven-small key range; here the range is the
  // calendar buckets of 1900-2100, a fixed 88 KB day→ordinal table).
  // Days outside the window take the per-row overflow path in
  // DriverAgg's dense arm — never a wrong answer, just slower rows.

  /** epoch day of 1900-01-01 — the dense window's first day */
  val DenseDayLo: Long = daysFromCivil(1900, 1)
  /** epoch day of 2100-12-31 — the dense window's last day */
  val DenseDayHi: Long = daysFromCivil(2101, 1) - 1
  private val DenseDays = (DenseDayHi - DenseDayLo + 1).toInt

  /** day → month ordinal within the window ((y-1900)*12 + m-1, 0..2411) */
  lazy val monthOrdLut: Array[Char] = {
    val a = new Array[Char](DenseDays)
    var i = 0
    while (i < DenseDays) {
      val ym = civilYM(DenseDayLo + i)
      a(i) = ((((ym >> 4) - 1900) * 12 + (ym & 15) - 1)).toChar
      i += 1
    }
    a
  }
  /** month ordinal → epoch day of the month start */
  lazy val monthStartLut: Array[Int] = {
    val a = new Array[Int](201 * 12)
    var o = 0
    while (o < a.length) {
      a(o) = daysFromCivil(1900 + o / 12, o % 12 + 1).toInt
      o += 1
    }
    a
  }

  /** dense bucket count of a kernel (week is arithmetic, no LUT) */
  def denseBuckets(kernel: String): Int = kernel match {
    case "truncMonth" => 201 * 12
    case "truncQuarter" => 201 * 4
    case "truncYear" => 201
    case "truncWeek" =>
      (Math.floorDiv(DenseDayHi + 3, 7L) - Math.floorDiv(DenseDayLo + 3, 7L) + 1).toInt
  }

  /** day → dense ordinal, or -1 outside the 1900-2100 window */
  def denseOrd(kernelCode: Int, day: Long): Int = {
    if (day < DenseDayLo || day > DenseDayHi) return -1
    val m = monthOrdLut((day - DenseDayLo).toInt)
    kernelCode match {
      case 0 => m // month
      case 1 => m / 3 // quarter
      case 2 => m / 12 // year
      case _ => (Math.floorDiv(day + 3, 7L) - Math.floorDiv(DenseDayLo + 3, 7L)).toInt
    }
  }

  /** dense ordinal → epoch day of the bucket start */
  def denseStartDay(kernelCode: Int, ord: Int): Long = kernelCode match {
    case 0 => monthStartLut(ord)
    case 1 => monthStartLut(ord * 3)
    case 2 => monthStartLut(ord * 12)
    case _ => (ord + Math.floorDiv(DenseDayLo + 3, 7L)) * 7 - 3
  }

  def kernelCode(kernel: String): Int = kernel match {
    case "truncMonth" => 0
    case "truncQuarter" => 1
    case "truncYear" => 2
    case "truncWeek" => 3
  }
}

/** UTC-session reinterpretation of TIMESTAMP_NTZ as an instant: the NTZ
  * micros ARE the UTC instant micros, so the cast is the identity on the
  * physical long — created by [[graft.rules.FastUtcDateTrunc]] replacing
  * `Cast(ntz AS TIMESTAMP)`, which otherwise routes every row through a
  * LocalDateTime conversion.
  */
case class UtcNtzReinterpret(child: Expression) extends UnaryExpression {
  override def prettyName: String = "ntz_as_utc_instant"
  override def dataType: DataType = TimestampType
  override def nullSafeEval(v: Any): Any = v
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** UTC-session `Cast(timestamp AS DATE)`: the civil date of an instant
  * in UTC is `floorDiv(micros, µs/day)` — no zone rules.
  */
case class UtcMicrosToDate(child: Expression) extends UnaryExpression {
  override def prettyName: String = "utc_micros_to_date"
  override def dataType: DataType = org.apache.spark.sql.types.DateType
  override def nullSafeEval(v: Any): Any =
    Math.floorDiv(v.asInstanceOf[Long], 86400000000L).toInt
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"(int) java.lang.Math.floorDiv($c, 86400000000L)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `date_trunc(unit, ts)` for the calendar units, UTC sessions only —
  * created by [[graft.rules.FastUtcDateTrunc]]. `kernel` is the static
  * method name on [[DateTruncKernel]].
  */
case class UtcCalendarTrunc(child: Expression, kernel: String)
    extends UnaryExpression {
  override def prettyName: String = "date_trunc"
  override def dataType: DataType = TimestampType

  override def nullSafeEval(v: Any): Any = kernel match {
    case "truncMonth" => DateTruncKernel.truncMonth(v.asInstanceOf[Long])
    case "truncQuarter" => DateTruncKernel.truncQuarter(v.asInstanceOf[Long])
    case "truncYear" => DateTruncKernel.truncYear(v.asInstanceOf[Long])
    case "truncWeek" => DateTruncKernel.truncWeek(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DateTruncKernel.$kernel($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
