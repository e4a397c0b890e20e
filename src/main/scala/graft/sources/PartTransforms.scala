package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Literal => CatalystLiteral, Murmur3Hash}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hidden partition transforms — the partition spec is a TRANSFORM
  * of a source column, not necessarily the column itself, and the
  * physical layout stays invisible to queries: callers predicate on
  * the source column and the store maps those predicates onto
  * transformed per-file bounds (Iceberg's "hidden partitioning",
  * spec §Partition Transforms; the reference's warehouse is exactly
  * a date-partitioned layout, `partitioned_runner.sh:8,12`, which
  * under Iceberg would be `days(ts)`).
  *
  * A spec string parses to one of:
  *  - `col`               identity (what SnapStore always supported)
  *  - `days(col)`         epoch days of a DATE column
  *  - `months(col)`       months since 1970-01 of a DATE column
  *  - `years(col)`        years since 1970 of a DATE column
  *  - `bucket(n,col)`     Murmur3 hash bucket in [0, n)
  *  - `truncate(w,col)`   floor-to-multiple (numeric) / prefix (string)
  *
  * Each transform exists twice, BY CONSTRUCTION consistent:
  * [[Spec.toColumnFor]] (the distributed form — used by write
  * clustering and per-file stats) and [[Spec.eval]] (the driver-side
  * form — used to map literal predicate values onto transformed
  * bounds without launching a job). `eval` delegates to the SAME
  * Spark machinery where the function is non-trivial (bucket =
  * catalyst `Murmur3Hash` seed 42, exactly what `functions.hash`
  * plans), and `PartTransformsSpec` property-checks the pair's
  * agreement over random values for every transform × source type.
  *
  * Monotonic transforms (identity/days/months/years/truncate) also
  * map RANGE predicates: `src BETWEEN a AND b` prunes to files whose
  * transformed bounds intersect `[t(a), t(b)]`. Bucket is not
  * monotonic — it prunes equality/IN only, never ranges.
  */
object PartTransforms {

  sealed trait Spec {
    /** The spec string as manifests store it (identity = the bare
      * column name, so every pre-transform manifest parses
      * unchanged). */
    def raw: String
    /** The source column the transform reads. */
    def source: String
    /** The transformed value as a Column over `source`, given the
      * source column's type (truncate branches on it). */
    def toColumnFor(sourceType: DataType): Column
    /** Driver-side transform of one literal source value; must equal
      * what [[toColumnFor]] computes for the same value (property-
      * checked in PartTransformsSpec). */
    def eval(v: Any, sourceType: DataType): Any
    /** The transform's result type given the source type — what
      * rendered bounds must be ORDERED as. */
    def resultType(sourceType: DataType): DataType
    /** Order-preserving? Only monotonic transforms may translate
      * range predicates into transformed-bound ranges. */
    def monotonic: Boolean
  }

  /** Plain column partitioning — transform is the value itself. */
  final case class Identity(source: String) extends Spec {
    val raw: String = source
    def toColumnFor(sourceType: DataType): Column = col(source)
    def eval(v: Any, sourceType: DataType): Any = v
    def resultType(sourceType: DataType): DataType = sourceType
    def monotonic: Boolean = true
  }

  private def toLocalDate(v: Any): java.time.LocalDate = v match {
    case d: java.sql.Date => d.toLocalDate
    case d: java.time.LocalDate => d
    case s: String => java.time.LocalDate.parse(s)
    case other => throw new IllegalArgumentException(
      s"not a date value: $other (${other.getClass.getName})")
  }

  /** `days(col)`: DATE → days since epoch (Int, matching
    * `datediff`'s IntegerType). */
  final case class Days(source: String) extends Spec {
    val raw = s"days($source)"
    def toColumnFor(sourceType: DataType): Column =
      datediff(col(source), lit("1970-01-01"))
    def eval(v: Any, sourceType: DataType): Any =
      toLocalDate(v).toEpochDay.toInt
    def resultType(sourceType: DataType): DataType = IntegerType
    def monotonic: Boolean = true
  }

  /** `months(col)`: DATE → months since 1970-01 (Int). */
  final case class Months(source: String) extends Spec {
    val raw = s"months($source)"
    def toColumnFor(sourceType: DataType): Column =
      (year(col(source)) - lit(1970)) * lit(12) + month(col(source)) - lit(1)
    def eval(v: Any, sourceType: DataType): Any = {
      val d = toLocalDate(v)
      (d.getYear - 1970) * 12 + d.getMonthValue - 1
    }
    def resultType(sourceType: DataType): DataType = IntegerType
    def monotonic: Boolean = true
  }

  /** `years(col)`: DATE → years since 1970 (Int). */
  final case class Years(source: String) extends Spec {
    val raw = s"years($source)"
    def toColumnFor(sourceType: DataType): Column = year(col(source)) - lit(1970)
    def eval(v: Any, sourceType: DataType): Any =
      toLocalDate(v).getYear - 1970
    def resultType(sourceType: DataType): DataType = IntegerType
    def monotonic: Boolean = true
  }

  private[sources] val MicrosPerHour = 3600L * 1000 * 1000

  /** `hours(col)`: TIMESTAMP → hours since epoch (Int) — Iceberg's
    * `hour` transform, the grain event-grade warehouses partition at.
    * Both forms floor-divide the UTC microsecond instant: the Column
    * form subtracts `pmod` before dividing so the quotient is an
    * exact multiple (no float rounding at hour boundaries), the
    * driver form is `Math.floorDiv` on the same micros.
    */
  final case class Hours(source: String) extends Spec {
    val raw = s"hours($source)"
    def toColumnFor(sourceType: DataType): Column = {
      require(sourceType == TimestampType,
        s"hours() requires a TIMESTAMP source, got $sourceType")
      val us = unix_micros(col(source))
      ((us - pmod(us, lit(MicrosPerHour))) / lit(MicrosPerHour))
        .cast(IntegerType)
    }
    def eval(v: Any, sourceType: DataType): Any = {
      val instant = v match {
        case t: java.sql.Timestamp => t.toInstant
        case i: java.time.Instant => i
        case s: String => java.time.Instant.parse(s)
        case other => throw new IllegalArgumentException(
          s"not a timestamp value: $other (${other.getClass.getName})")
      }
      val micros = Math.addExact(
        Math.multiplyExact(instant.getEpochSecond, 1000000L),
        (instant.getNano / 1000).toLong)
      Math.floorDiv(micros, MicrosPerHour).toInt
    }
    def resultType(sourceType: DataType): DataType = IntegerType
    def monotonic: Boolean = true
  }

  /** `bucket(n,col)`: Murmur3 hash bucket in `[0, n)`. The Column
    * form is `pmod(hash(col), n)`; `eval` runs the IDENTICAL
    * catalyst expression (`Murmur3Hash`, seed 42 — what
    * `functions.hash` plans) on a literal, so the two can only
    * diverge if Spark's own hash does. Not monotonic: prunes
    * equality/IN, never ranges.
    */
  final case class Bucket(n: Int, source: String) extends Spec {
    require(n > 0, s"bucket count must be positive: $n")
    val raw = s"bucket($n,$source)"
    def toColumnFor(sourceType: DataType): Column = pmod(hash(col(source)), lit(n))
    def eval(v: Any, sourceType: DataType): Any = {
      val h = Murmur3Hash(Seq(CatalystLiteral.create(v, sourceType)), 42)
        .eval(null).asInstanceOf[Int]
      ((h % n) + n) % n
    }
    def resultType(sourceType: DataType): DataType = IntegerType
    def monotonic: Boolean = false
  }

  /** `truncate(w,col)`: numeric → floor to a multiple of `w`
    * (`v - pmod(v, w)`, so negatives floor downward like Iceberg);
    * string → the first `w` characters. Monotonic in both forms. */
  final case class Truncate(w: Int, source: String) extends Spec {
    require(w > 0, s"truncate width must be positive: $w")
    val raw = s"truncate($w,$source)"
    def toColumnFor(sourceType: DataType): Column = sourceType match {
      case StringType => substring(col(source), 1, w)
      case ByteType | ShortType | IntegerType | LongType =>
        col(source) - pmod(col(source), lit(w))
      case dt => throw new IllegalArgumentException(
        s"truncate($w) unsupported over $dt")
    }
    def eval(v: Any, sourceType: DataType): Any = sourceType match {
      case StringType =>
        val s = v.toString; s.substring(0, math.min(w, s.length))
      case ByteType | ShortType | IntegerType | LongType =>
        val l = v match {
          case b: Byte => b.toLong; case s: Short => s.toLong
          case i: Int => i.toLong; case l: Long => l
          case other => throw new IllegalArgumentException(
            s"not an integral value: $other")
        }
        val t = l - java.lang.Math.floorMod(l, w.toLong)
        sourceType match {
          case LongType => t
          case IntegerType => t.toInt
          case ShortType => t.toShort
          case ByteType => t.toByte
        }
      case dt => throw new IllegalArgumentException(
        s"truncate($w) unsupported over $dt")
    }
    def resultType(sourceType: DataType): DataType = sourceType
    def monotonic: Boolean = true
  }

  private val HoursRe = """hours\(\s*([^)\s]+)\s*\)""".r
  private val DaysRe = """days\(\s*([^)\s]+)\s*\)""".r
  private val MonthsRe = """months\(\s*([^)\s]+)\s*\)""".r
  private val YearsRe = """years\(\s*([^)\s]+)\s*\)""".r
  private val BucketRe = """bucket\(\s*(\d+)\s*,\s*([^)\s]+)\s*\)""".r
  private val TruncRe = """truncate\(\s*(\d+)\s*,\s*([^)\s]+)\s*\)""".r

  /** Parse a spec string; anything that is not a recognized
    * transform call is an identity column name (so every existing
    * manifest/spec keeps its meaning). */
  def parse(spec: String): Spec = spec.trim match {
    case HoursRe(c) => Hours(c)
    case DaysRe(c) => Days(c)
    case MonthsRe(c) => Months(c)
    case YearsRe(c) => Years(c)
    case BucketRe(n, c) => Bucket(n.toInt, c)
    case TruncRe(w, c) => Truncate(w.toInt, c)
    case c => Identity(c)
  }

  /** Split a (possibly compound) spec string on TOP-LEVEL commas —
    * `days(ts),bucket(4,id)` is two fields, the comma inside
    * `bucket(4,id)` is the transform's own argument separator.
    */
  private def splitTop(raw: String): Seq[String] = {
    val out = scala.collection.mutable.Buffer.empty[String]
    val sb = new StringBuilder
    var depth = 0
    raw.foreach {
      case '(' => depth += 1; sb += '('
      case ')' => depth -= 1; sb += ')'
      case ',' if depth == 0 => out += sb.toString; sb.clear()
      case c => sb += c
    }
    out += sb.toString
    out.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** A MULTI-FIELD partition spec (Iceberg's `PARTITIONED BY
    * (days(ts), bucket(4, id))`): the spec string is the top-level
    * comma join of its fields' raw forms, and every single-field
    * spec parses to the one-element list — so the whole engine can
    * treat `partCol` as a field LIST with zero manifest-format
    * change. An empty string is the unpartitioned spec (zero
    * fields).
    */
  def parseMulti(raw: String): Seq[Spec] = splitTop(raw).map(parse)

  /** More than one partition field? */
  def isCompound(raw: String): Boolean = splitTop(raw).size > 1

  /** The canonical raw form of a field list — what [[parseMulti]]
    * round-trips. */
  def rawMulti(specs: Seq[Spec]): String = specs.map(_.raw).mkString(",")

  /** The transformed value as a Column, resolving the source type
    * from the table schema — the one entry point write clustering,
    * stats, and change-set pruning use. */
  def exprFor(spec: Spec, schema: StructType): Column =
    spec.toColumnFor(sourceType(spec, schema))

  /** The source column's type under `schema`; None when the schema
    * lacks the column (callers stay conservative, exactly like the
    * pre-transform code). */
  def sourceTypeOpt(spec: Spec, schema: StructType): Option[DataType] =
    schema.fields.find(_.name == spec.source).map(_.dataType)

  private def sourceType(spec: Spec, schema: StructType): DataType =
    sourceTypeOpt(spec, schema).getOrElse(throw new IllegalArgumentException(
      s"partition source column '${spec.source}' not in schema"))

  /** The spec string with its source column renamed (RENAME COLUMN
    * evolution follow-through) — rebuilt structurally, never by
    * substring replace (a source named `s` inside `days(s)` would
    * corrupt the transform name). Specs on other columns return
    * unchanged.
    */
  def renameSource(raw: String, from: String, to: String): String =
    rawMulti(parseMulti(raw).map {
      case Identity(`from`) => Identity(to)
      case Hours(`from`) => Hours(to)
      case Days(`from`) => Days(to)
      case Months(`from`) => Months(to)
      case Years(`from`) => Years(to)
      case Bucket(n, `from`) => Bucket(n, to)
      case Truncate(w, `from`) => Truncate(w, to)
      case other => other
    })
}
