package graft.types

import org.apache.spark.sql.types._

/** The reference's type lattice ("Kind", lib/typing/typing.go:16-105)
  * mapped onto Spark's DataType, plus value-based inference
  * (typing.ParseValue, lib/typing/parse.go:23-67).
  */
sealed trait Kind { def sparkType: DataType }

object Kind {
  /** Null-only column: type unresolved until a real value or the
    * destination supplies one (typing.go:42-44). */
  case object Invalid extends Kind { val sparkType: DataType = NullType }
  case object Bool extends Kind { val sparkType: DataType = BooleanType }
  case object Float extends Kind { val sparkType: DataType = DoubleType }
  case class Int(bits: scala.Int = 64) extends Kind {
    val sparkType: DataType = bits match {
      case 16 => ShortType; case 32 => IntegerType; case _ => LongType
    }
  }
  /** Precision-unspecified NUMERIC degrades to string, like the
    * reference's TEXT fallback (converters/decimal.go:193-198). */
  case class Dec(precision: scala.Int, scale: scala.Int) extends Kind {
    val sparkType: DataType =
      if (precision <= 0) StringType else DecimalType(precision, scale)
  }
  case class Str(maxLength: Option[scala.Int] = None) extends Kind {
    val sparkType: DataType = StringType
  }
  case object Bytes extends Kind { val sparkType: DataType = BinaryType }
  case class Arr(element: Kind = Str()) extends Kind {
    val sparkType: DataType = ArrayType(element.sparkType)
  }
  /** JSON/JSONB/nested docs ride as JSON strings (reference semantics;
    * iceberg/dialect/data_types.go:17-23 maps struct->STRING). */
  case object Struct extends Kind { val sparkType: DataType = StringType }
  case object Date extends Kind { val sparkType: DataType = DateType }
  /** Time-of-day has no Spark type; canonical "HH:mm:ss.SSSSSS" string. */
  case object Time extends Kind { val sparkType: DataType = StringType }
  case object TimestampNtz extends Kind { val sparkType: DataType = TimestampNTZType }
  case object TimestampTz extends Kind { val sparkType: DataType = TimestampType }
  case object Uuid extends Kind { val sparkType: DataType = StringType }
  /** ISO-8601 interval string (Debezium P1Y2M...); CalendarInterval is not
    * storable. */
  case object Interval extends Kind { val sparkType: DataType = StringType }

  /** Value-based inference for schemaless events (parse.go:23-67):
    * JSON-looking strings -> Struct, null -> Invalid.
    */
  def parseValue(v: Any): Kind = v match {
    case null => Invalid
    case _: java.lang.Boolean => Bool
    case _: java.lang.Short => Int(16)
    case _: java.lang.Integer => Int(32)
    case _: java.lang.Long => Int(64)
    case _: java.lang.Float | _: java.lang.Double => Float
    case _: java.math.BigDecimal => Dec(38, 18)
    case _: Array[Byte] => Bytes
    case s: String =>
      val t = s.trim
      if ((t.startsWith("{") && t.endsWith("}")) || (t.startsWith("[") && t.endsWith("]"))) Struct
      else Str()
    case _: java.sql.Timestamp | _: java.time.Instant => TimestampTz
    case _: java.time.LocalDateTime => TimestampNtz
    case _: java.sql.Date | _: java.time.LocalDate => Date
    case _: Seq[_] => Arr()
    case _ => Str()
  }

  /** Widening for values seen across a batch: Invalid upgrades to anything;
    * int widens to float; otherwise conflicts degrade to string (the
    * reference re-types via destination merge, table_data.go:317-381).
    */
  def merge(a: Kind, b: Kind): Kind = (a, b) match {
    case (Invalid, x) => x
    case (x, Invalid) => x
    case (x, y) if x == y => x
    case (Int(x), Int(y)) => Int(math.max(x, y))
    case (Int(_), Float) | (Float, Int(_)) => Float
    case _ => Str()
  }
}
