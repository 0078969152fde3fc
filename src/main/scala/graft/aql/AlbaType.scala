package graft.aql

import org.apache.spark.sql.types._

/** The reference type system (`/root/reference/src/alba_types.rs:9-27`)
  * mapped to Spark types (SURVEY.md §1.2), plus the ingest cast matrix
  * replicating `try_from_existing` semantics
  * (`src/alba_types.rs:116-275`) with SQL NULL handling.
  *
  * Capped string/bytes variants truncate on write
  * (`src/alba_types.rs:317-348`); we keep the cap as metadata and enforce
  * truncation at ingest — storage is ordinary Parquet strings/binary.
  */
sealed abstract class AlbaType(
    val name: String,
    val spark: DataType,
    val cap: Option[Int] = None) {
  /** Numeric types — where a bare RHS word in a predicate can resolve as
    * a column reference (graft WHERE-arithmetic extension) because the
    * reference's literal interpretation could never coerce it. */
  def isNumeric: Boolean = spark match {
    case IntegerType | LongType | DoubleType => true
    case _ => false
  }
}

object AlbaType {
  case object AInt extends AlbaType("INT", IntegerType)
  case object ABigint extends AlbaType("BIGINT", LongType)
  case object AFloat extends AlbaType("FLOAT", DoubleType)
  case object ABool extends AlbaType("BOOL", BooleanType)
  case object AText extends AlbaType("TEXT", StringType)

  /** Single Unicode code point (reference wire id 1, 4-byte `char`,
    * `src/alba_types.rs:15,47,284`). Stored as a length-1 Parquet string.
    * The reference accepts only Char or a string whose BYTE length is 1
    * (`src/alba_types.rs:217-231`), which rejects every non-ASCII
    * character; standardized here to code-point count == 1.
    */
  case object AChar extends AlbaType("CHAR", StringType, Some(1))

  /** Placeholder type (reference wire id 0, zero-size,
    * `src/alba_types.rs:26,46,283`). Every value coerces to NONE by
    * discarding it (`src/alba_types.rs:273`), so a NONE column always
    * reads NULL; stored as an all-null Parquet string column (Parquet has
    * no zero-width type).
    */
  case object ANone extends AlbaType("NONE", StringType)
  final case class AString(n: String, limit: Int)
    extends AlbaType(n, StringType, Some(limit))
  final case class ABytes(n: String, limit: Int)
    extends AlbaType(n, BinaryType, Some(limit))

  /** Caps per `src/alba_types.rs:285-294`. */
  val all: Map[String, AlbaType] = Map(
    "INT" -> AInt, "BIGINT" -> ABigint, "FLOAT" -> AFloat,
    "BOOL" -> ABool, "TEXT" -> AText, "CHAR" -> AChar, "NONE" -> ANone,
    "NANO-STRING" -> AString("NANO-STRING", 10),
    "SMALL-STRING" -> AString("SMALL-STRING", 100),
    "MEDIUM-STRING" -> AString("MEDIUM-STRING", 500),
    "BIG-STRING" -> AString("BIG-STRING", 2000),
    "LARGE-STRING" -> AString("LARGE-STRING", 3000),
    "NANO-BYTES" -> ABytes("NANO-BYTES", 10),
    "SMALL-BYTES" -> ABytes("SMALL-BYTES", 1000),
    "MEDIUM-BYTES" -> ABytes("MEDIUM-BYTES", 10000),
    "BIG-BYTES" -> ABytes("BIG-BYTES", 100000),
    "LARGE-BYTES" -> ABytes("LARGE-BYTES", 1000000))

  def of(name: String): AlbaType =
    all.getOrElse(name.toUpperCase,
      throw new IllegalArgumentException(s"Unknown type: $name"))

  final class CoercionException(msg: String) extends RuntimeException(msg)

  /** Ingest coercion — the `try_from_existing` matrix with standard SQL
    * NULL passthrough. Accepts lexer-token payloads (Long/Double/Boolean/
    * String/Array[Byte]) and produces the JVM value matching `spark`.
    */
  def coerce(t: AlbaType, v: Any): Any = {
    if (v == null) return null
    def fail(detail: String) =
      throw new CoercionException(s"Cannot coerce $detail to ${t.name}")

    def parseBool(s: String): Boolean = s.trim.toLowerCase match {
      // accepted string forms per src/alba_types.rs:203-211
      case "1" | "t" | "true" => true
      case "0" | "f" | "false" => false
      case other => fail(s"string '$other'")
    }

    t match {
      case AInt => v match {
        case l: Long =>
          // range-checked Bigint→Int (src/alba_types.rs:139-145)
          if (l < Int.MinValue || l > Int.MaxValue) fail(s"out-of-range $l")
          else l.toInt
        case i: Int => i
        case d: Double =>
          // NaN/Inf rejected for float→int (src/alba_types.rs:146-151)
          if (d.isNaN || d.isInfinite) fail(s"non-finite $d")
          else if (d < Int.MinValue || d > Int.MaxValue) fail(s"out-of-range $d")
          else d.toInt
        case b: Boolean => if (b) 1 else 0
        case s: String =>
          // integral strings parse as Long FIRST (same range check as the
          // Long path); toDouble-first would silently saturate out-of-range
          // ints and corrupt values above 2^53
          val t0 = s.trim
          try coerce(AInt, t0.toLong)
          catch {
            case _: NumberFormatException =>
              try coerce(AInt, t0.toDouble)
              catch { case _: NumberFormatException => fail(s"string '$s'") }
          }
        case other => fail(other.getClass.getSimpleName)
      }
      case ABigint => v match {
        case l: Long => l
        case i: Int => i.toLong
        case d: Double =>
          if (d.isNaN || d.isInfinite) fail(s"non-finite $d")
          // 2^63 rounds up in double, so >= catches Long.MaxValue+1 while
          // -2^63 is exact and stays valid
          else if (d < Long.MinValue.toDouble || d >= 9.223372036854776e18)
            fail(s"out-of-range $d")
          else d.toLong
        case b: Boolean => if (b) 1L else 0L
        case s: String =>
          val t0 = s.trim
          try t0.toLong // exact — never through double (2^53 corruption)
          catch {
            case _: NumberFormatException =>
              try coerce(ABigint, t0.toDouble)
              catch { case _: NumberFormatException => fail(s"string '$s'") }
          }
        case other => fail(other.getClass.getSimpleName)
      }
      case AFloat => v match {
        case d: Double => d
        case l: Long => l.toDouble
        case i: Int => i.toDouble
        case b: Boolean => if (b) 1.0 else 0.0
        case s: String =>
          try s.trim.toDouble catch { case _: NumberFormatException => fail(s"string '$s'") }
        case other => fail(other.getClass.getSimpleName)
      }
      case ABool => v match {
        case b: Boolean => b
        case l: Long => l != 0
        case i: Int => i != 0
        case s: String => parseBool(s)
        case other => fail(other.getClass.getSimpleName)
      }
      case AText => v match {
        case s: String => s
        case b: Array[Byte] =>
          // bytes→text is base64 (src/alba_types.rs:128-131)
          java.util.Base64.getEncoder.encodeToString(b)
        case other => other.toString
      }
      case AString(_, limit) => v match {
        case s: String => if (s.length > limit) s.substring(0, limit) else s
        case b: Array[Byte] =>
          val s = java.util.Base64.getEncoder.encodeToString(b)
          if (s.length > limit) s.substring(0, limit) else s
        case other =>
          val s = other.toString
          if (s.length > limit) s.substring(0, limit) else s
      }
      case AChar => v match {
        case s: String =>
          if (s.codePointCount(0, s.length) == 1) s
          else fail(s"string '$s' (must be a single character)")
        case other => fail(other.getClass.getSimpleName)
      }
      case ANone => null // every value coerces to NONE by discarding it
      case ABytes(_, limit) => v match {
        case b: Array[Byte] => if (b.length > limit) b.take(limit) else b
        case s: String =>
          val b = s.getBytes("UTF-8")
          if (b.length > limit) b.take(limit) else b
        case other => fail(other.getClass.getSimpleName)
      }
    }
  }

  /** Token payload → plain JVM value (for condition literals / row values). */
  def tokenValue(tok: Token): Any = tok match {
    case Token.Str(s) => s
    case Token.IntLit(l) => l
    case Token.FloatLit(d) => d
    case Token.BoolLit(b) => b
    case Token.Bytes(b) => b
    case Token.Keyword(k) => k
    case other =>
      throw new IllegalArgumentException(s"Not a value token: $other")
  }
}
