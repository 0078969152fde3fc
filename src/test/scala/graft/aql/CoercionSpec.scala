package graft.aql

import org.scalatest.funsuite.AnyFunSuite
import AlbaType._

/** Cast-matrix parity with `try_from_existing`
  * (`/root/reference/src/alba_types.rs:116-275`), plus seeded
  * property-style checks (deterministic sampling).
  */
class CoercionSpec extends AnyFunSuite {
  private val rng = new scala.util.Random(42)

  test("string→numeric parsing (alba_types.rs:153-156)") {
    assert(coerce(AInt, "42") == 42)
    assert(coerce(ABigint, " 7 ") == 7L)
    assert(coerce(AFloat, "3.5") == 3.5)
    intercept[CoercionException](coerce(AInt, "not-a-number"))
  }

  test("bool↔int (alba_types.rs:152,172)") {
    assert(coerce(AInt, true) == 1)
    assert(coerce(ABool, 0L) == false)
    assert(coerce(ABool, 3L) == true)
  }

  test("range-checked Bigint→Int (alba_types.rs:139-145)") {
    assert(coerce(AInt, 100L) == 100)
    intercept[CoercionException](coerce(AInt, Long.MaxValue))
    intercept[CoercionException](coerce(AInt, Long.MinValue))
  }

  test("NaN/Inf rejected for float→int (alba_types.rs:146-151)") {
    intercept[CoercionException](coerce(AInt, Double.NaN))
    intercept[CoercionException](coerce(ABigint, Double.PositiveInfinity))
  }

  test("string→bool accepted forms (alba_types.rs:203-211)") {
    for (s <- Seq("1", "t", "true", "TRUE")) assert(coerce(ABool, s) == true)
    for (s <- Seq("0", "f", "false", "False")) assert(coerce(ABool, s) == false)
    intercept[CoercionException](coerce(ABool, "yes"))
  }

  test("bytes→text is base64 (alba_types.rs:128-131)") {
    assert(coerce(AText, "hello".getBytes("UTF-8")) == "aGVsbG8=")
  }

  test("NULL passes through every type (SQL NULL, our extension)") {
    all.values.foreach(t => assert(coerce(t, null) == null))
  }

  test("CHAR accepts exactly one code point (alba_types.rs:217-231, standardized)") {
    assert(coerce(AChar, "x") == "x")
    assert(coerce(AChar, "é") == "é") // non-ASCII: reference's byte-length check would reject
    assert(coerce(AChar, "😀") == "😀") // one code point, two UTF-16 units
    intercept[CoercionException](coerce(AChar, "ab"))
    intercept[CoercionException](coerce(AChar, ""))
    intercept[CoercionException](coerce(AChar, 7L))
    assert(coerce(AText, coerce(AChar, "x")) == "x") // Char→Text (alba_types.rs:127)
  }

  test("NONE discards every value (alba_types.rs:273)") {
    for (v <- Seq[Any]("s", 1L, 2.5, true)) assert(coerce(ANone, v) == null)
  }

  test("property: capped strings never exceed their cap and are prefixes") {
    val strT = AString("MEDIUM-STRING", 500)
    (0 until 200).foreach { _ =>
      val s = rng.alphanumeric.take(rng.nextInt(1200)).mkString
      val out = coerce(strT, s).asInstanceOf[String]
      assert(out.length <= 500 && s.startsWith(out))
    }
  }

  test("property: capped bytes never exceed their cap (alba_types.rs:290-294)") {
    val bytesT = ABytes("NANO-BYTES", 10)
    (0 until 200).foreach { _ =>
      val b = new Array[Byte](rng.nextInt(40)); rng.nextBytes(b)
      val out = coerce(bytesT, b).asInstanceOf[Array[Byte]]
      assert(out.length <= 10)
      assert(java.util.Arrays.equals(out, b.take(out.length)))
    }
  }

  test("property: int roundtrip through string is identity") {
    (0 until 500).foreach { _ =>
      val n = rng.nextInt()
      assert(coerce(AInt, n.toString) == n)
      assert(coerce(ABigint, n.toString) == n.toLong)
    }
  }
}
