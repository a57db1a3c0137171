package graft

import org.scalatest.funsuite.AnyFunSuite

/** Opcode-level cases for the UBJSON reader — [[graft.sources.Ubjson]]
  * is otherwise exercised only through the one shipped booster payload,
  * which pins a single format profile; these pin the decoder against
  * the rest of the spec surface (all int widths, both float widths,
  * optimized/counted/plain containers, error paths) so a future
  * XGBoost serialization change fails loudly here, not as garbage trees.
  */
class UbjsonSpec extends AnyFunSuite {
  import graft.sources.Ubjson

  private def bytes(xs: Any*): Array[Byte] = xs.flatMap {
    case b: Byte => Seq(b)
    case c: Char => Seq(c.toByte)
    case i: Int => Seq(i.toByte)
    case s: String => s.getBytes("UTF-8").toSeq
    case a: Array[Byte] => a.toSeq
  }.toArray

  private def be(v: AnyVal): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.BIG_ENDIAN)
    v match {
      case s: Short => bb.putShort(s)
      case i: Int => bb.putInt(i)
      case l: Long => bb.putLong(l)
      case f: Float => bb.putFloat(f)
      case d: Double => bb.putDouble(d)
      case _ => fail("unsupported")
    }
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }

  test("plain object with string/bool/null values") {
    val d = bytes('{', 'i', 1, 'a', 'S', 'i', 3, "xyz",
      'i', 1, 'b', 'T', 'i', 1, 'c', 'Z', '}')
    assert(Ubjson.parse(d) == Map("a" -> "xyz", "b" -> true, "c" -> null))
  }

  test("counted object (no closing brace) and every integer width") {
    val d = bytes('{', '#', 'i', 5,
      'i', 2, "i8", 'i', -2,
      'i', 2, "u8", 'U', 0xfe,
      'i', 3, "i16", 'I', be(0x1234.toShort),
      'i', 3, "i32", 'l', be(-70000),
      'i', 3, "i64", 'L', be(1234567890123L))
    assert(Ubjson.parse(d) == Map("i8" -> -2L, "u8" -> 254L,
      "i16" -> 0x1234L, "i32" -> -70000L, "i64" -> 1234567890123L))
  }

  test("optimized typed arrays decode to primitive arrays") {
    val f = bytes('[', '$', 'd', '#', 'i', 2, be(1.5f), be(-0.25f))
    assert(Ubjson.parse(f).asInstanceOf[Array[Float]].toSeq == Seq(1.5f, -0.25f))
    val l = bytes('[', '$', 'l', '#', 'i', 3, be(7), be(-1), be(0))
    assert(Ubjson.parse(l).asInstanceOf[Array[Int]].toSeq == Seq(7, -1, 0))
    val b = bytes('[', '$', 'i', '#', 'i', 2, 1, 0)
    assert(Ubjson.parse(b).asInstanceOf[Array[Byte]].toSeq == Seq(1.toByte, 0.toByte))
    val empty = bytes('[', '$', 'L', '#', 'i', 0)
    assert(Ubjson.parse(empty).asInstanceOf[Array[Long]].isEmpty)
  }

  test("plain and counted untyped arrays, floats, nesting") {
    val plain = bytes('[', 'i', 1, 'S', 'i', 1, 'a', 'T', 'Z',
      'D', be(2.5d), ']')
    assert(Ubjson.parse(plain) == Vector(1L, "a", true, null, 2.5))
    val counted = bytes('[', '#', 'i', 2, 'i', 5, 'F')
    assert(Ubjson.parse(counted) == Vector(5L, false))
    val nested = bytes('{', 'i', 1, 'k', '[', '{', 'i', 1, 'x', 'd', be(0.5f),
      '}', ']', '}')
    assert(Ubjson.parse(nested) == Map("k" -> Vector(Map("x" -> 0.5))))
  }

  test("error paths stay loud") {
    intercept[IllegalArgumentException] { Ubjson.parse(bytes('X')) }
    intercept[IllegalArgumentException] { // typed array without a count
      Ubjson.parse(bytes('[', '$', 'd', 'i', 1))
    }
    intercept[IllegalArgumentException] { // non-integer length marker
      Ubjson.parse(bytes('S', 'T'))
    }
  }
}
