package graft.sources

import scala.collection.mutable

/** Minimal UBJSON (Draft-12) reader — the serialization XGBoost ≥ 1.6
  * uses for `Booster` pickling (`save_raw("ubj")`; the bytearray inside
  * the reference bundle's `_Booster.handle`, streamlit_app.py:729 loads
  * it via joblib). Dependency-free, read-only, driver-side.
  *
  * Shapes produced: objects → `Map[String, Any]`, arrays → `Vector[Any]`
  * or primitive arrays for the optimized typed form (`Array[Float]`,
  * `Array[Double]`, `Array[Int]`, `Array[Long]`, `Array[Byte]`),
  * numbers → Long / Double, strings → String, T/F/Z → Boolean / null.
  *
  * Big-endian per spec — note the OPPOSITE of the numpy payloads in the
  * same file, which is why the two readers don't share buffer code.
  */
object Ubjson {

  def parse(d: Array[Byte]): Any = {
    val bb = java.nio.ByteBuffer.wrap(d).order(java.nio.ByteOrder.BIG_ENDIAN)
    val v = readValue(bb, bb.get())
    v
  }

  private def readLen(bb: java.nio.ByteBuffer, marker: Byte): Long = marker match {
    case 'i' => bb.get().toLong
    case 'U' => (bb.get() & 0xff).toLong
    case 'I' => bb.getShort.toLong
    case 'l' => bb.getInt.toLong
    case 'L' => bb.getLong
    case m => throw new IllegalArgumentException(
      s"ubjson: expected an integer length marker, got '${m.toChar}'")
  }

  private def readString(bb: java.nio.ByteBuffer): String = {
    val n = readLen(bb, bb.get()).toInt
    val a = new Array[Byte](n)
    bb.get(a)
    new String(a, "UTF-8")
  }

  private def readValue(bb: java.nio.ByteBuffer, marker: Byte): Any = marker match {
    case 'Z' => null
    case 'T' => true
    case 'F' => false
    case 'N' => readValue(bb, bb.get()) // no-op marker, read next
    case 'i' => bb.get().toLong
    case 'U' => (bb.get() & 0xff).toLong
    case 'I' => bb.getShort.toLong
    case 'l' => bb.getInt.toLong
    case 'L' => bb.getLong
    case 'd' => bb.getFloat.toDouble
    case 'D' => bb.getDouble
    case 'C' => bb.get().toChar.toString
    case 'S' | 'H' => readString(bb)
    case '[' => readArray(bb)
    case '{' => readObject(bb)
    case m => throw new IllegalArgumentException(
      s"ubjson: unknown value marker '${m.toChar}' (0x${(m & 0xff).toHexString})")
  }

  private def readArray(bb: java.nio.ByteBuffer): Any = {
    var m = bb.get()
    var elemType: Byte = 0
    var count = -1L
    if (m == '$') { elemType = bb.get(); m = bb.get() }
    if (m == '#') { count = readLen(bb, bb.get()) }
    else require(elemType == 0, "ubjson: typed array without a count")
    if (elemType != 0) {
      // optimized typed arrays decode straight into primitive arrays —
      // tree payloads (split conditions, child indices) land here
      val n = count.toInt
      elemType match {
        case 'd' => Array.fill(n)(bb.getFloat)
        case 'D' => Array.fill(n)(bb.getDouble)
        case 'l' => Array.fill(n)(bb.getInt)
        case 'L' => Array.fill(n)(bb.getLong)
        case 'I' => Array.fill(n)(bb.getShort.toInt)
        case 'i' | 'U' => Array.fill(n)(bb.get())
        case t => Vector.fill(n)(readValue(bb, t))
      }
    } else if (count >= 0) {
      Vector.fill(count.toInt)(readValue(bb, bb.get()))
    } else {
      val out = Vector.newBuilder[Any]
      var mm = m
      while (mm != ']') { out += readValue(bb, mm); mm = bb.get() }
      out.result()
    }
  }

  private def readObject(bb: java.nio.ByteBuffer): Map[String, Any] = {
    val out = mutable.LinkedHashMap.empty[String, Any]
    var m = bb.get()
    var count = -1L
    if (m == '$')
      throw new IllegalArgumentException("ubjson: typed objects unsupported")
    if (m == '#') { count = readLen(bb, bb.get()) }
    if (count >= 0) {
      var k = 0L
      while (k < count) {
        val key = { val n = readLen(bb, bb.get()).toInt
          val a = new Array[Byte](n); bb.get(a); new String(a, "UTF-8") }
        out(key) = readValue(bb, bb.get())
        k += 1
      }
    } else {
      while (m != '}') {
        // key: length-prefixed bytes (no 'S' marker inside objects)
        val n = readLen(bb, m).toInt
        val a = new Array[Byte](n); bb.get(a)
        out(new String(a, "UTF-8")) = readValue(bb, bb.get())
        m = bb.get()
      }
    }
    out.toMap
  }
}
