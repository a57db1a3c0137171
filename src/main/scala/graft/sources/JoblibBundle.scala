package graft.sources

import java.nio.file.{Files, Paths}
import scala.collection.mutable

/** S7/X1 model-artifact bridge: a dependency-free reader for the
  * reference's shipped joblib bundle
  * (`data/models/next_hour_congestion.joblib`, loaded at
  * `streamlit_app.py:727-737` and surfaced at `:862-872`). The bundle is
  * a pickle-protocol-4 stream in which joblib interleaves numpy array
  * payloads: after each `NumpyArrayWrapper` object is BUILT, the raw
  * array bytes (numeric dtypes, preceded by an alignment-padding byte)
  * or a complete nested pickle (object dtypes) follow INLINE, outside
  * the opcode stream — which is why a stock pickle scanner derails and
  * why this reader special-cases exactly that wrapper.
  *
  * Scope: a minimal pickle VM covering the opcode set such bundles use,
  * enough to materialize the top-level dict's PLAIN fields —
  * `num_cols`, `cat_cols`, `label_rule`, `trained_at`, `metrics` — the
  * metadata the reference's own UI reads. Model objects (sklearn
  * pipeline, XGBoost booster blob) are structurally traversed but kept
  * as opaque [[JoblibBundle.PyObj]] nodes: scoring stays with the
  * native spec/GBT route (SURVEY §7.4), this closes the artifact
  * INGESTION gap. Driver-side, zero Spark dependency, read-only.
  */
object JoblibBundle {

  /** Opaque python object node: class name, constructor/reduce args,
    * and (after BUILD) its state — inspectable, never executed.
    */
  final class PyObj(val cls: String, val args: Any) {
    var state: Any = null
    override def toString: String = s"<$cls>"
  }

  /** Reserved state key under which a NumpyArrayWrapper's inline payload
    * is captured: raw little-endian bytes for numeric dtypes, the parsed
    * nested-pickle value for object dtypes.
    */
  val PayloadKey = "__graft_payload"

  /** Decode a captured numeric wrapper as doubles (little-endian `f8`,
    * or widened `i8`/`i4`/`f4`). */
  def wrapperDoubles(w: PyObj): Array[Double] = {
    val st = w.state.asInstanceOf[mutable.LinkedHashMap[Any, Any]]
    val dts = st("dtype") match {
      case p: PyObj => p.args.asInstanceOf[Vector[Any]].head.toString
      case s => s.toString
    }
    // numpy spells byte order as a '<'/'>'/'=' prefix; this reader only
    // decodes little-endian (every x86/arm-produced bundle). '>' data
    // read as LE would be silent garbage — reject loudly instead.
    require(!dts.startsWith(">"),
      s"big-endian numpy payload ($dts) unsupported")
    val raw = st(PayloadKey).asInstanceOf[Array[Byte]]
    val bb = java.nio.ByteBuffer.wrap(raw).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    dts.filter(_.isLetterOrDigit) match {
      case "f8" => Array.fill(raw.length / 8)(bb.getDouble)
      case "f4" => Array.fill(raw.length / 4)(bb.getFloat.toDouble)
      case "i8" => Array.fill(raw.length / 8)(bb.getLong.toDouble)
      case "i4" => Array.fill(raw.length / 4)(bb.getInt.toDouble)
      case other => throw new IllegalArgumentException(
        s"unsupported numeric wrapper dtype $other")
    }
  }

  /** Decode a captured object wrapper (e.g. an array of level strings)
    * as the parsed nested-pickle payload list. Numpy pickles an object
    * ndarray via `_reconstruct` whose BUILD state is the tuple
    * (version, shape, dtype, is_fortran, elements) — the elements list
    * is what callers want.
    */
  def wrapperObjects(w: PyObj): Seq[Any] = {
    def elems(v: Any): Seq[Any] = v match {
      case b: mutable.ArrayBuffer[Any @unchecked] => b.toSeq
      case vec: Vector[Any @unchecked] if vec.nonEmpty => elems(vec.last)
      case p: PyObj if p.state != null => elems(p.state)
      case other => Seq(other)
    }
    elems(w.state.asInstanceOf[mutable.LinkedHashMap[Any, Any]](PayloadKey))
  }

  private object Marker

  /** Parse the pickle stream at `pos`; returns (root value, end pos).
    * `toplevel` enables joblib's wrapper-payload protocol (nested
    * pickles parse with `toplevel=false`: numpy writes object arrays as
    * plain pickles with no interleaved payloads).
    */
  private def parse(d: Array[Byte], start: Int, toplevel: Boolean): (Any, Int) = {
    var pos = start
    val stack = mutable.ArrayBuffer.empty[Any]
    val memo = mutable.ArrayBuffer.empty[Any]
    def u8(i: Int): Int = d(i) & 0xff
    def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def i32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (d(i + 3) << 24)
    def i64(i: Int): Long = (0 until 8).map(k => (d(i + k) & 0xffL) << (8 * k)).reduce(_ | _)
    def utf8(i: Int, n: Int) = new String(d, i, n, "UTF-8")
    def popMark(): mutable.ArrayBuffer[Any] = {
      val i = stack.lastIndexWhere(_ == Marker)
      val items = stack.slice(i + 1, stack.length)
      stack.remove(i, stack.length - i)
      items
    }
    while (true) {
      val op = u8(pos); pos += 1
      (op: @annotation.switch) match {
        case 0x80 => pos += 1                                     // PROTO
        case 0x95 => pos += 8                                     // FRAME
        case 0x8c => val n = u8(pos); pos += 1                    // SHORT_BINUNICODE
          stack += utf8(pos, n); pos += n
        case 0x58 => val n = i32(pos); pos += 4                   // BINUNICODE
          stack += utf8(pos, n); pos += n
        case 0x8d => val n = i64(pos).toInt; pos += 8             // BINUNICODE8
          stack += utf8(pos, n); pos += n
        case 0x43 => val n = u8(pos); pos += 1                    // SHORT_BINBYTES
          stack += d.slice(pos, pos + n); pos += n
        case 0x42 => val n = i32(pos); pos += 4                   // BINBYTES
          stack += d.slice(pos, pos + n); pos += n
        case 0x8e | 0x96 => val n = i64(pos).toInt; pos += 8      // BINBYTES8/BYTEARRAY8
          stack += d.slice(pos, pos + n); pos += n
        case 0x94 => memo += stack.last                           // MEMOIZE
        case 0x68 => stack += memo(u8(pos)); pos += 1             // BINGET
        case 0x6a => stack += memo(i32(pos)); pos += 4            // LONG_BINGET
        case 0x7d => stack += mutable.LinkedHashMap.empty[Any, Any] // EMPTY_DICT
        case 0x5d => stack += mutable.ArrayBuffer.empty[Any]      // EMPTY_LIST
        case 0x28 => stack += Marker                              // MARK
        case 0x29 => stack += Vector.empty[Any]                   // EMPTY_TUPLE
        case 0x85 => val a = stack.remove(stack.length - 1)       // TUPLE1
          stack += Vector(a)
        case 0x86 => val b = stack.remove(stack.length - 1)       // TUPLE2
          val a = stack.remove(stack.length - 1); stack += Vector(a, b)
        case 0x87 => val c = stack.remove(stack.length - 1)       // TUPLE3
          val b = stack.remove(stack.length - 1)
          val a = stack.remove(stack.length - 1); stack += Vector(a, b, c)
        case 0x74 => stack += popMark().toVector                  // TUPLE
        case 0x93 =>                                              // STACK_GLOBAL
          val name = stack.remove(stack.length - 1)
          val mod = stack.remove(stack.length - 1)
          stack += new PyObj(s"$mod.$name", null)
        case 0x81 =>                                              // NEWOBJ
          val args = stack.remove(stack.length - 1)
          val cls = stack.remove(stack.length - 1)
          stack += new PyObj(cls.asInstanceOf[PyObj].cls, args)
        case 0x52 =>                                              // REDUCE
          val args = stack.remove(stack.length - 1)
          val fn = stack.remove(stack.length - 1)
          val cls = fn match { case p: PyObj => p.cls; case o => String.valueOf(o) }
          stack += new PyObj(cls, args)
        case 0x62 =>                                              // BUILD
          val state = stack.remove(stack.length - 1)
          stack.last match {
            case obj: PyObj =>
              obj.state = state
              // joblib protocol: a wrapper's array payload sits inline
              // right after its BUILD — consume it or every later
              // opcode misparses. Object dtypes carry a nested pickle;
              // numeric dtypes carry a padding byte + raw buffer.
              if (toplevel && obj.cls.endsWith("NumpyArrayWrapper")) {
                val st = state.asInstanceOf[mutable.LinkedHashMap[Any, Any]]
                val dts = st("dtype") match {
                  case p: PyObj => p.args.asInstanceOf[Vector[Any]].head.toString
                  case s => s.toString
                }
                // the payload is CAPTURED into the wrapper state (reserved
                // __data key) — round 5 merely skipped it; the tree-walk
                // scorer needs the scaler/encoder array VALUES
                if (dts.contains("O")) {
                  val (payload, end) = parse(d, pos, toplevel = false)
                  st(PayloadKey) = payload
                  pos = end
                } else {
                  if (st.get("numpy_array_alignment_bytes").exists(_ != null)) {
                    val pad = u8(pos); pos += 1 + pad
                  }
                  val itemsize = dts.filter(_.isDigit).toInt
                  val n = st("shape").asInstanceOf[Vector[Any]]
                    .map(x => x.asInstanceOf[Number].longValue)
                    .product.max(1L)
                  st(PayloadKey) = d.slice(pos, pos + (itemsize * n).toInt)
                  pos += (itemsize * n).toInt
                }
              }
            case _ => ()
          }
        case 0x4e => stack += null                                // NONE
        case 0x88 => stack += true                                // NEWTRUE
        case 0x89 => stack += false                               // NEWFALSE
        case 0x47 =>                                              // BINFLOAT (big-endian)
          val bits = (0 until 8).map(k => (d(pos + k) & 0xffL) << (8 * (7 - k))).reduce(_ | _)
          stack += java.lang.Double.longBitsToDouble(bits); pos += 8
        case 0x4b => stack += u8(pos).toLong; pos += 1            // BININT1
        case 0x4d => stack += u16(pos).toLong; pos += 2           // BININT2
        case 0x4a => stack += i32(pos).toLong; pos += 4           // BININT
        case 0x8a =>                                              // LONG1
          val n = u8(pos); pos += 1
          var v = 0L
          var k = n - 1
          while (k >= 0) { v = (v << 8) | (d(pos + k) & 0xffL); k -= 1 }
          // sign-extend only when the value occupies < 8 bytes: for n == 8
          // the 64-bit accumulation is already exact two's complement, and
          // (1L << 64) is 1 on the JVM (shift count mod 64) — applying it
          // would silently decrement every negative 8-byte long
          if (n > 0 && n < 8 && d(pos + n - 1) < 0) v -= (1L << (8 * n))
          stack += v; pos += n
        case 0x73 =>                                              // SETITEM
          val v = stack.remove(stack.length - 1)
          val k = stack.remove(stack.length - 1)
          stack.last.asInstanceOf[mutable.LinkedHashMap[Any, Any]](k) = v
        case 0x75 =>                                              // SETITEMS
          val items = popMark()
          val m = stack.last.asInstanceOf[mutable.LinkedHashMap[Any, Any]]
          items.grouped(2).foreach { case mutable.ArrayBuffer(k, v) => m(k) = v }
        case 0x61 =>                                              // APPEND
          val v = stack.remove(stack.length - 1)
          stack.last.asInstanceOf[mutable.ArrayBuffer[Any]] += v
        case 0x65 =>                                              // APPENDS
          val items = popMark()
          stack.last.asInstanceOf[mutable.ArrayBuffer[Any]] ++= items
        case 0x2e =>                                              // STOP
          return (stack.remove(stack.length - 1), pos)
        case other =>
          throw new IllegalArgumentException(
            f"joblib bundle: unsupported pickle opcode 0x$other%02x at ${pos - 1}")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Parse a raw pickle byte stream — test hook for opcode-level cases
    * (e.g. LONG1 sign handling) that the shipped bundle doesn't exercise.
    */
  private[graft] def parsePickle(d: Array[Byte]): Any = parse(d, 0, toplevel = true)._1

  /** Load the bundle's top-level dict (plain values + opaque PyObj
    * nodes for model objects).
    */
  def load(path: String): mutable.LinkedHashMap[Any, Any] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val (root, end) = parse(bytes, 0, toplevel = true)
    require(end == bytes.length,
      s"joblib bundle: trailing ${bytes.length - end} unparsed bytes")
    root.asInstanceOf[mutable.LinkedHashMap[Any, Any]]
  }

  /** The reference bundle's published metadata (BASELINE.md rows 4-8). */
  final case class BundleMeta(
      numCols: Seq[String], catCols: Seq[String],
      labelMetric: String, labelQuantile: Double, hiBadPrimary: Boolean,
      composite: Seq[String], trainedAt: String,
      metrics: Map[String, Double])

  /** Read just the metadata surface the reference UI consumes
    * (`bundle.get("num_cols"/"cat_cols"/"label_rule"/"metrics")`,
    * streamlit_app.py:718-719,737,865-872).
    */
  def readMeta(path: String): BundleMeta = {
    val root = load(path)
    def strs(v: Any): Seq[String] =
      v.asInstanceOf[mutable.ArrayBuffer[Any]].toSeq.map(_.toString)
    val rule = root("label_rule").asInstanceOf[mutable.LinkedHashMap[Any, Any]]
    val mets = root("metrics").asInstanceOf[mutable.LinkedHashMap[Any, Any]]
    BundleMeta(
      numCols = strs(root("num_cols")),
      catCols = strs(root("cat_cols")),
      labelMetric = rule("metric").toString,
      labelQuantile = rule("q").asInstanceOf[Double],
      hiBadPrimary = rule("hi_bad_primary").asInstanceOf[Boolean],
      composite = strs(rule("composite")),
      trainedAt = root("trained_at").toString,
      metrics = mets.map { case (k, v) =>
        k.toString -> v.asInstanceOf[Number].doubleValue
      }.toMap)
  }
}
