package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native portable 60-bit md5 hash: `md5_long60(s)` ==
  * `CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)` — the
  * cross-engine hash the oracle-checked dedup/split/sample queries pin
  * (DuckDB: `('0x' || substr(md5(s),1,15))::BIGINT`) — computed straight
  * from the digest bytes. The built-in chain materializes a 32-char hex
  * string, substrings it, and re-parses hex through `conv` (another
  * string) per call; this expression is digest → big-endian long >>> 4,
  * zero intermediate strings. Equivalence is pinned in
  * CosineSimilaritySpec.
  *
  * The first 15 hex digits are the first 7.5 digest bytes, so the value
  * is the big-endian 64-bit read of bytes 0-7 shifted right 4 (unsigned:
  * 60 bits always fit positive).
  */
case class Md5Long60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_long60 expects a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    Md5Long.hash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Long.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "md5_long60"
}

object Md5Long {

  // MessageDigest is not thread-safe and allocation is measurable on hot
  // paths — one instance per executor thread, reset per call.
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** See [[Md5Long60]]. */
  def hash60(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }
}
