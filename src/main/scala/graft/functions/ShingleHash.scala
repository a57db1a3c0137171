package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native word-trigram shingle hashing: `word_trigram_hashes(text)` returns
  * the xxhash64 of every consecutive 3-token window of a space-separated
  * string, bit-identical to
  * `transform(sequence(1, size(split(text,' '))-2), i -> xxhash64(concat_ws(' ', slice(split(text,' '), i, 3))))`
  * but with ZERO string materialization: because tokens are space-split
  * substrings, the trigram string "tokᵢ tokᵢ₊₁ tokᵢ₊₂" is exactly the byte
  * range [start(i), end(i+2)) of the original text — including the
  * empty-token behavior of split(' ') on consecutive spaces — so each hash
  * is one `XXH64.hashUnsafeBytes` over that range (seed 42 = Spark's
  * xxhash64). The built-in formulation allocates a token array, a sequence
  * array and one string per shingle per row; this is the measured hot path
  * of every shingle-based dedup operator (d05/d06/d07).
  *
  * Docs with fewer than 3 tokens yield an empty array (callers filter on
  * `size(...) > 0`, equivalent to the `size(toks) >= 3` guard).
  */
case class WordTrigramHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_trigram_hashes expects a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleHash.trigramHashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHash.trigramHashes($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "word_trigram_hashes"
}

object ShingleHash {

  private val Seed = 42L // Spark's xxhash64 default seed

  /** See [[WordTrigramHashes]]. Single pass over the UTF-8 bytes: record
    * token boundaries (split on 0x20 — multi-byte UTF-8 never contains
    * 0x20 as a continuation byte, so byte-level splitting equals
    * character-level), then hash each 3-token byte range in place.
    */
  def trigramHashes(text: UTF8String): ArrayData = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val n = text.numBytes
    // token k occupies bytes [starts(k), ends(k)); split(' ') semantics:
    // k tokens = k-1 separators, empty tokens included
    var ntok = 1
    var i = 0
    while (i < n) {
      if (Platform.getByte(base, off + i) == 0x20) ntok += 1
      i += 1
    }
    if (ntok < 3) return new GenericArrayData(Array.emptyLongArray)
    val starts = new Array[Int](ntok)
    val ends = new Array[Int](ntok)
    var k = 0
    var tokStart = 0
    i = 0
    while (i <= n) {
      if (i == n || Platform.getByte(base, off + i) == 0x20) {
        starts(k) = tokStart; ends(k) = i; k += 1; tokStart = i + 1
      }
      i += 1
    }
    val out = new Array[Long](ntok - 2)
    k = 0
    while (k < ntok - 2) {
      val s = starts(k)
      out(k) = XXH64.hashUnsafeBytes(base, off + s, ends(k + 2) - s, Seed)
      k += 1
    }
    new GenericArrayData(out)
  }
}
