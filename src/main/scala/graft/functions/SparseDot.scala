package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native sparse inner product over sorted posting arrays:
  * `sparse_dot(keys_a, vals_a, keys_b, vals_b)` — a linear merge-
  * intersect of two key-sorted long arrays accumulating Σ vals_a·vals_b
  * over the shared keys. This is the verify kernel of the AllPairs
  * similarity join (Bayardo et al., WWW 2007, "Scaling Up All Pairs
  * Similarity Search"): candidate pairs come from a prefix-filtered
  * posting join, and the exact dot runs per pair in O(|a| + |b|) with
  * zero allocation — no map probe (Catalyst `element_at` on MapData is
  * a linear scan per lookup, O(|a|·|b|) per pair) and no re-join back
  * through the posting index.
  *
  * Both key arrays MUST be sorted ascending (callers build them with
  * `sort_array(collect_list(struct(key, val)))`, which orders by the
  * first struct field) and key-unique per side; keys and vals are
  * positionally aligned. The result is an exact integer — the float
  * policy of the dedup family (graft.QueryDef rule 5) keeps dots in
  * long space until the single closing division.
  */
case class SparseDot(
    first: Expression,
    second: Expression,
    third: Expression,
    fourth: Expression)
  extends QuaternaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult = {
    // validate EVERY child: a collectFirst over a total partial function
    // only ever inspected argument 1, letting sparse_dot(ok, 'oops', x, y)
    // slip past analysis into a runtime ClassCastException
    val bad = children.map(_.dataType).zipWithIndex.collect {
      case (other, i) if !other.isInstanceOf[ArrayType] ||
          other.asInstanceOf[ArrayType].elementType != LongType =>
        s"argument ${i + 1} must be array<bigint>, got ${other.simpleString}"
    }
    bad.headOption.map(TypeCheckResult.TypeCheckFailure)
      .getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  override protected def nullSafeEval(ka: Any, va: Any, kb: Any, vb: Any): Any =
    SparseDot.dot(ka.asInstanceOf[ArrayData], va.asInstanceOf[ArrayData],
      kb.asInstanceOf[ArrayData], vb.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.functions.SparseDot.dot($a, $b, $c, $d)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond,
      third = newThird, fourth = newFourth)

  override def prettyName: String = "sparse_dot"
}

object SparseDot {

  /** Merge-intersect of two ascending key arrays; see [[SparseDot]]. */
  def dot(ka: ArrayData, va: ArrayData, kb: ArrayData, vb: ArrayData): Long = {
    val n = ka.numElements()
    val m = kb.numElements()
    var i = 0
    var j = 0
    var acc = 0L
    while (i < n && j < m) {
      val x = ka.getLong(i)
      val y = kb.getLong(j)
      if (x == y) { acc += va.getLong(i) * vb.getLong(j); i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    acc
  }
}
