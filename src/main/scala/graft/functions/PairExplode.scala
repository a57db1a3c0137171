package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native posting-list pair generator: `pair_explode(ds)` emits one row
  * `(x, y)` per ordered index pair i < j of the input array — the
  * candidate-pair kernel of every inverted-index dedup plan (d05/d06/
  * d07/d41/e06/e17 build pairs from per-key posting lists).
  *
  * Why an expression and not the SQL lambda chain it replaces
  * (`explode(flatten(transform(sequence(...), i -> transform(slice(...),
  * ...))))`, the previous `TextOps.pairExplode`): that form MATERIALIZES
  * the full C(n,2) pair array per posting list — an array of structs,
  * each holding copies of both elements — before `explode` walks it. For
  * a bounded demo list that is waste; for the hot posting list a 100 TB
  * corpus will always contain somewhere (even behind d39's frequency
  * cap, caps are per-plan choices), it is the allocation that kills the
  * task. This generator yields pairs LAZILY from a two-index cursor over
  * the original array buffer: per-pair cost is two element reads and one
  * 2-field row, peak memory is O(1) beyond the input list itself.
  *
  * Emission order is the same (1,2),(1,3),…,(2,3),… walk the lambda
  * chain produced, so plans are bit-identical for order-insensitive
  * consumers (all of them aggregate or filter) AND for any future
  * order-sensitive one. Null/empty/singleton arrays emit nothing — an
  * improvement over the lambda form, which REQUIRED the callers'
  * upstream `size(ds) > 1` guard (`sequence(1, 0)` descends and its
  * `element_at(ds, 0)` then errors on a singleton list); callers keep
  * the guard anyway since it also prunes singleton groups before the
  * generate. Interpreted generation
  * (CodegenFallback): GenerateExec runs the cursor as-is while the
  * surrounding stages stay in whole-stage codegen — the loop body is
  * two flat array reads, there is nothing for codegen to fuse.
  */
case class PairExplode(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: ArrayType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pair_explode requires an array argument, got ${other.catalogString}")
  }

  private lazy val elementType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def elementSchema: StructType = StructType(
    StructField("x", elementType, nullable = true) ::
    StructField("y", elementType, nullable = true) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < 2) Iterator.empty
    else new Iterator[InternalRow] {
      private val n = arr.numElements()
      private var i = 0
      private var j = 1
      override def hasNext: Boolean = j < n
      override def next(): InternalRow = {
        val row = InternalRow(arr.get(i, elementType), arr.get(j, elementType))
        j += 1
        if (j >= n) { i += 1; j = i + 1 }
        row
      }
    }
  }

  override def prettyName: String = "pair_explode"

  override protected def withNewChildInternal(newChild: Expression): PairExplode =
    copy(child = newChild)
}
