package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType}

/** Native Catalyst expression scoring a decoded XGBoost ensemble
  * ([[graft.sources.XgbBundle.Model]]): children are the model's feature
  * columns (float32, DMatrix dtype, in ColumnTransformer order); the
  * result is `predict_proba[:, 1]`.
  *
  * Why an `Expression` and not per-tree CASE columns: the unrolled CASE
  * form is ~14k `when` nodes for this bundle (200 trees × ≤73 nodes),
  * which overflows Janino's 64 KB method limit — whole-stage codegen
  * aborts and the WHOLE stage falls back to interpreted evaluation
  * (measured on the reference bundle; chunking into 25 partial-margin
  * columns still overflowed the fused stage). Walking the tree ARRAYS as
  * data keeps generated code O(num_features): evaluate the children,
  * fill a float[], call the model's walker — the stage stays inside
  * whole-stage codegen and the walk itself is a tight JIT-compiled loop
  * over primitive arrays (SURVEY custom-operator preference (b)).
  *
  * Null children become NaN, XGBoost's missing-value encoding, routed by
  * each node's `default_left` — semantics pinned in TelemetrySpec
  * against a hand-built ensemble.
  */
case class XgbScore(children: Seq[Expression],
    model: graft.sources.XgbBundle.Model) extends Expression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.length != model.numFeature)
      TypeCheckResult.TypeCheckFailure(
        s"xgb_score expects ${model.numFeature} feature columns, got ${children.length}")
    else if (!children.forall(_.dataType == FloatType))
      TypeCheckResult.TypeCheckFailure("xgb_score features must be FLOAT " +
        "(the DMatrix dtype — cast upstream so the f32 rounding happens once)")
    else TypeCheckResult.TypeCheckSuccess

  override def eval(input: InternalRow): Any = {
    val fv = new Array[Float](children.length)
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      fv(i) = if (v == null) Float.NaN else v.asInstanceOf[Float]
      i += 1
    }
    model.predictFv(fv)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val modelRef = ctx.addReferenceObj("xgbModel", model,
      classOf[graft.sources.XgbBundle.Model].getName)
    val fv = ctx.freshName("fv")
    val childGen = children.map(_.genCode(ctx))
    val fills = childGen.zipWithIndex.map { case (g, i) =>
      s"""${g.code}
         |$fv[$i] = ${g.isNull} ? Float.NaN : ${g.value};""".stripMargin
    }
    // each fill is a couple of statements; splitExpressions keeps the
    // method under Janino limits however wide the feature vector gets
    val fillCode = ctx.splitExpressionsWithCurrentInputs(fills,
      funcName = "xgbFeature",
      extraArguments = ("float[]", fv) :: Nil)
    ev.copy(
      code = code"""
        |float[] $fv = new float[${children.length}];
        |$fillCode
        |double ${ev.value} = $modelRef.predictFv($fv);""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)

  override def prettyName: String = "xgb_score"
}
