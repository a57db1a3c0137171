package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression: cosine similarity between two numeric-array
  * columns, computed in double with whole-stage codegen.
  *
  * This replaces the composable-but-interpreted formulation
  * `aggregate(zip_with(a, b, …)) / (sqrt(aggregate(transform(a, …))) · …)`:
  * higher-order functions evaluate a lambda per element through the
  * interpreter, which dominates all-pairs similarity (SURVEY custom-operator
  * preference (b): a scalar `Expression` with `doGenCode` beats a UDF beats
  * interpreted lambdas). One fused loop computes dot and both norms.
  *
  * Semantics: result = dot/(√‖a‖²·√‖b‖²); null if either input is null,
  * lengths differ, any element is null, or either norm is zero — the same
  * null-propagation the interpreted chain had, so malformed vectors surface
  * as null instead of a silently-wrong similarity.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elementType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(et @ (FloatType | DoubleType), _) => Some(et)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elementType(left), elementType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"cosine_similarity expects array<float|double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  @inline private def get(ad: org.apache.spark.sql.catalyst.util.ArrayData,
                          et: DataType, i: Int): Double = et match {
    case FloatType => ad.getFloat(i).toDouble
    case _         => ad.getDouble(i)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val (etl, etr) = (elementType(left).get, elementType(right).get)
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = get(x, etl, i); val yi = get(y, etr, i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(et: DataType, src: String, idx: String): String = et match {
      case FloatType => s"(double) $src.getFloat($idx)"
      case _         => s"$src.getDouble($idx)"
    }
    val (etl, etr) = (elementType(left).get, elementType(right).get)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |boolean $bad = $n != $b.numElements();
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |  double xi = ${getter(etl, a, i)};
         |  double yi = ${getter(etr, b, i)};
         |  $dot += xi * yi; $na += xi * xi; $nb += yi * yi;
         |}
         |if ($bad || $na == 0.0 || $nb == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_similarity"
}

object GraftFunctions {

  private[functions] def build(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"cosine_similarity requires exactly 2 arguments, got ${exprs.length}")
    CosineSimilarity(exprs.head, exprs(1))
  }

  private[functions] def buildTrigram(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1,
      s"word_trigram_hashes requires exactly 1 argument, got ${exprs.length}")
    WordTrigramHashes(exprs.head)
  }

  private[functions] def buildMd5Long(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1,
      s"md5_long60 requires exactly 1 argument, got ${exprs.length}")
    Md5Long60(exprs.head)
  }

  private[functions] def buildPairExplode(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1,
      s"pair_explode requires exactly 1 argument, got ${exprs.length}")
    PairExplode(exprs.head)
  }

  private[functions] def buildSparseDot(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 4,
      s"sparse_dot requires exactly 4 arguments, got ${exprs.length}")
    SparseDot(exprs.head, exprs(1), exprs(2), exprs(3))
  }

  /** Idempotent session-level registration so `selectExpr`/SQL can call
    * the graft functions without configuring extensions.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity", build, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_trigram_hashes", buildTrigram, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_long60", buildMd5Long, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pair_explode", buildPairExplode, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sparse_dot", buildSparseDot, "built-in")
  }
}

/** `SparkSessionExtensions` hook (SURVEY custom-operator preference (c)):
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` makes the
  * function available in every session, SQL included, with no runtime
  * registration call.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      GraftFunctions.build _))
    ext.injectFunction((
      FunctionIdentifier("word_trigram_hashes"),
      new ExpressionInfo(classOf[WordTrigramHashes].getName, "word_trigram_hashes"),
      GraftFunctions.buildTrigram _))
    ext.injectFunction((
      FunctionIdentifier("md5_long60"),
      new ExpressionInfo(classOf[Md5Long60].getName, "md5_long60"),
      GraftFunctions.buildMd5Long _))
    ext.injectFunction((
      FunctionIdentifier("pair_explode"),
      new ExpressionInfo(classOf[PairExplode].getName, "pair_explode"),
      GraftFunctions.buildPairExplode _))
    ext.injectFunction((
      FunctionIdentifier("sparse_dot"),
      new ExpressionInfo(classOf[SparseDot].getName, "sparse_dot"),
      GraftFunctions.buildSparseDot _))
    // Opt-in scale guardrail (spark.graft.failOnGlobalWindow=true): fail
    // analysis on partition-less windows — the single-task funnel shape.
    ext.injectCheckRule(session =>
      new graft.plans.GlobalWindowGuard.CheckRule(session))
  }
}
