package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/** Native Bloom build + probe on Catalyst's own expressions — the same
  * `bloom_filter_agg` / `might_contain` pair InjectRuntimeFilter plans
  * for runtime semi-join reduction (PlanSpec pins that machinery). The
  * previous formulation probed through a Scala UDF over a broadcast
  * `util.sketch.BloomFilter`, which broke whole-stage codegen at every
  * probe site; `BloomFilterMightContain` has `doGenCode`, so the probe
  * filter now stays inside the generated stage.
  *
  * Contract notes:
  *  - membership is over xxhash64(value) (seed 42, Spark's default) on
  *    BOTH build and probe side — consistent, no false negatives;
  *  - the built filter travels as a driver-collected binary literal
  *    (`might_contain` requires a foldable/scalar-subquery filter arg),
  *    exactly how the runtime-filter rule ships its subquery result;
  *  - a NULL probe value is reported NOT-contained, matching the old
  *    UDF's null guard.
  */
object GraftBloom {

  /** Builds the serialized Bloom filter over `c` with one distributed
    * aggregate (no row ever reaches the driver except the final blob).
    */
  def buildBytes(df: DataFrame, c: Column, estimatedNumItems: Long,
                 fpp: Double = 0.03): Array[Byte] = {
    val n = math.max(estimatedNumItems, 1L)
    // standard optimal sizing: m = -n·ln(p) / ln(2)²
    val numBits = math.max(64L,
      math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(GraftSqlBridge.expression(c))),
      Literal(n), Literal(numBits)).toAggregateExpression()
    df.agg(GraftSqlBridge.column(agg).as("bf")).head().getAs[Array[Byte]](0)
  }

  /** Codegen'd membership probe: false for NULL, no false negatives for
    * values the filter was built over.
    */
  def mightContain(bloomBytes: Array[Byte], c: Column): Column =
    c.isNotNull && GraftSqlBridge.column(BloomFilterMightContain(
      Literal.create(bloomBytes, BinaryType),
      new XxHash64(Seq(GraftSqlBridge.expression(c)))))
}
