package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Z-order clustering: the property that matters is per-file min/max
  * TIGHTNESS on every participating column — that is exactly what parquet
  * footer pruning consumes at scan time.
  */
class ZOrderSpec extends SparkSpec {

  private def fileSpans(path: String, column: String): Seq[(Double, Double)] =
    spark.read.parquet(path)
      .groupBy(input_file_name())
      .agg(min(col(column).cast("double")).as("lo"),
        max(col(column).cast("double")).as("hi"))
      .collect().map(r => (r.getDouble(1), r.getDouble(2))).toSeq

  private def avgSpan(spans: Seq[(Double, Double)]): Double =
    spans.map { case (lo, hi) => hi - lo }.sum / spans.size

  test("z-ordered files have tight min/max spans on BOTH cluster columns") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("value")).na.drop()
    val base = Files.createTempDirectory("zorder")
    val shuffled = s"$base/shuffled"
    val zordered = s"$base/zordered"
    // baseline: same file count, hash-scattered rows (no locality)
    ev.repartition(8).write.mode("overwrite").parquet(shuffled)
    ZOrder.writeClustered(ev, Seq("user_id", "value"), zordered, files = 8)

    // same data either way
    assert(spark.read.parquet(zordered).count() == ev.count())

    val vShuf = avgSpan(fileSpans(shuffled, "value"))
    val vZ = avgSpan(fileSpans(zordered, "value"))
    val uShuf = avgSpan(fileSpans(shuffled, "user_id"))
    val uZ = avgSpan(fileSpans(zordered, "user_id"))
    // hash-scattered files each span ~the whole domain; z-ordered files
    // must be materially tighter on BOTH columns at once
    assert(vZ < vShuf * 0.7, s"value span not tightened: z=$vZ shuffled=$vShuf")
    assert(uZ < uShuf * 0.7, s"user_id span not tightened: z=$uZ shuffled=$uShuf")
  }

  test("zkey refuses a key wider than 63 bits instead of silently aliasing") {
    import spark.implicits._
    val df = Seq((1L, 2L, 3L, 4L, 5L)).toDF("a", "b", "c", "d", "e")
    val e = intercept[IllegalArgumentException] {
      ZOrder.zkey((1 to 5).map(i => col(df.columns(i - 1))), 16)
    }
    assert(e.getMessage.contains("63"))
  }

  test("zkey interleaves bits round-robin") {
    import spark.implicits._
    // x=0b11, y=0b00 with 2 bits → positions (0*2+0)=0 and (1*2+0)=2 → 0b101
    val df = Seq((3L, 0L)).toDF("x", "y")
    val z = df.select(ZOrder.zkey(Seq(col("x"), col("y")), 2).as("z"))
      .first().getLong(0)
    assert(z == 5L, s"expected 0b101, got $z")
  }
}
