package graft.ext

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the shared posting-list pair-emission kernel
  * (TextOps.pairExplode, backed by the native graft.functions.PairExplode
  * generator) that d05/d06/d07/d41/e06/e17 candidate generation rests on:
  * for a sorted posting list of n distinct members it must emit exactly
  * C(n,2) pairs, each ordered, covering every combination — and must be
  * row-for-row identical (values AND order) to the transform/flatten/
  * explode lambda chain it replaced.
  */
class PairExplodeSpec extends graft.SparkSpec {
  import spark.implicits._

  /** The pre-round-8 SQL lambda form, kept as the equivalence oracle. */
  private val lambdaForm =
    """explode(flatten(transform(sequence(1, size(ds) - 1),
      |  i -> transform(slice(ds, i + 1, size(ds) - i),
      |       d -> struct(element_at(ds, i) AS x, d AS y))))) AS p""".stripMargin

  private def draw[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))

  test("pairExplode emits exactly the ordered pair set of each posting list") {
    val gen = Gen.chooseNum(2, 12).flatMap(n => Gen.pick(n, 0L until 100L))
    draw(gen, 10).zipWithIndex.foreach { case (ids, g) =>
      val sorted = ids.toSeq.sorted
      val df = Seq((g, sorted)).toDF("grp", "ds")
      val got = df.selectExpr(TextOps.pairExplode)
        .selectExpr("x AS a", "y AS b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = (for {
        i <- sorted.indices; j <- (i + 1) until sorted.size
      } yield (sorted(i), sorted(j))).toSet
      assert(got == expected, s"group $g: got ${got.size}, expected ${expected.size}")
      assert(got.forall { case (a, b) => a < b })
    }
  }

  test("native pair_explode is row-for-row identical to the lambda chain") {
    val gen = Gen.chooseNum(2, 15).flatMap(n => Gen.pick(n, 0L until 200L))
    draw(gen, 12).zipWithIndex.foreach { case (ids, g) =>
      val df = Seq((g, ids.toSeq.sorted)).toDF("grp", "ds")
      val native = df.selectExpr(TextOps.pairExplode)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val lambda = df.selectExpr(lambdaForm)
        .selectExpr("p.x", "p.y")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(native == lambda, s"group $g order/value drift")
    }
  }

  test("native pair_explode: struct elements, empty/singleton/null lists") {
    // struct payloads (the d05/d07/e06 shape) survive field access
    val s = Seq((1L, Seq((10L, "a"), (20L, "b"), (30L, "c"))))
      .toDF("grp", "raw")
      .selectExpr("grp", "transform(raw, r -> struct(r._1 AS id, r._2 AS tag)) AS ds")
      .selectExpr(TextOps.pairExplode)
      .selectExpr("x.id AS xi", "y.id AS yi", "x.tag AS xt", "y.tag AS yt")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(s.toSeq == Seq((10L, 20L, "a", "b"), (10L, 30L, "a", "c"),
      (20L, 30L, "b", "c")))
    // degenerate lists emit nothing (no upstream guard needed)
    val deg = Seq(
      (0L, Seq.empty[Long]), (1L, Seq(42L))).toDF("grp", "ds")
      .selectExpr(TextOps.pairExplode).count()
    assert(deg == 0L)
    val nul = spark.sql("SELECT CAST(NULL AS ARRAY<BIGINT>) AS ds")
      .selectExpr(TextOps.pairExplode).count()
    assert(nul == 0L)
  }
}
