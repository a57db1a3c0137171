package graft.ext

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the shared posting-list pair-emission kernel
  * (TextOps.pairExplode) that d05/d06/d07/e06 candidate generation rests
  * on: for a sorted posting list of n distinct members it must emit
  * exactly C(n,2) pairs, each ordered, covering every combination.
  */
class PairExplodeSpec extends graft.SparkSpec {
  import spark.implicits._

  private def draw[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))

  test("pairExplode emits exactly the ordered pair set of each posting list") {
    val gen = Gen.chooseNum(2, 12).flatMap(n => Gen.pick(n, 0L until 100L))
    draw(gen, 10).zipWithIndex.foreach { case (ids, g) =>
      val sorted = ids.toSeq.sorted
      val df = Seq((g, sorted)).toDF("grp", "ds")
      val got = df.selectExpr(TextOps.pairExplode)
        .selectExpr("p.x AS a", "p.y AS b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = (for {
        i <- sorted.indices; j <- (i + 1) until sorted.size
      } yield (sorted(i), sorted(j))).toSet
      assert(got == expected, s"group $g: got ${got.size}, expected ${expected.size}")
      assert(got.forall { case (a, b) => a < b })
    }
  }
}
