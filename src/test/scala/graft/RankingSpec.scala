package graft

import graft.operators.Ranking
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[Ranking.exactNtile]] must be bit-equal to the flat
  * `ntile(k) OVER (ORDER BY ...)` it replaces — the q35/d42 oracles pin
  * the SQL semantics, so any divergence in bucket sizing (the q+1/q
  * split) or bin-boundary handling is a wrong answer, not a style
  * difference. Cases cover: n not divisible by k, n < k, duplicate
  * scores resolved by tie columns, an all-equal score (degenerate span),
  * both sort directions, and a bin count smaller than the distinct
  * score count (forcing multi-value bins).
  */
class RankingSpec extends SparkSpec {

  import spark.implicits._

  private def flatNtile(df: org.apache.spark.sql.DataFrame, k: Int,
                        asc: Boolean): org.apache.spark.sql.DataFrame = {
    val order =
      if (asc) Seq(col("s").asc, col("id").asc)
      else Seq(col("s").desc, col("id").asc)
    df.withColumn("tile", ntile(k).over(Window.orderBy(order: _*)))
  }

  private def both(df: org.apache.spark.sql.DataFrame, k: Int, asc: Boolean,
                   nBuckets: Int = 1024): (Seq[(Long, Int)], Seq[(Long, Int)]) = {
    val exact = Ranking
      .exactNtile(df, k, col("s"), ascending = asc,
        ties = Seq(col("id")), out = "tile", nBuckets = nBuckets)
      .select(col("id"), col("tile")).as[(Long, Int)]
      .collect().sortBy(_._1).toSeq
    val flat = flatNtile(df, k, asc)
      .select(col("id"), col("tile")).as[(Long, Int)]
      .collect().sortBy(_._1).toSeq
    (exact, flat)
  }

  // Deterministic pseudo-random scores (no Random: repeatable fixture).
  private def frame(n: Int) =
    spark.range(n.toLong).select(col("id"),
      (pmod(hash(col("id")), lit(9973)) / lit(100.0) - lit(30.0)).as("s"))

  test("matches flat ntile: n=1057 rows, 10 tiles, ascending") {
    val (e, f) = both(frame(1057), 10, asc = true)
    assert(e == f)
  }

  test("matches flat ntile: descending order") {
    val (e, f) = both(frame(1057), 10, asc = false)
    assert(e == f)
  }

  test("matches flat ntile: n not divisible by k exercises the q+1 split") {
    // 103 = 10*10 + 3 → first 3 deciles get 11 rows, rest 10
    val (e, f) = both(frame(103), 10, asc = true)
    assert(e == f)
    val sizes = f.groupBy(_._2).view.mapValues(_.size).toMap
    assert(sizes(1) == 11 && sizes(4) == 10)
  }

  test("matches flat ntile: n < k (each row its own tile)") {
    val (e, f) = both(frame(7), 10, asc = true)
    assert(e == f)
    assert(e.map(_._2).sorted == (1 to 7))
  }

  test("matches flat ntile: heavy duplicate scores, ties broken by id") {
    val df = spark.range(500).select(col("id"),
      (col("id") % 3).cast("double").as("s"))
    val (e, f) = both(df, 10, asc = true)
    assert(e == f)
  }

  test("degenerate span: all-equal scores collapse to one bin, ties decide") {
    val df = spark.range(42).select(col("id"), lit(5.0).as("s"))
    val (e, f) = both(df, 10, asc = true)
    assert(e == f)
  }

  test("tiny bin count forces multi-value bins, still exact") {
    val (e, f) = both(frame(1057), 10, asc = false, nBuckets = 4)
    assert(e == f)
  }

  test("k larger than bin count and non-decile k") {
    val (e, f) = both(frame(211), 7, asc = true, nBuckets = 3)
    assert(e == f)
  }

  test("no partition-less window over the data-scaled input") {
    val planStr = Ranking
      .exactNtile(frame(1000), 10, col("s"), ascending = true,
        ties = Seq(col("id")), out = "tile")
      .queryExecution.optimizedPlan.toString
    // Window specs over the row-scaled frame must carry the __bin
    // partition key; the only unpartitioned windows run on the grouped
    // ≤ nBuckets-row count frame (their child is an Aggregate).
    val windows = planStr.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty)
    // A partitioned spec renders as windowspecdefinition(__bin#<id>, ...)
    val partitioned = ".*windowspecdefinition\\(__bin#\\d+L?,.*".r
    windows.filterNot(w => partitioned.matches(w)).foreach { w =>
      assert(w.contains("__bcnt") || w.contains("__boff"),
        s"unpartitioned window over a non-bin-count frame:\n$w\n$planStr")
    }
  }
}
