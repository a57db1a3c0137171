package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY §5.2) — ScalaCheck generators drawn
  * with fixed seeds so failures reproduce.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Draw n deterministic samples from a generator. */
  private def draw[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("NPS proxy is always within [-100, 100]") {
    val datasets = draw(Gen.nonEmptyListOf(Gen.chooseNum(-10000.0, 10000.0)), 8)
    datasets.foreach { xs =>
      val nps = xs.toDF("v")
        .agg((sum(when(col("v") >= 7000, 1.0).otherwise(0.0)) * 100 / count(lit(1)) -
          sum(when(col("v") < 1000, 1.0).otherwise(0.0)) * 100 / count(lit(1))).as("nps"))
        .first().getDouble(0)
      assert(nps >= -100.0 && nps <= 100.0, s"nps=$nps for n=${xs.size}")
    }
  }

  test("trailing rolling mean of a constant series is the constant") {
    draw(Gen.chooseNum(-1000.0, 1000.0), 5).foreach { c =>
      val df = (1 to 20).map(i => ("k", i, c)).toDF("k", "i", "v")
      val w = Window.partitionBy("k").orderBy("i")
      val p1 = lag("v", 1).over(w); val p2 = lag("v", 2).over(w)
      val bad = df.select(
        ((coalesce(p2, lit(c)) + coalesce(p1, lit(c)) + col("v")) / lit(3.0)).as("m"))
        .filter(abs(col("m") - lit(c)) > 1e-9).count()
      assert(bad == 0)
    }
  }

  test("dedup-keep-latest yields exactly one row per key, and it is the max") {
    val gen = Gen.nonEmptyListOf(for {
      k <- Gen.oneOf("a", "b", "c", "d")
      ts <- Gen.chooseNum(0L, 1000L)
    } yield (k, ts))
    draw(gen, 8).foreach { rows =>
      val df = rows.toDF("k", "ts")
      val w = Window.partitionBy("k").orderBy(col("ts").desc)
      val out = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      assert(out.count() == rows.map(_._1).distinct.size)
      val expected = rows.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).max }
      out.collect().foreach(r => assert(r.getLong(1) == expected(r.getString(0))))
    }
  }

  test("partitioned write → read roundtrip preserves the multiset") {
    val gen = Gen.listOfN(200, for {
      k <- Gen.oneOf("p1", "p2", "p3")
      v <- Gen.chooseNum(-1e6, 1e6)
    } yield (k, v))
    val rows = draw(gen, 1).head
    val dir = java.nio.file.Files.createTempDirectory("graft-prop").toString + "/t"
    rows.toDF("k", "v").write.mode("overwrite").partitionBy("k").parquet(dir)
    val back = spark.read.parquet(dir).collect().map(r => (r.getString(1), r.getDouble(0)))
    assert(back.sorted.toSeq == rows.sorted)
  }

  test("cosine_similarity(v, v) == 1 for any nonzero vector; symmetric for pairs") {
    graft.functions.GraftFunctions.register(spark)
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-10.0f, 10.0f))
      .suchThat(_.exists(x => x != 0.0f))
    val vs = draw(vecGen, 10)
    val df = vs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("id", "v")
    val self = df.selectExpr("cosine_similarity(v, v) AS c")
      .filter(abs(col("c") - 1.0) > 1e-12).count()
    assert(self == 0)
    val pairs = df.alias("a").join(df.alias("b"), col("a.id") < col("b.id"))
      .selectExpr("cosine_similarity(a.v, b.v) AS ab", "cosine_similarity(b.v, a.v) AS ba")
      .filter(abs(col("ab") - col("ba")) > 1e-15).count()
    assert(pairs == 0)
  }

  test("hashSplit partitions exactly and deterministically for any fraction") {
    val rows = (1L to 500L).map(i => (i, s"k$i")).toDF("id", "k")
    draw(Gen.chooseNum(0.05, 0.95), 6).foreach { frac =>
      val (tr, te) = graft.telemetry.Scorer.hashSplit(rows, Seq("id", "k"), frac)
      val (tr2, _) = graft.telemetry.Scorer.hashSplit(rows, Seq("id", "k"), frac)
      assert(tr.count() + te.count() == 500)             // exact partition
      assert(tr.intersect(te).count() == 0)              // disjoint
      assert(tr.exceptAll(tr2).count() == 0)             // deterministic
      val got = tr.count() / 500.0
      assert(math.abs(got - frac) < 0.12, s"frac $frac got $got") // hash-uniform
    }
  }

  test("TopKAgg equals take-k-of-sorted for random groups and k") {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val gen = Gen.nonEmptyListOf(for {
      g <- Gen.oneOf("a", "b", "c")
      v <- Gen.chooseNum(-100.0, 100.0)
      id <- Gen.chooseNum(0L, 50L)
    } yield (g, v, id))
    draw(gen, 6).zipWithIndex.foreach { case (rows, i) =>
      val k = 1 + i % 4
      val topk = udaf(new graft.functions.TopKAgg(k),
        ExpressionEncoder[graft.functions.Ranked]())
      val got = rows.toDF("g", "v", "id").repartition(5)
        .groupBy("g").agg(topk(col("v"), col("id")).as("t"))
        .selectExpr("g", "inline(t)")
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
      val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
        rs.sortBy(r => (-r._2, r._3)).take(k).map(r => (g, r._2, r._3))
      }.toSet
      assert(got == want, s"k=$k diff=${(got diff want) ++ (want diff got)}")
    }
  }

  test("dup-cluster labels form a valid partition closed over random edges") {
    val gen = Gen.listOfN(30, for {
      a <- Gen.chooseNum(0L, 20L); b <- Gen.chooseNum(0L, 20L) if a != b
    } yield (math.min(a, b), math.max(a, b)))
    draw(gen, 4).filter(_.nonEmpty).foreach { pairList =>
      val pairs = pairList.distinct
      // reference: union-find
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = { val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r } }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
      val want = parent.keys.map(n => n -> find(n)).toMap
      // engine: same iterative hash-min loop the query uses, on a raw edge DF
      val e = pairs.toDF("src", "dst")
      val edges = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      var labels = edges.groupBy(col("src").as("n"))
        .agg(min(least(col("src"), col("dst"))).as("lbl"))
      var changed = 1L
      while (changed > 0) {
        val prop = edges.join(labels.select(col("n").as("src"), col("lbl").as("sl")), "src")
          .groupBy(col("dst").as("n")).agg(min("sl").as("nl"))
        val next = labels.join(prop, Seq("n"), "left")
          .select(col("n"), least(col("lbl"), coalesce(col("nl"), col("lbl"))).as("lbl"),
            (coalesce(col("nl"), col("lbl")) < col("lbl")).as("chg"))
          .localCheckpoint(false)
        changed = next.filter(col("chg")).count()
        labels = next.select("n", "lbl")
      }
      val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"edges=$pairs")
    }
  }

  test("z-score of the population against its own stats has ~zero mean") {
    val gen = Gen.listOfN(100, Gen.chooseNum(-100.0, 100.0))
    draw(gen, 5).foreach { xs =>
      val df = xs.toDF("v")
      val st = df.agg(avg("v").as("m"), stddev_samp(col("v")).as("s"))
      val zbar = df.crossJoin(st)
        .select(((col("v") - col("m")) /
          when(col("s") === 0, 1e-9).otherwise(col("s"))).as("z"))
        .agg(avg("z")).first().getDouble(0)
      assert(math.abs(zbar) < 1e-8)
    }
  }

  test("winsorized mean is within [min, max] and monotone under clamp widening") {
    val gen = Gen.listOfN(60, Gen.chooseNum(-500.0, 500.0))
    draw(gen, 5).foreach { xs =>
      val df = xs.toDF("v")
      def wmean(lo: Double, hi: Double): Double = {
        val b = df.agg(
          round(expr(s"percentile(v, ${lo}D)"), 6).as("lo"),
          round(expr(s"percentile(v, ${hi}D)"), 6).as("hi"))
        df.crossJoin(b)
          .select(least(greatest(col("v"), col("lo")), col("hi")).as("w"))
          .agg(avg("w")).first().getDouble(0)
      }
      val narrow = wmean(0.25, 0.75)
      val wide = wmean(0.05, 0.95)
      val full = wmean(0.0, 1.0)
      assert(narrow >= xs.min && narrow <= xs.max)
      // widening the clamp moves the mean toward the raw mean
      val raw = xs.sum / xs.size
      assert(math.abs(wide - raw) <= math.abs(narrow - raw) + 1e-6)
      assert(math.abs(full - raw) < 1e-9)
    }
  }

  test("MAD of a constant series is 0; adding one outlier leaves the median robust") {
    draw(Gen.chooseNum(-100.0, 100.0), 5).foreach { c =>
      val base = Seq.fill(21)(c)
      val df = base.toDF("v")
      val med = df.agg(expr("percentile(v, 0.5)")).first().getDouble(0)
      assert(med == c)
      val mad = df.select(abs(col("v") - lit(med)).as("d"))
        .agg(expr("percentile(d, 0.5)")).first().getDouble(0)
      assert(mad == 0.0)
      // one wild outlier: median and MAD unmoved (robustness), mean not
      val out = (base :+ (c + 1e6)).toDF("v")
      val med2 = out.agg(expr("percentile(v, 0.5)")).first().getDouble(0)
      assert(med2 == c)
    }
  }

  test("EWMA of a constant series is the constant at every position") {
    val w24 = Iterator.iterate(1.0)(_ * 0.7).take(24).toSeq
    draw(Gen.chooseNum(-100.0, 100.0), 5).foreach { c =>
      val df = (1 to 40).map(i => (i, c)).toDF("i", "v")
      val w = Window.orderBy("i")
      val num = w24.zipWithIndex.map { case (wt, d) =>
        coalesce(lag(col("v"), d).over(w), lit(0.0)) * lit(wt)
      }.reduceLeft(_ + _)
      val den = w24.zipWithIndex.map { case (wt, d) =>
        when(lag(col("v"), d).over(w).isNotNull, lit(wt)).otherwise(lit(0.0))
      }.reduceLeft(_ + _)
      val bad = df.select((num / den).as("e"))
        .filter(abs(col("e") - lit(c)) > 1e-9).count()
      assert(bad == 0)
    }
  }

  test("q44 RFM segments partition the customer base and conserve totals") {
    val seg = graft.operators.Relational.rfmSegments(spark, sf0001)
      .collect()
    // every named segment is from the fixed vocabulary, no duplicates
    val names = seg.map(_.getString(0)).toSeq
    val vocab = Set("champion", "loyal", "promising", "at_risk", "hibernating")
    assert(names.toSet.subsetOf(vocab) && names.distinct == names)
    // segments PARTITION the customers-with-orders set: counts conserve
    val orders = Tables.orders(spark, sf0001)
    val nCust = orders.select("o_custkey").distinct().count()
    val nOrd = orders.count()
    assert(seg.map(_.getLong(1)).sum == nCust, "n_customers must sum to distinct custkeys")
    assert(seg.map(_.getLong(2)).sum == nOrd, "n_orders must sum to the order count")
    spark.sharedState.cacheManager.clearCache() // rfm frame persist (registry contract)
  }

  test("t50 seasonal strength is an ANOVA R² in [0,1] and conserves counts") {
    val rows = graft.operators.Temporal.seasonalStrength(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val strength = r.getDouble(4)
      assert(strength >= 0.0 && strength <= 1.0, s"strength=$strength out of [0,1]")
      // mean_hourly * n_hours restores the type's event count exactly
      val restored = r.getDouble(2) * r.getLong(1)
      assert(math.abs(restored - math.rint(restored)) < 1e-6)
    }
    val total = rows.map(r => math.rint(r.getDouble(2) * r.getLong(1)).toLong).sum
    assert(total == Tables.events(spark, sf0001).count(),
      "per-type hourly means must conserve the event count")
  }

  test("e37 bits sweep: recall non-decreasing, MSE non-increasing in bits") {
    val rows = graft.ext.VectorOps.sqBitsSweep(spark, sf0001)
      .orderBy("n_bits").collect()
    assert(rows.length == graft.ext.VectorOps.SqBits.length)
    rows.sliding(2).foreach { case Array(a, b) =>
      // a finer grid can only move each component CLOSER to its true
      // value (the level sets nest at powers of two), so distortion
      // falls; recall is monotone on this corpus and pinned as such
      assert(b.getDouble(3) >= a.getDouble(3), "recall must not fall with more bits")
      assert(b.getDouble(4) <= a.getDouble(4), "MSE must not rise with more bits")
    }
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 50)
      assert(r.getDouble(4) >= 0.0)
    }
  }

  test("q46 basket lift: support floor holds, lift matches its own counts") {
    val rows = graft.operators.Relational.basketLift(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val nOrders = Tables.lineitem(spark, sf0001)
      .select("l_orderkey").distinct().count()
    rows.foreach { r =>
      val (a, b2) = (r.getLong(0), r.getLong(1))
      val (nab, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(a < b2, "pairs are ordered")
      assert(nab >= 2, "support floor")
      assert(nab <= na && nab <= nb, "pair support bounded by part supports")
      assert(r.getDouble(6) == nab.toDouble * nOrders / (na.toDouble * nb),
        "lift restates its own counts")
    }
    // ranking is by lift descending
    rows.map(_.getDouble(6)).sliding(2).foreach { case Array(x, y) =>
      assert(y <= x)
    }
  }

  test("t52 k-anonymity bands partition all events and respect their bounds") {
    val rows = graft.operators.Temporal.kAnonymity(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val total = Tables.events(spark, sf0001).count()
    assert(rows.map(_.getLong(2)).sum == total, "bands partition the events")
    val shares = rows.map(_.getDouble(3))
    assert(math.abs(shares.sum - 1.0) < 1e-9)
    val vocab = Set("1 (unique)", "2-5", "6-20", "21+")
    assert(rows.map(_.getString(0)).toSet.subsetOf(vocab))
  }

  test("q47 HHI is bounded by [1/n, 1] and effective suppliers by [1, n]") {
    val rows = graft.operators.Relational.supplierHhi(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, hhi, eff) = (r.getLong(1), r.getDouble(3), r.getDouble(4))
      assert(hhi >= 1.0 / n - 1e-9 && hhi <= 1.0 + 1e-9,
        s"${r.getString(0)}: hhi=$hhi n=$n")
      assert(eff >= 1.0 - 1e-6 && eff <= n + 1e-6)
      assert(math.abs(eff - 1.0 / hhi) < 1e-3)
    }
  }

  test("d75 chi-square table: margins conserve, dof matches, residual signs agree") {
    val rows = graft.ext.TextOps.sourceLangIndependence(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val nDocs = Tables.documents(spark, sf0001).count()
    assert(rows.map(_.getLong(2)).sum == nDocs, "observed sums to the corpus")
    assert(math.abs(rows.map(_.getDouble(3)).sum - nDocs) < 1e-3,
      "expected sums to the corpus")
    val (nr, nc) = (rows.map(_.getString(0)).distinct.length,
      rows.map(_.getString(1)).distinct.length)
    assert(rows.length == nr * nc, "full grid including zero cells")
    assert(rows.head.getLong(6) == (nr - 1).toLong * (nc - 1))
    assert(rows.head.getDouble(5) >= 0.0)
    rows.foreach { r =>
      val diff = r.getLong(2) - r.getDouble(3)
      assert(math.signum(r.getDouble(4)) == math.signum(diff) ||
        math.abs(diff) < 1e-9)
    }
  }

  test("q45 Lorenz curve is convex, ends at 1, and the Gini matches its trapezoids") {
    val rows = graft.operators.Relational.lorenzGini(spark, sf0001)
      .orderBy("decile").collect()
    assert(rows.length == 10)
    val shares = rows.map(_.getDouble(3))
    val cum = rows.map(_.getDouble(4))
    // ascending-spend deciles ⇒ per-decile share non-decreasing (convex Lorenz)
    shares.sliding(2).foreach { case Array(a, b) => assert(b >= a - 1e-12) }
    assert(math.abs(cum.last - 1.0) < 1e-12, s"cum ends at ${cum.last}")
    // trapezoid identity recomputed from the curve itself
    val trap = cum.zip(0.0 +: cum.init).map { case (c, p) => c + p }.sum
    val gini = rows.head.getDouble(5)
    assert(math.abs(gini - (1.0 - trap / 10.0)) < 1e-6)
    assert(gini >= 0.0 && gini < 1.0)
    spark.sharedState.cacheManager.clearCache() // customer frame persist
  }

  test("e39 shortlist sweep: recall is monotone in depth (nested prefixes)") {
    val rows = graft.ext.VectorOps.pqShortlistSweep(spark, sf0001)
      .orderBy("n_shortlist").collect()
    assert(rows.length == graft.ext.VectorOps.PqShortlists.length)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 5)
      assert(r.getDouble(2) == r.getLong(1) / 5.0)
    }
    // depths are prefixes of ONE ADC ranking: recall cannot fall
    rows.map(_.getLong(1)).sliding(2).foreach { case Array(a, b) =>
      assert(b >= a, "deeper shortlist can only add hits")
    }
  }

  test("e38 cells sweep: partitions stay valid and balance tightens with k") {
    val rows = graft.ext.VectorOps.ivfCellsSweep(spark, sf0001)
      .orderBy("n_cells").collect()
    assert(rows.length == graft.ext.VectorOps.IvfCells.length)
    rows.foreach { r =>
      val (k, live) = (r.getInt(0), r.getLong(1))
      assert(live >= 1 && live <= k, s"live cells $live out of [1, $k]")
      // the largest cell holds at least the uniform share of LIVE cells
      assert(r.getDouble(2) >= 1.0 / live && r.getDouble(2) <= 1.0)
      assert(r.getDouble(3) >= 0.0, "CV is nonnegative")
      assert(r.getLong(4) >= 0 && r.getLong(4) <= 50)
    }
    // more cells can only shrink the biggest cell (pinned on this corpus;
    // recall is deliberately NOT pinned monotone — the measured curve has
    // a k=16 sweet spot, which is the point of the audit)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getDouble(2) <= a.getDouble(2), "max cell share must tighten")
    }
    spark.sharedState.cacheManager.clearCache() // per-k assignment persists
  }

  test("t51 changepoint: segment stats conserve the per-type event count") {
    val rows = graft.operators.Temporal.changepoint(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val totals = Tables.events(spark, sf0001)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (nb, na) = (r.getLong(2), r.getLong(3))
      assert(nb >= 1 && na >= 1, "both segments must be nonempty")
      // mean_before·n_before + mean_after·n_after restores the event count
      val restored = r.getDouble(4) * nb + r.getDouble(5) * na
      assert(math.abs(restored - totals(r.getString(0))) < 1e-6,
        s"${r.getString(0)}: $restored vs ${totals(r.getString(0))}")
      assert(r.getDouble(6) >= 0.0, "SS reduction is nonnegative by construction")
    }
  }

  test("t54 Fano factor restates a driver recompute over the dense hour spine") {
    val rows = graft.operators.Temporal.fanoBurstiness(spark, sf0001).collect()
    assert(rows.length == 5)
    // driver recompute: per-type dense hourly counts (zero-filled span)
    val obs = Tables.events(spark, sf0001)
      .selectExpr("event_type", "unix_micros(date_trunc('hour', ts)) AS h")
      .groupBy("event_type", "h").count().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val et = r.getString(0)
      val byHour = obs(et).map(x => x._2 -> x._3).toMap
      val hourUs = 3600000000L
      val dense = (byHour.keys.min to byHour.keys.max by hourUs)
        .map(h => byHour.getOrElse(h, 0L))
      assert(r.getLong(1) == dense.length, s"$et hour count")
      val s = dense.sum.toDouble; val q = dense.map(n => n * n).sum.toDouble
      assert(r.getDouble(2) == s / dense.length, s"$et mean_rate")
      assert(r.getDouble(3) ==
        (dense.length * q - s * s) / (dense.length * s), s"$et fano")
      assert(r.getDouble(3) > 0.0)
    }
  }

  test("e44 outlier audit: scores in [0,2], degree bounded by the graph, ordered") {
    val rows = graft.ext.VectorOps.knnOutlierAudit(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(rows.length == 20)
    rows.foreach { case (_, k, sc) =>
      assert(k >= 0 && k <= 3)
      assert(sc >= 0.0 && sc <= 2.0) // cos in [-1,1] -> 1 - mean in [0,2]
      // a neighborless vector must score exactly 1 (the loneliest point)
      if (k == 0) assert(sc == 1.0)
    }
    // top-20 is ordered by (score desc, vec_id asc)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 > b._3 || (a._3 == b._3 && a._1 < b._1))
    }
    spark.sharedState.cacheManager.clearCache()
  }

  test("e45 matryoshka sweep: full width anchors at recall 1, hits bounded") {
    val rows = graft.ext.VectorOps.matryoshkaRecallSweep(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == Seq(16, 32, 64))
    rows.foreach { case (_, h, rec) =>
      assert(h >= 0 && h <= 50)
      assert(rec == h / 50.0)
    }
    // dim 64 IS the exact search: the anchor the sweep self-checks on
    assert(rows.find(_._1 == 64).get._3 == 1.0)
    spark.sharedState.cacheManager.clearCache()
  }

  test("d73 threshold sweep is monotone non-increasing and anchored at bp=0") {
    val rows = graft.ext.TextOps.thresholdSensitivity(spark, sf0001)
      .orderBy("min_stop_bp").collect()
    assert(rows.length == 9)
    // tightening the floor can only shrink the surviving set
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(1) <= a.getLong(1), "n_pass must be non-increasing")
      assert(b.getLong(4) <= a.getLong(4), "tokens_pass must be non-increasing")
    }
    // at bp=0 the stop-ratio clause is vacuous: survivors == length band
    val band = Tables.documents(spark, sf0001)
      .selectExpr("size(split(text,' ')) AS n")
      .filter(col("n").between(20, 400)).count()
    assert(rows.head.getLong(1) == band)
  }
}
