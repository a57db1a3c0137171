package graft.telemetry

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Next-hour congestion scorer — reference parity with `_score_latest`
  * (streamlit_app.py:717-725, X1): StandardScaler over the numeric
  * features ∩ present, one-hot over the categoricals ∩ present, a linear
  * margin, sigmoid → `pred_prob`.
  *
  * The reference's artifact is an XGBoost pipeline; its own surface never
  * requires bit-identical margins (the coef-introspection path degrades
  * gracefully — sa:874-891), so per SURVEY §7.4 the faithful Spark-first
  * route is a transparent model spec scored with pure column expressions —
  * whole-stage-codegen'd, no UDF, no MLlib runtime dependency at inference
  * time. Tree ensembles can be scored the same way (sum of per-tree CASE
  * expressions), and Spark ML's GBTClassifier covers native retraining.
  *
  * The scorer errors when no spec features are present in the frame —
  * mirroring the reference's empty-intersection guard (SURVEY §7.5.9).
  */
object Scorer {

  /** Transparent model bundle: standardization stats + linear coefficients
    * + one-hot categorical weights + the label rule metadata (BASELINE.md
    * label rule: latency_ms ≥ P80, hi-bad).
    */
  case class ModelSpec(
      means: Map[String, Double],
      scales: Map[String, Double],
      coefs: Map[String, Double],
      catWeights: Map[String, Map[String, Double]], // col -> level -> weight
      intercept: Double,
      labelMetric: String = "latency_ms",
      labelQuantile: Double = 0.8)

  /** Score: sigmoid(intercept + Σ coef·(x−μ)/σ + Σ onehot weight). */
  def score(df: DataFrame, spec: ModelSpec): DataFrame = {
    val numPresent = spec.coefs.keys.filter(df.columns.contains).toSeq.sorted
    val catPresent = spec.catWeights.keys.filter(df.columns.contains).toSeq.sorted
    require(numPresent.nonEmpty || catPresent.nonEmpty,
      s"no model features present in frame: ${df.columns.mkString(",")}")

    val numTerms: Seq[Column] = numPresent.map { f =>
      val sd = spec.scales.getOrElse(f, 1.0)
      val safeSd = if (sd == 0) 1e-9 else sd
      lit(spec.coefs(f)) *
        ((coalesce(col(f).cast("double"), lit(spec.means.getOrElse(f, 0.0))) -
          lit(spec.means.getOrElse(f, 0.0))) / lit(safeSd))
    }
    val catTerms: Seq[Column] = catPresent.map { f =>
      val levels = spec.catWeights(f)
      levels.toSeq.sortBy(_._1).foldLeft(lit(0.0)) { case (acc, (lvl, wt)) =>
        when(col(f) === lvl, acc + lit(wt)).otherwise(acc)
      }
    }
    val margin = (numTerms ++ catTerms).foldLeft(lit(spec.intercept))(_ + _)
    df.withColumn("pred_prob", lit(1.0) / (lit(1.0) + exp(-margin)))
  }

  /** Label rule (BASELINE.md): positive when the metric is at/above its
    * q-quantile (hi-bad). Used to derive training labels natively.
    */
  def label(df: DataFrame, metric: String = "latency_ms", q: Double = 0.8): DataFrame = {
    val thrRow = df.agg(expr(s"percentile($metric, $q)")).first()
    require(!thrRow.isNullAt(0),
      s"label: percentile($metric, $q) is null — empty frame or all-null metric")
    val thr = thrRow.getDouble(0)
    df.withColumn("label", (col(metric) >= thr).cast("int"))
  }

  /** Fit a transparent logistic-ish spec from data using closed-form
    * per-feature stats (mean/σ for standardization; coefficient = class
    * mean difference, a Fisher-style linear discriminant). Not XGBoost —
    * but a deterministic, dependency-free trainer whose spec the `score`
    * path consumes; quality gates (AUC/P@k) are asserted in ScorerSpec.
    */
  def fitSpec(features: DataFrame, numCols: Seq[String],
              labelCol: String = "label"): ModelSpec = {
    val present = numCols.filter(features.columns.contains)
    val aggs = present.flatMap(f => Seq(
      avg(col(f)).as(s"${f}__mean"),
      stddev_samp(col(f)).as(s"${f}__std"),
      avg(when(col(labelCol) === 1, col(f))).as(s"${f}__mean1"),
      avg(when(col(labelCol) === 0, col(f))).as(s"${f}__mean0")))
    val row = features.agg(aggs.head, aggs.tail: _*).first()
    val means = present.map(f => f -> Option(row.getAs[Double](s"${f}__mean")).getOrElse(0.0)).toMap
    val scales = present.map { f =>
      val sd = Option(row.getAs[Double](s"${f}__std")).getOrElse(1.0)
      f -> (if (sd == 0 || sd.isNaN) 1.0 else sd)
    }.toMap
    val coefs = present.map { f =>
      val m1 = Option(row.getAs[Double](s"${f}__mean1")).getOrElse(0.0)
      val m0 = Option(row.getAs[Double](s"${f}__mean0")).getOrElse(0.0)
      f -> (m1 - m0) / scales(f)
    }.toMap
    val baseRow = features.agg(avg(col(labelCol).cast("double"))).first()
    require(!baseRow.isNullAt(0),
      s"fitSpec: base rate of '$labelCol' is null — empty frame or all-null labels")
    val base = baseRow.getDouble(0)
    val intercept = math.log((base + 1e-9) / (1 - base + 1e-9))
    ModelSpec(means, scales, coefs, Map.empty, intercept)
  }

  /** Bridge the shipped joblib artifact (S7) into the native scorer: the
    * bundle's label rule drives [[label]] and its `num_cols` select the
    * feature set, then the transparent spec is fitted natively. The
    * bundle's XGBoost trees stay opaque (§7.4 — its own surface never
    * needs bit-identical margins); its training PROTOCOL — rule, feature
    * list, quantile — is what this honors, so a reference deployment's
    * artifact configures this engine without hand-copying constants.
    */
  def fitSpecFromBundle(features: DataFrame,
      meta: graft.sources.JoblibBundle.BundleMeta): ModelSpec = {
    val labeled = label(features, meta.labelMetric, meta.labelQuantile)
    fitSpec(labeled, meta.numCols).copy(
      labelMetric = meta.labelMetric, labelQuantile = meta.labelQuantile)
  }

  /** Score with the SHIPPED booster itself — the bit-parity route
    * closing §7.4's last gap: [[graft.sources.XgbBundle]] decodes the
    * artifact's StandardScaler/OneHotEncoder stats and all tree arrays;
    * this reproduces `predict_proba`'s arithmetic
    * (streamlit_app.py:723) inside the engine. The feature columns are
    * plain column expressions — (x−μ)/σ cast to float32 (the DMatrix
    * dtype, so the f32 rounding happens exactly once), one-hot equality
    * per stored category level (`handle_unknown=ignore` ⇒ unknown
    * levels are all-zeros) — feeding [[graft.functions.XgbScore]], a
    * native expression that walks the tree arrays as DATA. The unrolled
    * per-tree-CASE alternative was measured to overflow Janino's 64 KB
    * method limit at 200×73 nodes and dropped the whole stage to
    * interpreted evaluation; the data-walk expression keeps the stage in
    * whole-stage codegen with O(num_features) generated code. Null
    * features become NaN = XGBoost missing, routed by `default_left`.
    */
  def scoreBundle(df: DataFrame, m: graft.sources.XgbBundle.Model): DataFrame = {
    val nNum = m.numCols.length
    val featCols: Seq[Column] = m.numCols.indices.map { i =>
      ((col(m.numCols(i)).cast("double") - lit(m.means(i))) / lit(m.scales(i)))
        .cast("float")
    } ++ m.catCols.indices.flatMap { j =>
      m.categories(j).map { lvl =>
        when(col(m.catCols(j)) === lvl, 1.0f).otherwise(0.0f).cast("float")
      }
    }
    require(featCols.length == m.numFeature, s"feature width ${featCols.length}")
    // the model-bound expression is constructed DIRECTLY (GraftSqlBridge)
    // rather than through the session function registry the other graft
    // functions use: a registry entry would be session-global mutable
    // state — two models scoring concurrently would race on the name,
    // and the binding would leak into later spark.sql lookups
    df.withColumn("pred_prob",
      org.apache.spark.sql.GraftSqlBridge.column(graft.functions.XgbScore(
        featCols.map(org.apache.spark.sql.GraftSqlBridge.expression), m)))
  }

  /** Native gradient-boosted-tree retraining (SURVEY §7.4's alternative
    * route, matching the reference's selected model family — XGBoost,
    * README.md:38 AUC 0.86): Spark ML GBTClassifier over the same feature
    * frame and label rule, fixed seed for reproducibility. Returns the
    * input with `pred_prob` attached, same contract as [[score]], so all
    * downstream ranking/eval/map consumers are model-agnostic. Training
    * is distributed (MLlib); inference here goes through the fitted
    * model's transform (vectorized), not a UDF of ours.
    */
  def fitGbtScores(features: DataFrame, numCols: Seq[String],
                   labelCol: String = "label"): DataFrame =
    fitGbtScores(features, features, numCols, labelCol)

  /** Train on `train`, score `toScore` — the held-out evaluation shape
    * (pair with [[hashSplit]]); both frames must carry the feature
    * columns, only `train` needs the label.
    */
  def fitGbtScores(train: DataFrame, toScore: DataFrame, numCols: Seq[String],
                   labelCol: String): DataFrame = {
    import org.apache.spark.ml.classification.GBTClassifier
    import org.apache.spark.ml.feature.VectorAssembler
    import org.apache.spark.ml.linalg.Vector
    val present = numCols.filter(c =>
      train.columns.contains(c) && toScore.columns.contains(c))
    require(present.nonEmpty, "no model features present in frame")
    val assembler = new VectorAssembler()
      .setInputCols(present.toArray).setOutputCol("fvec").setHandleInvalid("keep")
    val model = new GBTClassifier()
      .setFeaturesCol("fvec").setLabelCol(labelCol)
      .setMaxIter(20).setMaxDepth(3).setSeed(42L)
      .fit(assembler.transform(train))
    val p1 = udf((v: Vector) => v(1))
    model.transform(assembler.transform(toScore))
      .withColumn("pred_prob", p1(col("probability")))
      .drop("fvec", "rawPrediction", "probability", "prediction")
  }

  /** Deterministic train/holdout split by key hash — the reproducible
    * split every training-data pipeline needs (no RNG, no ordering
    * dependence: a row's side is a pure function of its key, stable
    * across runs, partitionings and engines). `trainFrac` of the hash
    * space goes to train.
    */
  def hashSplit(df: DataFrame, keyCols: Seq[String],
                trainFrac: Double): (DataFrame, DataFrame) = {
    val bucket = pmod(xxhash64(keyCols.map(col): _*), lit(1000L))
    val cut = (trainFrac * 1000).toLong
    (df.filter(bucket < cut), df.filter(bucket >= cut))
  }

  /** T5: rank scored rows, apply the min-probability floor (null→0,
    * P7/sa:829-830), top N.
    */
  def topPredictions(scored: DataFrame, n: Int, minProb: Double): DataFrame =
    scored
      .filter(coalesce(col("pred_prob"), lit(0.0)) >= minProb)
      .orderBy(desc("pred_prob"), col("cell_id"))
      .limit(n)

  /** Distributed ranking-quality evaluation — AUC via the Mann-Whitney
    * rank-sum identity plus precision/recall@k, all as column ops on a
    * ONE-ROW result frame. No row ever reaches the driver (the old
    * formulation collected the full scored table and counted O(pos·neg)
    * pairs — dead at 100×; this is its exact-value replacement).
    *
    * AUC algebra: with mid-ranks for ties, AUC = (R⁺ − n⁺(n⁺+1)/2) /
    * (n⁺·n⁻) equals the pairwise P(score⁺>score⁻)+½P(=) definition
    * exactly. Ties collapse FIRST (group-by score → per-score count/pos
    * tallies), then the exclusive cumulative count gives every score
    * group its mid-rank. The whole numerator is kept in INTEGER space:
    * R2 = Σ pos·(2·cum + cnt + 1) is twice the positive rank sum, so
    * auc = (R2 − n⁺(n⁺+1)) / (2·n⁺·n⁻) needs exactly ONE float division
    * — bit-identical on any engine given the same integer inputs.
    *
    * Scale plan (d25's two-level prefix sum, not a flat window): the
    * cumulative count over distinct scores would funnel through one
    * partition, so scores bucket by a monotone range map (clamping is
    * monotone → cross-bucket order is preserved for ANY lo/hi; the
    * bounds only affect balance), bucket offsets come from a window over
    * the ≤`nBuckets`-row bucket frame, and the within-bucket window is
    * partitioned. Distinct-score cardinality bounds all window input —
    * at extreme scale callers quantize the score (probabilities at 6 dp
    * → ≤2e6 groups) which perturbs AUC by <1e-6.
    *
    * Top-k: `orderBy(desc(score), tieCols).limit(k)` is
    * TakeOrderedAndProject — per-partition heaps, k rows to the driver
    * side of the plan, no global sort. Pass `tieCols` when the score can
    * tie at the k boundary or p@k is not well-defined.
    */
  def rankMetrics(scored: DataFrame, scoreCol: String = "pred_prob",
                  labelCol: String = "label", k: Int = 10,
                  tieCols: Seq[String] = Nil,
                  bucketLo: Double = 0.0, bucketHi: Double = 1.0,
                  nBuckets: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = scored
      .select(col(scoreCol).cast("double").as("s") +:
        col(labelCol).cast("long").as("y") +: tieCols.map(col): _*)
      .filter(col("s").isNotNull && col("y").isNotNull)
    val g = base.groupBy("s")
      .agg(count(lit(1)).as("cnt"), sum("y").as("pos"))
      .withColumn("bucket", least(lit(nBuckets - 1L), greatest(lit(0L),
        floor((col("s") - lit(bucketLo)) /
          lit(bucketHi - bucketLo) * nBuckets))))
    val wban = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val win = Window.partitionBy("bucket").orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val boths = g.groupBy("bucket")
      .agg(sum("cnt").as("bcnt"), sum("pos").as("bpos"))
      .withColumn("boff", coalesce(sum("bcnt").over(wban), lit(0L)))
      .withColumn("boffp", coalesce(sum("bpos").over(wban), lit(0L)))
      .select("bucket", "boff", "boffp")
    val ranked = g.join(broadcast(boths), "bucket")
      .withColumn("cum", col("boff") +
        coalesce(sum("cnt").over(win), lit(0L)))
      .withColumn("cump", col("boffp") +
        coalesce(sum("pos").over(win), lit(0L)))
    val tot = ranked.agg(sum("cnt").as("n"), sum("pos").as("npos"))
    // AP rides the SAME prefix sums: sklearn's threshold-step definition
    // AP = Σ_s tp_s · (TP≥s / N≥s) / n⁺ is per score GROUP (no
    // tie-break needed); TP≥s = n⁺ − cump, N≥s = n − cum. Each term is
    // one integer product and ONE float division; the term sum's
    // reassociation noise (~1e-15) is absorbed by consumers' 6-dp
    // rounding (d23's avg-of-logs policy).
    val totals = ranked.crossJoin(broadcast(tot)).agg(
      sum(col("pos") * (col("cum") * 2 + col("cnt") + 1)).as("r2"),
      first("npos").as("npos"), first("n").as("n"),
      sum((col("pos") * (col("npos") - col("cump"))).cast("double") /
        (col("n") - col("cum"))).as("ap_sum"))
    val topk = base
      .orderBy(desc("s") +: tieCols.map(col): _*)
      .limit(k)
      .agg(coalesce(sum("y"), lit(0L)).as("k_pos"))
    totals.crossJoin(topk).select(
      when(col("npos") > 0 && col("npos") < col("n"),
        (col("r2") - col("npos") * (col("npos") + 1)) /
          (lit(2.0) * col("npos") * (col("n") - col("npos")))).as("auc"),
      when(col("npos") > 0, col("ap_sum") / col("npos").cast("double"))
        .as("ap"),
      (col("k_pos") / lit(k.toDouble)).as("p_at_k"),
      when(col("npos") > 0, col("k_pos") / col("npos").cast("double"))
        .as("r_at_k"),
      col("npos"), (col("n") - col("npos")).as("nneg"), col("n"))
  }

  /** Ranking-quality evaluation (bundle metric parity: AUC via the
    * Mann-Whitney statistic, average precision, precision@k /
    * recall@k — the full metric surface the shipped bundle publishes).
    * Thin Map adapter over [[rankMetrics]] — the only thing collected
    * is the one-row metrics frame.
    */
  def evaluate(scored: DataFrame, labelCol: String = "label", k: Int = 10): Map[String, Double] = {
    val r = rankMetrics(scored, "pred_prob", labelCol, k).first()
    def d(i: Int): Double = if (r.isNullAt(i)) Double.NaN else r.getDouble(i)
    Map("auc" -> d(0), "ap" -> d(1), s"p_at_$k" -> d(2), s"r_at_$k" -> d(3),
      "positives" -> r.getLong(4).toDouble, "n" -> r.getLong(6).toDouble)
  }
}
