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

  /** Ranking-quality evaluation (bundle metric parity: AUC via the
    * Mann-Whitney statistic, precision@k / recall@k).
    */
  def evaluate(scored: DataFrame, labelCol: String = "label", k: Int = 10): Map[String, Double] = {
    val rows = scored.select(col("pred_prob"), col(labelCol).cast("int"))
      .collect().map(r => (r.getDouble(0), r.getInt(1)))
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    val auc =
      if (pos.isEmpty || neg.isEmpty) Double.NaN
      else pos.map(p => neg.count(n => p > n) + 0.5 * neg.count(n => p == n)).sum /
        (pos.length.toDouble * neg.length)
    val topK = rows.sortBy(-_._1).take(k)
    val pAtK = topK.count(_._2 == 1).toDouble / k
    val rAtK = if (pos.isEmpty) Double.NaN else topK.count(_._2 == 1).toDouble / pos.length
    Map("auc" -> auc, s"p_at_$k" -> pAtK, s"r_at_$k" -> rAtK,
      "positives" -> pos.length.toDouble, "n" -> rows.length.toDouble)
  }
}
