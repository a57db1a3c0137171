package graft.sources

import scala.collection.mutable

/** Full-fidelity extraction of the reference's shipped model artifact:
  * the fitted sklearn preprocessing (StandardScaler means/scales,
  * OneHotEncoder categories) and the XGBoost booster's decision trees,
  * decoded from the pickle graph [[JoblibBundle]] materializes plus the
  * UBJSON payload inside `Booster.handle` ([[Ubjson]]).
  *
  * This closes SURVEY §7.4's last gap: where round 5 honored the
  * bundle's training PROTOCOL (label rule, feature list) and retrained
  * natively, this reproduces the shipped model's own predictions — the
  * margin is the sum over the stored trees' leaf values, exactly the
  * arithmetic `predict_proba` runs (streamlit_app.py:723).
  *
  * Semantics mirrored from the public XGBoost JSON/UBJ model schema:
  * node i splits on `split_indices(i)` with test `fvalue <
  * split_conditions(i)` (float32), missing goes left iff
  * `default_left(i)`, a node with `left == -1` is a leaf whose VALUE is
  * `split_conditions(i)`; the binary:logistic margin starts at
  * logit(base_score).
  */
object XgbBundle {

  /** One regression tree in structure-of-arrays form (the model file's
    * own layout — no per-node objects to build or GC).
    */
  final case class Tree(
      splitIndices: Array[Int], splitConditions: Array[Float],
      left: Array[Int], right: Array[Int], defaultLeft: Array[Boolean]) {
    def isLeaf(i: Int): Boolean = left(i) == -1

    /** Driver-side walk of one feature vector (float32 features, the
      * DMatrix dtype) — the independent evaluator the Catalyst CASE
      * construction is spec-checked against.
      */
    def walk(fv: Array[Float]): Double = {
      var i = 0
      while (!isLeaf(i)) {
        val x = fv(splitIndices(i))
        i = if (x.isNaN) { if (defaultLeft(i)) left(i) else right(i) }
            else if (x < splitConditions(i)) left(i) else right(i)
      }
      splitConditions(i).toDouble
    }
  }

  /** The decoded pipeline: feature construction (scaler + one-hot, in
    * ColumnTransformer order: scaled numerics then category levels) and
    * the tree ensemble.
    */
  final case class Model(
      numCols: Seq[String], means: Array[Double], scales: Array[Double],
      catCols: Seq[String], categories: Seq[Seq[String]],
      trees: Seq[Tree], baseScore: Double, numFeature: Int,
      objective: String) {

    def baseMargin: Double = math.log(baseScore / (1.0 - baseScore))

    /** Ensemble prediction over an already-built feature vector — the
      * kernel [[graft.functions.XgbScore]]'s generated code calls per
      * row (NaN = missing). Sequential f64 leaf accumulation.
      */
    def predictFv(fv: Array[Float]): Double = {
      var margin = baseMargin
      var i = 0
      while (i < treeArr.length) { margin += treeArr(i).walk(fv); i += 1 }
      1.0 / (1.0 + math.exp(-margin))
    }

    // stable array view so the per-row loop never pays Seq dispatch
    private val treeArr: Array[Tree] = trees.toArray

    /** Driver-side prediction for one row of (numeric values aligned to
      * numCols, categorical values aligned to catCols) — the independent
      * evaluator specs compare the engine path against.
      */
    def predict(nums: Array[Double], cats: Array[String]): Double = {
      val fv = new Array[Float](numFeature)
      var i = 0
      while (i < numCols.length) {
        fv(i) = ((nums(i) - means(i)) / scales(i)).toFloat
        i += 1
      }
      var off = numCols.length
      var j = 0
      while (j < catCols.length) {
        val levels = categories(j)
        var k = 0
        while (k < levels.length) {
          fv(off + k) = if (levels(k) == cats(j)) 1.0f else 0.0f
          k += 1
        }
        off += levels.length
        j += 1
      }
      predictFv(fv)
    }
  }

  import JoblibBundle.PyObj

  private def st(o: Any): mutable.LinkedHashMap[Any, Any] =
    o.asInstanceOf[PyObj].state.asInstanceOf[mutable.LinkedHashMap[Any, Any]]

  /** Load and decode the full pipeline from a joblib bundle path. */
  def load(path: String): Model = {
    val root = JoblibBundle.load(path)
    val steps = st(root("model"))("steps").asInstanceOf[mutable.ArrayBuffer[Any]]
      .map(_.asInstanceOf[Vector[Any]]).map(t => t(0).toString -> t(1)).toMap
    require(steps.keySet == Set("pre", "clf"),
      s"unexpected pipeline steps: ${steps.keySet}")

    // -- preprocessing: fitted transformers_ = [(name, obj, columns), ...]
    val fitted = st(steps("pre"))("transformers_")
      .asInstanceOf[mutable.ArrayBuffer[Any]].map(_.asInstanceOf[Vector[Any]])
      .map(t => t(0).toString -> (t(1), t(2))).toMap
    val (numObj, numColsRaw) = fitted("num")
    val numCols = numColsRaw.asInstanceOf[mutable.ArrayBuffer[Any]].map(_.toString).toSeq
    // the num branch is a one-step inner Pipeline around the scaler
    val scaler = st(numObj)("steps") match {
      case s: mutable.ArrayBuffer[Any @unchecked] => s(0).asInstanceOf[Vector[Any]](1)
      case _ => numObj
    }
    val means = JoblibBundle.wrapperDoubles(st(scaler)("mean_").asInstanceOf[PyObj])
    val scales = JoblibBundle.wrapperDoubles(st(scaler)("scale_").asInstanceOf[PyObj])
    require(means.length == numCols.length && scales.length == numCols.length,
      s"scaler stats (${means.length}) misaligned with columns (${numCols.length})")

    val (oheObj, catColsRaw) = fitted("cat")
    val catCols = catColsRaw.asInstanceOf[mutable.ArrayBuffer[Any]].map(_.toString).toSeq
    require(st(oheObj)("handle_unknown").toString == "ignore" &&
      st(oheObj)("drop") == null,
      "one-hot decode assumes handle_unknown=ignore and no dropped level")
    val categories = st(oheObj)("categories_").asInstanceOf[mutable.ArrayBuffer[Any]]
      .map(w => JoblibBundle.wrapperObjects(w.asInstanceOf[PyObj]).map(_.toString))
      .toSeq
    require(categories.length == catCols.length, "categories misaligned")

    // -- booster: UBJSON document inside the pickled handle bytearray
    val raw = st(st(steps("clf"))("_Booster"))("handle")
      .asInstanceOf[PyObj].args.asInstanceOf[Vector[Any]](0).asInstanceOf[Array[Byte]]
    val learner = Ubjson.parse(raw).asInstanceOf[Map[String, Any]]("Model")
      .asInstanceOf[Map[String, Any]]("learner").asInstanceOf[Map[String, Any]]
    val lmp = learner("learner_model_param").asInstanceOf[Map[String, Any]]
    val baseScore = lmp("base_score").toString.toDouble
    val numFeature = lmp("num_feature").toString.toInt
    val objective = learner("objective").asInstanceOf[Map[String, Any]]("name").toString
    require(objective == "binary:logistic",
      s"only binary:logistic is decoded, bundle has $objective")
    require(numFeature == numCols.length + categories.map(_.length).sum,
      s"num_feature $numFeature != ${numCols.length} numeric + one-hot widths")

    val trees = learner("gradient_booster").asInstanceOf[Map[String, Any]]("model")
      .asInstanceOf[Map[String, Any]]("trees").asInstanceOf[Vector[Any]]
      .map { tAny =>
        val t = tAny.asInstanceOf[Map[String, Any]]
        require(t("categories_nodes").asInstanceOf[Array[Int]].isEmpty,
          "categorical splits present — numeric-split decode only")
        Tree(
          splitIndices = t("split_indices").asInstanceOf[Array[Int]],
          splitConditions = t("split_conditions").asInstanceOf[Array[Float]],
          left = t("left_children").asInstanceOf[Array[Int]],
          right = t("right_children").asInstanceOf[Array[Int]],
          defaultLeft = t("default_left").asInstanceOf[Array[Byte]].map(_ != 0))
      }
    Model(numCols, means, scales, catCols, categories, trees, baseScore,
      numFeature, objective)
  }
}
