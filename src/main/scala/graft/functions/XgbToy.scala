package graft.functions

import graft.sources.XgbBundle.{Model, Tree}

/** Deterministic checked-in tree ensemble that brings [[XgbScore]] — the
  * engine's native booster-walking expression (rebuilding the reference's
  * scoring path, streamlit_app.py:717-725) — under the driver's DuckDB
  * hash gate. The shipped 200-tree artifact scores telemetry fixture
  * data the oracle cannot see, so this small ensemble plays the same
  * role over a testdata table: the TREES ARE DATA, identical on both
  * sides — Spark walks them through `XgbScore`/`Model.predictFv`, and
  * [[marginSql]] unrolls the SAME arrays into nested ANSI CASE SQL for
  * DuckDB. A value mismatch in either the codegen'd walk or the
  * missing-value (NaN/default_left) routing flips the oracle hash.
  *
  * Cross-engine float discipline (QueryDef policy):
  *  - split conditions are float-exact halves (x.5), so `REAL < cond`
  *    compares identically after DuckDB's exact REAL→DOUBLE promotion;
  *  - leaf values are multiples of 1/64 — the f64 margin sum is EXACT
  *    (no association error), and base_score = 0.5 makes the base
  *    margin log(1) = 0 exactly;
  *  - only the final sigmoid is irrational, so the query rounds the
  *    probability to 6 dp (rule 6: never on a rounding boundary).
  */
object XgbToy {

  /** Structural tree DSL, flattened to the bundle's structure-of-arrays
    * form. `defaultLeft` is where a NaN (SQL NULL) feature routes.
    */
  sealed trait Node
  final case class Leaf(v: Float) extends Node
  final case class Split(f: Int, cond: Float, defaultLeft: Boolean,
                         l: Node, r: Node) extends Node

  /** Preorder flatten into the XGBoost array layout ([[Tree]]). */
  private def flatten(root: Node): Tree = {
    val si = scala.collection.mutable.ArrayBuffer.empty[Int]
    val sc = scala.collection.mutable.ArrayBuffer.empty[Float]
    val lc = scala.collection.mutable.ArrayBuffer.empty[Int]
    val rc = scala.collection.mutable.ArrayBuffer.empty[Int]
    val dl = scala.collection.mutable.ArrayBuffer.empty[Boolean]
    def walk(n: Node): Int = {
      val i = si.length
      n match {
        case Leaf(v) =>
          si += 0; sc += v; lc += -1; rc += -1; dl += false; i
        case Split(f, c, d, l, r) =>
          si += f; sc += c; lc += -2; rc += -2; dl += d
          lc(i) = walk(l); rc(i) = walk(r); i
      }
    }
    walk(root)
    Tree(si.toArray, sc.toArray, lc.toArray, rc.toArray, dl.toArray)
  }

  // Feature slots: 0 = acctbal(f32), 1 = custkey mod 97, 2 = nationkey
  // (NULL for every 5th nation — exercises default_left routing both
  // ways), 3 = length(mktsegment). Leaves are signed multiples of 1/64.
  private val roots: Seq[Node] = Seq(
    Split(0, 1234.5f, defaultLeft = true,
      Split(1, 48.5f, defaultLeft = false,
        Leaf(-15f / 64), Leaf(7f / 64)),
      Split(2, 9.5f, defaultLeft = true,
        Leaf(11f / 64), Leaf(-3f / 64))),
    Split(2, 14.5f, defaultLeft = false,
      Split(0, -100.5f, defaultLeft = true,
        Leaf(9f / 64), Split(3, 8.5f, defaultLeft = false,
          Leaf(-6f / 64), Leaf(13f / 64))),
      Leaf(-10f / 64)),
    Split(1, 20.5f, defaultLeft = true,
      Leaf(17f / 64),
      Split(0, 4567.5f, defaultLeft = false,
        Split(2, 4.5f, defaultLeft = false, Leaf(-8f / 64), Leaf(2f / 64)),
        Leaf(-21f / 64))),
    Split(3, 9.5f, defaultLeft = true,
      Split(1, 75.5f, defaultLeft = false,
        Leaf(5f / 64), Leaf(-12f / 64)),
      Split(0, 7890.5f, defaultLeft = true,
        Leaf(-2f / 64), Leaf(19f / 64))),
    Split(2, 7.5f, defaultLeft = true,
      Split(2, 2.5f, defaultLeft = false, Leaf(6f / 64), Leaf(-9f / 64)),
      Split(1, 60.5f, defaultLeft = true, Leaf(-4f / 64), Leaf(14f / 64))),
    Split(0, 3333.5f, defaultLeft = false,
      Leaf(8f / 64),
      Split(3, 9.5f, defaultLeft = false,
        Split(1, 33.5f, defaultLeft = true, Leaf(-7f / 64), Leaf(10f / 64)),
        Leaf(-16f / 64))))

  /** The ensemble as the real bundle model type — scored by the SAME
    * `predictFv` walk (and `XgbScore` codegen) as the shipped artifact.
    */
  val model: Model = Model(
    numCols = Nil, means = Array.empty, scales = Array.empty,
    catCols = Nil, categories = Nil,
    trees = roots.map(flatten), baseScore = 0.5, numFeature = 4,
    objective = "binary:logistic")

  /** The ensemble's margin as ANSI SQL over the given feature
    * expressions — the DuckDB twin of `predictFv` minus the sigmoid.
    * NULL features take the node's default branch, exactly like the
    * walker routes NaN. Float literals print through double (exact for
    * halves and 1/64 multiples), so both engines parse identical values.
    */
  def marginSql(feats: Seq[String]): String = {
    require(feats.length == model.numFeature)
    def nodeSql(n: Node): String = n match {
      case Leaf(v) => v.toDouble.toString
      case Split(f, c, d, l, r) =>
        val dflt = if (d) l else r
        s"(CASE WHEN ${feats(f)} IS NULL THEN ${nodeSql(dflt)} " +
          s"WHEN ${feats(f)} < ${c.toDouble} THEN ${nodeSql(l)} " +
          s"ELSE ${nodeSql(r)} END)"
    }
    roots.map(nodeSql).mkString("(", " + ", ")")
  }
}
