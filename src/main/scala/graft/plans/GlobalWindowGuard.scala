package graft.plans

import org.apache.spark.SparkException
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window}

/** Runtime guardrail against the single-partition window funnel.
  *
  * A window with an empty PARTITION BY moves every input row through ONE
  * task — the classic way a query that passed review on 60 k rows dies on
  * a 1000-executor cluster (see `operators/Ranking` for the distributed
  * alternatives: two-level prefix sums, exact value-binned ntile). The
  * repo's own test suite sweeps the query registry for this shape
  * (PlanSpec); this object makes the same invariant available AT RUNTIME
  * to library users:
  *
  *  - [[assertNone]] — explicit per-frame check for pipeline code;
  *  - `spark.graft.failOnGlobalWindow=true` + the `GraftExtensions`
  *    session extension — every analyzed plan in the session is checked,
  *    so an accidental `Window.orderBy(...)` with no partitioning fails
  *    fast at analysis, before a 100 TB shuffle is scheduled.
  *
  * The check is OPT-IN (default off): tiny bounded-input global windows
  * are legitimate (calendar frames, bin tables, sub-aggregate frames — the
  * registry's allowlisted cases), and only the job author knows the input
  * is bounded. A production submit that processes unbounded fact data sets
  * the flag and inherits the guarantee session-wide.
  */
object GlobalWindowGuard {

  val confKey = "spark.graft.failOnGlobalWindow"

  /** Human-readable descriptions of every partition-less Window operator
    * in `plan`, subqueries included; empty = plan is funnel-free.
    */
  def globalWindows(plan: LogicalPlan): Seq[String] =
    plan.collectWithSubqueries {
      case w: Window if w.partitionSpec.isEmpty =>
        val exprs = w.windowExpressions.map(_.name).mkString(", ")
        s"Window[$exprs] ORDER BY ${w.orderSpec.map(_.sql).mkString(", ")}"
    }

  /** Throws [[SparkException]] if the frame's analyzed plan contains a
    * partition-less window. Call sites that KNOW the input is bounded
    * should not call this — the check is for data-scaled paths.
    */
  def assertNone(df: Dataset[_]): Unit = {
    val hits = globalWindows(df.queryExecution.analyzed)
    if (hits.nonEmpty) fail(hits)
  }

  private def fail(hits: Seq[String]): Nothing =
    throw new SparkException(
      "Partition-less window(s) would funnel every row through one task: " +
        hits.mkString("; ") +
        ". Partition the window, or use graft.operators.Ranking (exact " +
        "distributed ntile / two-level prefix sums); if the input is " +
        s"provably bounded, unset $confKey for this job.")

  /** Analysis-time check rule for `SparkSessionExtensions.injectCheckRule`
    * — active only when `spark.graft.failOnGlobalWindow=true`.
    */
  final class CheckRule(session: SparkSession) extends (LogicalPlan => Unit) {
    override def apply(plan: LogicalPlan): Unit =
      if (session.conf.getOption(confKey).contains("true")) {
        val hits = globalWindows(plan)
        if (hits.nonEmpty) fail(hits)
      }
  }

  /** PHYSICAL-plan sweep — the precise form of the guard, run after
    * planning: flags `CartesianProductExec` (the all-pairs blowup) and
    * partition-less `WindowExec` (the funnel). Precision is the point of
    * checking physical rather than logical: a `crossJoin(broadcast(one
    * row of corpus stats))` — this library's own idiom — plans as a
    * BroadcastNestedLoopJoin and passes, where any logical-level cross-
    * join ban would have to blacklist it. AQE wrappers and query stages
    * are traversed. (Plan-embedded subquery expressions are not — use
    * the analysis-time [[assertNone]] for those.)
    */
  def physicalOffenders(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    import org.apache.spark.sql.execution.window.WindowExec
    val kids: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case o => o.children
    }
    val self = p match {
      case w: WindowExec if w.partitionSpec.isEmpty =>
        Seq(s"partition-less WindowExec[${w.windowExpression.map(_.name).mkString(", ")}]")
      case _: CartesianProductExec => Seq("CartesianProductExec")
      case _ => Nil
    }
    self ++ kids.flatMap(physicalOffenders)
  }

  /** Throws [[SparkException]] if the frame's PLANNED execution contains
    * a cartesian product or a partition-less window. Callers with a
    * provably bounded global window should not route that frame through
    * this check (same contract as [[assertNone]]).
    */
  def assertScaleSafe(df: Dataset[_]): Unit = {
    val hits = physicalOffenders(df.queryExecution.executedPlan)
    if (hits.nonEmpty)
      throw new SparkException(
        "Scale-unsafe physical operator(s): " + hits.mkString("; ") +
          ". Partition the window / add a join condition or broadcast " +
          "the bounded side; see graft.operators.Ranking for exact " +
          "distributed ranking alternatives.")
  }
}
