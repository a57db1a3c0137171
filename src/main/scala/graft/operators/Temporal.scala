package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operator inventory over the `events` table — re-expresses the
  * reference's telemetry analytics (SURVEY.md §2.2 P5/P8, §2.4 A3-A12, §2.5
  * W1-W4, §2.8 F2-F9, §2.9 streaming batch-twins) on the driver testdata.
  *
  * Timestamp discipline: `events.ts` is parquet TIMESTAMP(NANOS); both
  * engines (our loader, DuckDB) truncate to µs — see [[graft.Tables.events]].
  * Timestamps in outputs are emitted as epoch-microsecond longs
  * (`unix_micros` ≡ DuckDB `epoch_us`) so hash comparison is type-stable.
  *
  * Scale posture: hour-of-day baselines are 24-row aggregates joined back by
  * broadcast; tumbling/sliding buckets are hash aggregations (partial+final);
  * sessionization is a window + running-sum over (user_id, ts) — partitioned
  * by key, so it scales with the number of users, not a global sort.
  */
object Temporal {

  /** Hourly rollup + centered 3-bucket moving average (Survey A3 + W1;
    * reference sa:322 hourly mean, sa:326-331 rolling(center=True,
    * min_periods=1)). The MA window frame (-1,1) shrinks at the series
    * edges, matching pandas min_periods=1.
    */
  def hourlyValueMa(s: SparkSession, dir: String): DataFrame = {
    // Deterministic mean: round(sum,2) exactly restores the 2-decimal data's
    // sum, and the division by the exact count is then bit-identical in any
    // engine (see the determinism policy on QueryDef).
    val hourly = Tables.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(round(sum("value"), 2).as("sv"), count(lit(1)).as("n"))
      .withColumn("avg_value", col("sv") / col("n"))
    // Global orderBy window over ~hours-count rows (tiny relative to input —
    // one row per hour) — acceptable single-partition window; the heavy data
    // was already reduced by the aggregation above. The centered MA is spelled
    // as an explicit lag/lead sum (not a sliding frame avg): sliding-frame
    // implementations accumulate add/remove float error engine-specifically,
    // while this exact 3-term expression is bit-identical everywhere.
    val w = Window.orderBy("h")
    // The 3-term centered mean over those bit-identical means is again exact
    // arithmetic in a fixed order — no rounding anywhere, immune to .xxxx5
    // rounding-boundary flips.
    val v = col("avg_value")
    val prev = lag(v, 1).over(w)
    val next = lead(v, 1).over(w)
    hourly.select(
        unix_micros(col("h")).as("h_us"),
        v.as("avg_value"),
        ((coalesce(prev, lit(0.0)) + v + coalesce(next, lit(0.0))) /
          (prev.isNotNull.cast("int") + lit(1) + next.isNotNull.cast("int"))).as("ma3_value"),
        col("n"))
      .orderBy("h_us")
  }

  private val hourlyValueMaSql =
    """WITH hourly AS (
      |  SELECT date_trunc('hour', ts) AS h, round(sum(value),2)/count(*) AS v, count(*) AS n
      |  FROM events GROUP BY 1)
      |SELECT epoch_us(h) AS h_us, v AS avg_value,
      | (coalesce(lag(v) OVER (ORDER BY h),0) + v + coalesce(lead(v) OVER (ORDER BY h),0))
      |   / (CAST(lag(v) OVER (ORDER BY h) IS NOT NULL AS INT) + 1
      |      + CAST(lead(v) OVER (ORDER BY h) IS NOT NULL AS INT)) AS ma3_value,
      | n
      |FROM hourly ORDER BY h_us""".stripMargin

  /** Hour-of-day baseline z-score (Survey A4/J2/F8; reference sa:536-541).
    * Semantic traps pinned per SURVEY §7.5: stddev_samp (pandas ddof=1);
    * the σ==0→1e-9 guard replaces ONLY exact zero — a null σ (single-row
    * group) propagates a null z. Baseline is 24 rows → broadcast join.
    */
  def hourBaselineZscore(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).withColumn("hr", hour(col("ts")))
    val base = ev.groupBy("hr")
      .agg(avg("value").as("b_mean"), stddev_samp(col("value")).as("b_std"))
    ev.join(broadcast(base), Seq("hr"))
      .select(
        col("event_id"), col("hr"), col("value"),
        round((col("value") - col("b_mean")) /
          when(col("b_std") === 0, lit(1e-9)).otherwise(col("b_std")), 4).as("z"))
      .orderBy("event_id")
  }

  private val hourBaselineZscoreSql =
    """WITH base AS (
      |  SELECT hour(ts) AS hr, avg(value) AS b_mean, stddev_samp(value) AS b_std
      |  FROM events GROUP BY 1)
      |SELECT event_id, hr, value,
      | round((value - b_mean) / (CASE WHEN b_std = 0 THEN 1e-9 ELSE b_std END), 4) AS z
      |FROM events JOIN base ON hour(ts) = hr ORDER BY event_id""".stripMargin

  /** Latest-snapshot filter: rows at the global max timestamp (Survey P8;
    * reference sa:713-714). The max is a one-number aggregate broadcast back
    * — never a window over the full data.
    */
  def latestSnapshot(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val mx = ev.agg(max("ts").as("max_ts"))
    ev.crossJoin(broadcast(mx))
      .filter(col("ts") === col("max_ts"))
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"), col("value"))
      .orderBy("event_id")
  }

  private val latestSnapshotSql =
    """SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value
      |FROM events WHERE ts = (SELECT max(ts) FROM events) ORDER BY event_id""".stripMargin

  /** Threshold risk-flag aggregation (Survey P5; reference sa:342-350).
    * Fixed threshold keeps the >= boundary bit-identical across engines;
    * the quantile-derived variant of this pattern is exercised (rounded)
    * in q06/t09.
    */
  def riskShareByType(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("value") >= 400.0, 1L).otherwise(0L)).as("n_risky"),
        (sum(when(col("value") >= 400.0, 1.0).otherwise(0.0)) / count(lit(1))).as("risky_share"))
      .orderBy("event_type")

  private val riskShareByTypeSql =
    // CAST: DuckDB sum(<integer>) yields HUGEINT (→ float64 in pandas),
    // which hash-mismatches Spark's BIGINT even when values are equal.
    """SELECT event_type, count(*) AS n,
      | CAST(sum(CASE WHEN value >= 400.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_risky,
      | sum(CASE WHEN value >= 400.0 THEN 1.0 ELSE 0.0 END) / count(*) AS risky_share
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Calendar features: weekday (Mon=0 — Spark `weekday`, NOT `dayofweek`
    * which is Sun=1; SURVEY §7.5.4) and is_weekend rollup (Survey F4/F5;
    * reference sa:710-711).
    */
  def weekdayRollup(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(weekday(col("ts")).as("dow"),
        (weekday(col("ts")) >= 5).cast("int").as("is_weekend"), col("value"))
      .groupBy("dow", "is_weekend")
      .agg(count(lit(1)).as("n"),
        (round(sum("value"), 2) / count(lit(1))).as("avg_value"))
      .orderBy("dow")

  // DuckDB dayofweek is Sun=0..Sat=6 → (dayofweek+6)%7 = Mon=0.
  private val weekdayRollupSql =
    """SELECT (dayofweek(ts) + 6) % 7 AS dow,
      | CAST((dayofweek(ts) + 6) % 7 >= 5 AS INT) AS is_weekend,
      | count(*) AS n, round(sum(value),2) / count(*) AS avg_value
      |FROM events GROUP BY 1, 2 ORDER BY dow""".stripMargin

  /** JSON extraction from the `props` payload column (SURVEY §7.6;
    * `get_json_object` ≡ DuckDB `json_extract_string`).
    */
  def jsonPropsStats(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy("event_type")
      .agg(
        count(col("k")).as("n_k"),
        min("k").as("min_k"), max("k").as("max_k"),
        // integer sums are exact in both engines → exact division, no round
        (sum("k") / count(col("k"))).as("avg_k"))
      .orderBy("event_type")

  private val jsonPropsStatsSql =
    """SELECT event_type, count(k) AS n_k, min(k) AS min_k, max(k) AS max_k,
      | sum(k) / count(k) AS avg_k
      |FROM (SELECT event_type, CAST(json_extract_string(props,'$.k') AS INT) AS k FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Tumbling 1-hour window aggregation — the batch twin of the Structured
    * Streaming query in [[graft.streaming.StreamOps]] (Survey §2.9). Uses
    * Spark's `window()` bucketing so the exact same expression runs under
    * `readStream` with a watermark.
    */
  def tumblingHourly(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(unix_micros(col("w.start")).as("bucket_us"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("bucket_us", "event_type")

  private val tumblingHourlySql =
    """SELECT epoch_us(date_trunc('hour', ts)) AS bucket_us, event_type,
      | count(*) AS n, round(sum(value),2) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY bucket_us, event_type""".stripMargin

  /** Sliding 2-hour window, 1-hour stride (each event lands in 2 buckets).
    * Batch twin of the streaming sliding-window aggregate.
    */
  def slidingTwoHour(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(unix_micros(col("w.start")).as("bucket_us"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("bucket_us", "event_type")

  private val slidingTwoHourSql =
    """SELECT bucket_us, event_type, count(*) AS n, round(sum(value),2) AS sum_value
      |FROM (
      |  SELECT epoch_us(date_trunc('hour', ts)) AS bucket_us, event_type, value FROM events
      |  UNION ALL
      |  SELECT epoch_us(date_trunc('hour', ts) - INTERVAL 1 HOUR), event_type, value FROM events)
      |GROUP BY 1, 2 ORDER BY bucket_us, event_type""".stripMargin

  /** Top-k anomaly ranking: worst z per user, top 50 (Survey A8/T3/T4;
    * reference sa:544-549, 617-622). Deterministic tie-break on user_id.
    */
  def topAnomalousUsers(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).withColumn("hr", hour(col("ts")))
    val base = ev.groupBy("hr")
      .agg(avg("value").as("b_mean"), stddev_samp(col("value")).as("b_std"))
    ev.join(broadcast(base), Seq("hr"))
      .withColumn("z", (col("value") - col("b_mean")) /
        when(col("b_std") === 0, lit(1e-9)).otherwise(col("b_std")))
      .groupBy("user_id")
      .agg(round(max("z"), 4).as("max_z"), count(lit(1)).as("n_events"))
      .orderBy(desc("max_z"), col("user_id"))
      .limit(50)
  }

  private val topAnomalousUsersSql =
    """WITH base AS (
      |  SELECT hour(ts) AS hr, avg(value) AS b_mean, stddev_samp(value) AS b_std
      |  FROM events GROUP BY 1),
      |z AS (
      |  SELECT user_id, (value - b_mean) / (CASE WHEN b_std = 0 THEN 1e-9 ELSE b_std END) AS z
      |  FROM events JOIN base ON hour(ts) = hr)
      |SELECT user_id, round(max(z),4) AS max_z, count(*) AS n_events
      |FROM z GROUP BY user_id ORDER BY max_z DESC, user_id LIMIT 50""".stripMargin

  /** Per-type vs global hour-of-day comparison + delta (Survey J1/U2/A12;
    * reference sa:398-452 cell-vs-network compare). Left join of the
    * per-type series onto the 24-row global baseline (broadcast).
    */
  def typeVsGlobalHourly(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).withColumn("hr", hour(col("ts")))
    val glob = ev.groupBy("hr")
      .agg((round(sum("value"), 2) / count(lit(1))).as("global_avg"))
    val byType = ev.groupBy("event_type", "hr")
      .agg((round(sum("value"), 2) / count(lit(1))).as("type_avg"))
    byType.join(broadcast(glob), Seq("hr"))
      .select(col("event_type"), col("hr"),
        col("type_avg"), col("global_avg"),
        (col("type_avg") - col("global_avg")).as("delta"))
      .orderBy("event_type", "hr")
  }

  private val typeVsGlobalHourlySql =
    """WITH gbase AS (SELECT hr, round(sum(value),2)/count(*) AS global_avg
      |  FROM (SELECT hour(ts) AS hr, value FROM events) GROUP BY hr),
      |bytype AS (SELECT event_type, hr, round(sum(value),2)/count(*) AS type_avg
      |  FROM (SELECT event_type, hour(ts) AS hr, value FROM events) GROUP BY 1, 2)
      |SELECT event_type, bytype.hr AS hr, type_avg, global_avg,
      | type_avg - global_avg AS delta
      |FROM bytype JOIN gbase ON bytype.hr = gbase.hr
      |ORDER BY event_type, hr""".stripMargin

  /** Data-contract audit (Survey A10/P4; reference sa:39-105): one-row
    * summary of null counts, range violations, and cardinalities.
    */
  def dataContractAudit(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .agg(
        count(lit(1)).as("n_rows"),
        sum(isnull(col("value")).cast("long")).as("null_value"),
        sum(isnull(col("user_id")).cast("long")).as("null_user"),
        sum(isnull(col("props")).cast("long")).as("null_props"),
        sum((col("value") < 0).cast("long")).as("neg_value"),
        sum((col("value") > 10000).cast("long")).as("huge_value"),
        countDistinct("user_id").as("n_users"),
        countDistinct("event_type").as("n_types"))

  private val dataContractAuditSql =
    """SELECT count(*) AS n_rows,
      | count(*) FILTER (WHERE value IS NULL) AS null_value,
      | count(*) FILTER (WHERE user_id IS NULL) AS null_user,
      | count(*) FILTER (WHERE props IS NULL) AS null_props,
      | count(*) FILTER (WHERE value < 0) AS neg_value,
      | count(*) FILTER (WHERE value > 10000) AS huge_value,
      | count(DISTINCT user_id) AS n_users,
      | count(DISTINCT event_type) AS n_types
      |FROM events""".stripMargin

  /** Sessionization (gaps-and-islands): split each user's event stream at
    * >30-minute gaps, aggregate per session. Batch twin of the streaming
    * `session_window` query. Windows partition by user_id — scales with
    * key cardinality, no global sort.
    */
  def userSessions(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 30L * 60 * 1000000, 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum("new_sess").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sess_id")
      .agg(
        count(lit(1)).as("n_events"),
        unix_micros(min("ts")).as("start_us"),
        unix_micros(max("ts")).as("end_us"),
        round(sum("value"), 2).as("sum_value"))
      .orderBy("user_id", "sess_id")
  }

  private val userSessionsSql =
    """WITH flagged AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30*60*1000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
      |  FROM flagged)
      |SELECT user_id, sess_id, count(*) AS n_events,
      | epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us,
      | round(sum(value),2) AS sum_value
      |FROM sess GROUP BY user_id, sess_id ORDER BY user_id, sess_id""".stripMargin

  /** As-of join — an operator Spark lacks natively (SURVEY custom-operator
    * preference (a): compose existing ops). For every `error` event, the
    * most recent `purchase` by the same user at-or-before its timestamp,
    * carrying the matched purchase's payload (ts + value) as an as-of join
    * must. Implemented as tagged-union + running `last(..., ignoreNulls)`
    * window, which is the linear single-shuffle formulation (partition by
    * user, one sort) — no point-in-time cross join anywhere.
    * On equal timestamps the purchase sorts first (inclusive `<=` as-of);
    * among equal-ts purchases the largest event_id wins (mirrored in the
    * oracle's ORDER BY ... LIMIT 1).
    */
  def asofPurchaseBeforeError(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .filter(col("event_type").isin("error", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"), col("value"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), (col("event_type") === "error").cast("int"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lastPurchase = last(
      when(col("event_type") === "purchase",
        struct(unix_micros(col("ts")).as("ts_us"), col("value"))),
      ignoreNulls = true).over(w)
    ev
      .withColumn("p", lastPurchase)
      .filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("p.ts_us").as("purchase_ts_us"),
        col("p.value").as("purchase_value"))
      .orderBy("event_id")
  }

  private val asofPurchaseBeforeErrorSql =
    """SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
      | (SELECT max(epoch_us(p.ts)) FROM events p
      |   WHERE p.user_id = e.user_id AND p.event_type = 'purchase' AND p.ts <= e.ts) AS purchase_ts_us,
      | (SELECT p.value FROM events p
      |   WHERE p.user_id = e.user_id AND p.event_type = 'purchase' AND p.ts <= e.ts
      |   ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS purchase_value
      |FROM events e WHERE e.event_type = 'error' ORDER BY e.event_id""".stripMargin

  /** Broadcast range join (non-equi): events bucketed into value tiers via
    * BETWEEN against a tiny tier dimension. The dim is broadcast — the
    * non-equi predicate runs as BroadcastNestedLoopJoin over 4 rows, never
    * a shuffle.
    */
  def valueTierRangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tiers = Seq(
      ("bronze", 0.0, 100.0), ("silver", 100.0, 250.0),
      ("gold", 250.0, 400.0), ("platinum", 400.0, 1e9))
      .toDF("tier", "lo", "hi")
    Tables.events(s, dir)
      .join(broadcast(tiers), col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy("tier")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("tier")
  }

  private val valueTierRangeJoinSql =
    """SELECT tier, count(*) AS n, round(sum(value),2) AS sum_value
      |FROM events JOIN (VALUES ('bronze', 0.0, 100.0), ('silver', 100.0, 250.0),
      |                        ('gold', 250.0, 400.0), ('platinum', 400.0, 1e9)) AS t(tier, lo, hi)
      |  ON value >= lo AND value < hi
      |GROUP BY tier ORDER BY tier""".stripMargin

  /** Exact distinct-count under skew via explicit two-stage aggregation —
    * the salting pattern for heavy keys: stage 1 dedups on the WIDE key
    * (event_type, user_id), spreading one hot event_type across all
    * partitions (user_id is the salt); stage 2 counts the dedup'd rows per
    * type. A direct `countDistinct` would funnel every row of a hot type
    * through the handful of reducers owning that type. Catalyst plans
    * built-in distinct aggregation similarly (Expand + regroup); this
    * query keeps the shape explicit and auditable.
    */
  def saltedDistinctUsers(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select("event_type", "user_id").distinct()
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("event_type")

  private val saltedDistinctUsersSql =
    """SELECT event_type, count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Interval join (batch twin of the stream-stream join in
    * streaming.StreamOps.purchasesNearErrors): every (error, purchase)
    * pair for the same user with the purchase in the hour preceding the
    * error (inclusive both ends). Equi-key on user_id bounds the shuffle;
    * the range predicate filters within the key group — the same plan
    * shape Structured Streaming uses for watermarked interval joins,
    * where the time bound is also what lets it expire state.
    */
  def purchasesNearErrors(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val err = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"), col("ts").as("ets"))
    val pur = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("pts"),
        col("value").as("purchase_value"))
    err.join(pur, Seq("user_id"))
      .filter(col("pts") >= col("ets") - expr("INTERVAL 1 HOUR") && col("pts") <= col("ets"))
      .select(col("error_id"), col("purchase_id"), col("user_id"),
        unix_micros(col("ets")).as("error_ts_us"),
        unix_micros(col("pts")).as("purchase_ts_us"), col("purchase_value"))
      .orderBy("error_id", "purchase_id")
  }

  private val purchasesNearErrorsSql =
    """SELECT e.event_id AS error_id, p.event_id AS purchase_id, e.user_id,
      | epoch_us(e.ts) AS error_ts_us, epoch_us(p.ts) AS purchase_ts_us,
      | p.value AS purchase_value
      |FROM events e JOIN events p
      |  ON e.user_id = p.user_id AND e.event_type = 'error' AND p.event_type = 'purchase'
      | AND p.ts >= e.ts - INTERVAL 1 HOUR AND p.ts <= e.ts
      |ORDER BY error_id, purchase_id""".stripMargin

  /** LEFT OUTER variant of t16 — the oracle-checked batch twin of
    * `streaming.StreamOps.purchasesNearErrorsOuter`: EVERY error appears,
    * null-padded when no purchase preceded it within the hour. The
    * interval predicate must live IN the join condition (as a post-filter
    * it would delete the null-padded rows the outer join exists to keep).
    * Sort determinism with NULLs: within one error_id the sort never
    * compares NULL against a real purchase_id — an error either matches
    * ≥1 purchases or contributes exactly ONE null row — so the engines'
    * opposite NULL-ordering defaults cannot diverge. Same single
    * user_id-keyed shuffle as t16; unmatched errors add no extra pass.
    */
  def purchasesNearErrorsOuter(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val err = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"), col("ts").as("ets"))
    val pur = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("pts"), col("value").as("purchase_value"))
    err.join(pur,
        col("user_id") === col("p_user") &&
          col("pts") >= col("ets") - expr("INTERVAL 1 HOUR") && col("pts") <= col("ets"),
        "left")
      .select(col("error_id"), col("purchase_id"), col("user_id"),
        unix_micros(col("ets")).as("error_ts_us"),
        unix_micros(col("pts")).as("purchase_ts_us"), col("purchase_value"))
      .orderBy("error_id", "purchase_id")
  }

  private val purchasesNearErrorsOuterSql =
    """SELECT e.event_id AS error_id, p.event_id AS purchase_id, e.user_id,
      | epoch_us(e.ts) AS error_ts_us, epoch_us(p.ts) AS purchase_ts_us,
      | p.value AS purchase_value
      |FROM (SELECT * FROM events WHERE event_type = 'error') e
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON e.user_id = p.user_id
      | AND p.ts >= e.ts - INTERVAL 1 HOUR AND p.ts <= e.ts
      |ORDER BY error_id, purchase_id""".stripMargin

  /** FULL OUTER variant — batch twin of
    * `streaming.StreamOps.purchasesNearErrorsFullOuter`, completing the
    * interval-join matrix (inner t16 / left t46 / full t47): unmatched
    * errors AND unmatched purchases both survive, null-padded on the
    * absent side, so `user_id` coalesces across sides. Unlike t46, the
    * sort keys themselves can now be NULL (an unmatched purchase has no
    * error_id), and Spark defaults NULLS FIRST where DuckDB defaults
    * NULLS LAST — both sides pin NULLS LAST explicitly. Same single
    * user_id-keyed shuffle as t16.
    */
  def purchasesNearErrorsFullOuter(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val err = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id").as("e_user"),
        col("ts").as("ets"))
    val pur = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("pts"), col("value").as("purchase_value"))
    err.join(pur,
        col("e_user") === col("p_user") &&
          col("pts") >= col("ets") - expr("INTERVAL 1 HOUR") && col("pts") <= col("ets"),
        "full")
      .select(col("error_id"), col("purchase_id"),
        coalesce(col("e_user"), col("p_user")).as("user_id"),
        unix_micros(col("ets")).as("error_ts_us"),
        unix_micros(col("pts")).as("purchase_ts_us"), col("purchase_value"))
      .orderBy(col("error_id").asc_nulls_last, col("purchase_id").asc_nulls_last)
  }

  private val purchasesNearErrorsFullOuterSql =
    """SELECT e.event_id AS error_id, p.event_id AS purchase_id,
      | coalesce(e.user_id, p.user_id) AS user_id,
      | epoch_us(e.ts) AS error_ts_us, epoch_us(p.ts) AS purchase_ts_us,
      | p.value AS purchase_value
      |FROM (SELECT * FROM events WHERE event_type = 'error') e
      |FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON e.user_id = p.user_id
      | AND p.ts >= e.ts - INTERVAL 1 HOUR AND p.ts <= e.ts
      |ORDER BY error_id NULLS LAST, purchase_id NULLS LAST""".stripMargin

  /** RANGE-frame window (every other frame in the inventory is ROWS-based):
    * per event, the running sum of the same user's values in the trailing
    * hour — the frame is defined by the ORDER-BY VALUE (event time), so
    * equal timestamps are peers and row order inside a tie cannot change
    * the result (tie-stable by construction, unlike ROWS frames). One
    * shuffle on user_id, one sort.
    */
  def trailingHourSum(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .selectExpr("event_id", "user_id", "unix_micros(ts) AS ts_us",
        """round(sum(value) OVER (PARTITION BY user_id ORDER BY ts
          |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 2) AS hour_sum""".stripMargin)
      .orderBy("event_id")

  private val trailingHourSumSql =
    """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
      | round(sum(value) OVER (PARTITION BY user_id ORDER BY ts
      |   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 2) AS hour_sum
      |FROM events ORDER BY event_id""".stripMargin

  /** Cumulative distinct users per type by hour — distinct-over-window
    * doesn't distribute (per-frame sets are unbounded state), so the
    * scalable formulation is dedup-then-running-count: first event per
    * (type, user) → count firsts per hour bucket → running sum over the
    * per-type hourly series. Two hash shuffles, bounded window state (the
    * running sum partitions by type, ~5 rows of state), no per-frame sets
    * anywhere. The oracle spells the identical decomposition.
    */
  def cumulativeDistinctUsers(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type", "user_id")
      .agg(min("ts").as("first_ts"))
      .groupBy(col("event_type"),
        date_trunc("hour", col("first_ts")).as("bucket"))
      .agg(count(lit(1)).as("new_users"))
      .select(col("event_type"), unix_micros(col("bucket")).as("bucket_us"),
        col("new_users"),
        sum("new_users").over(
          Window.partitionBy("event_type").orderBy("bucket")).as("cum_users"))
      .orderBy("event_type", "bucket_us")

  private val cumulativeDistinctUsersSql =
    """WITH firsts AS (
      |  SELECT event_type, user_id, min(ts) AS first_ts
      |  FROM events GROUP BY event_type, user_id),
      |hourly AS (
      |  SELECT event_type, date_trunc('hour', first_ts) AS bucket, count(*) AS new_users
      |  FROM firsts GROUP BY 1, 2)
      |SELECT event_type, epoch_us(bucket) AS bucket_us, new_users,
      | CAST(sum(new_users) OVER (PARTITION BY event_type ORDER BY bucket) AS BIGINT) AS cum_users
      |FROM hourly ORDER BY event_type, bucket_us""".stripMargin

  // ---------------------------------------------------------------- t19

  /** One-pass mergeable histogram quantiles (P50/P95/P99 of value): a
    * 256-bin equi-width sketch — per-bin counts partial-aggregate map-side,
    * merge by addition, and the quantile is read off the cumulative
    * histogram with linear interpolation inside the hit bin.
    *
    * This is the percentile that SCALES: exact `percentile` (q01/q06)
    * buffers every value per group; this plan is two scans (min/max, then
    * bin counts), O(256) state total, no sort — the error bound is
    * span/256, pinned against exact percentile in SemanticsSpec. The
    * estimate is fully deterministic (bin counts are integers; the
    * interpolation arithmetic is written identically in both engines), so
    * unlike approx_percentile it is hash-checkable cross-engine.
    */
  def histogramQuantiles(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("value"))
    val stats = ev.agg(min("value").as("lo"), max("value").as("hi"),
        count(lit(1)).as("n"))
      .selectExpr("lo", "n",
        "CASE WHEN hi = lo THEN 1.0D ELSE hi - lo END AS span")
    val bins = ev.crossJoin(broadcast(stats))
      .selectExpr("least(255, CAST(floor((value - lo) / span * 256) AS INT)) AS bin",
        "lo", "span", "n")
      .groupBy("bin", "lo", "span", "n").agg(count(lit(1)).as("cnt"))
    // Global window over ≤256 rows — the input was already reduced to the
    // bounded histogram, so the single partition holds 256 rows, not data.
    val cum = bins.withColumn("cum", sum("cnt").over(
      Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val qs = s.range(1).selectExpr("explode(array(0.5D, 0.95D, 0.99D)) AS q")
    cum.crossJoin(broadcast(qs))
      .where("q * n <= cum AND q * n > cum - cnt")
      .selectExpr("q",
        "round(lo + (bin + (q * n - (cum - cnt)) / cnt) * span / 256, 6) AS est",
        "n")
      .orderBy("q")
  }

  private val histogramQuantilesSql =
    """WITH v AS (SELECT value FROM events),
      |st0 AS (SELECT min(value) AS lo, max(value) AS hi, count(*) AS n FROM v),
      |st AS (SELECT lo, n, CASE WHEN hi = lo THEN 1.0 ELSE hi - lo END AS span FROM st0),
      |b AS (SELECT least(255, CAST(floor((value - lo) / span * 256) AS INT)) AS bin,
      |        count(*) AS cnt
      |      FROM v, st GROUP BY 1),
      |c AS (SELECT bin, cnt,
      |        CAST(sum(cnt) OVER (ORDER BY bin
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |      FROM b),
      |qs AS (SELECT unnest([0.5, 0.95, 0.99]) AS q)
      |SELECT q,
      | round(lo + (bin + (q * n - (cum - cnt)) / cnt) * span / 256, 6) AS est,
      | n
      |FROM c, st, qs
      |WHERE q * n <= cum AND q * n > cum - cnt
      |ORDER BY q""".stripMargin

  // ---------------------------------------------------------------- t20

  /** Cohort retention: users grouped by first-seen day, counted on each
    * later active day as an offset from their cohort day — the standard
    * product-analytics retention triangle. Two aggregations plus one
    * user-keyed join: firsts (one row per user) and distinct active days
    * both reduce before joining, so the join is between two already-
    * aggregated frames co-partitioned on user_id — the raw event stream
    * shuffles exactly twice and never self-joins. Days are emitted as
    * epoch-day ints (type-stable across engines).
    */
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val firsts = ev.groupBy("user_id")
      .agg(to_date(min("ts")).as("cohort_d"))
    val activity = ev.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    activity.join(firsts, Seq("user_id"))
      .groupBy(col("cohort_d"), datediff(col("d"), col("cohort_d")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .select(unix_date(col("cohort_d")).as("cohort_day"),
        col("day_offset"), col("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  private val cohortRetentionSql =
    """WITH firsts AS (
      |  SELECT user_id, CAST(min(ts) AS DATE) AS cohort_d
      |  FROM events GROUP BY user_id),
      |activity AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
      |SELECT CAST(cohort_d - DATE '1970-01-01' AS INT) AS cohort_day,
      |       CAST(d - cohort_d AS INT) AS day_offset,
      |       count(*) AS n_users
      |FROM activity JOIN firsts USING (user_id)
      |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin

  // ---------------------------------------------------------------- t21

  /** Ordered conversion funnel (view → click → purchase): a user advances
    * a stage only with an event at-or-after their previous stage's first
    * event. Each stage is one filtered aggregation joined on user_id to
    * the previous stage's (already one-row-per-user) frame — sequential
    * semantics without window sorts over the event stream, and each join
    * input shrinks monotonically (stage k admits ≤ stage k−1 users).
    */
  def conversionFunnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    def firstAtOrAfter(etype: String, prev: DataFrame, prevCol: String, out: String) =
      ev.filter(col("event_type") === etype)
        .join(prev, Seq("user_id"))
        .filter(col("ts") >= col(prevCol))
        .groupBy("user_id").agg(min("ts").as(out))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("v_ts"))
    val c = firstAtOrAfter("click", v, "v_ts", "c_ts")
    val p = firstAtOrAfter("purchase", c, "c_ts", "p_ts")
    val stages = Seq(("1_view", v), ("2_click", c), ("3_purchase", p))
    stages.map { case (name, df) =>
      df.agg(count(lit(1)).as("n_users")).selectExpr(s"'$name' AS stage", "n_users")
    }.reduce(_.unionByName(_)).orderBy("stage")
  }

  private val conversionFunnelSql =
    """WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
      |           WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, min(e.ts) AS c_ts
      |      FROM events e JOIN v USING (user_id)
      |      WHERE e.event_type = 'click' AND e.ts >= v.v_ts GROUP BY e.user_id),
      |p AS (SELECT e.user_id, min(e.ts) AS p_ts
      |      FROM events e JOIN c USING (user_id)
      |      WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts GROUP BY e.user_id)
      |SELECT '1_view' AS stage, count(*) AS n_users FROM v
      |UNION ALL SELECT '2_click', count(*) FROM c
      |UNION ALL SELECT '3_purchase', count(*) FROM p
      |ORDER BY stage""".stripMargin

  // ---------------------------------------------------------------- t22

  /** Distinct users per event type (plus merged 'ALL') via the KMV
    * sketch ([[graft.functions.KmvAgg]]) — deterministic O(k)-state
    * distinct counting, with the exact count alongside so the result
    * itself shows the estimator's accuracy.
    *
    * The 'ALL' row is computed by MERGING the five per-type sketches
    * (explode + re-aggregate, set-union semantics) — never re-reading
    * the event stream — which is the property that lets per-partition /
    * per-day sketches roll up at 100 TB. Exactness below k and the
    * (k−1)·M/h_k estimator above it are spelled identically in the
    * oracle; h_k is an exact 60-bit long in both engines, converted to
    * double once, so the rounded estimate is bit-stable.
    */
  def kmvDistinctUsers(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val k = 64
    val kmv = udaf(new graft.functions.KmvAgg(k), Encoders.scalaLong)
    val du = Tables.events(s, dir)
      .select(col("event_type"), col("user_id")).distinct()
    val hashed = du.select(col("event_type"),
      expr("md5_long60(CAST(user_id AS STRING))").as("h"))
    val perType = hashed.groupBy("event_type")
      .agg(kmv(col("h")).as("mins"), count(lit(1)).as("exact_distinct"))
    val merged = perType.select(explode(col("mins")).as("h"))
      .agg(kmv(col("h")).as("mins"))
    val globalExact = du.select("user_id").distinct()
      .agg(count(lit(1)).as("exact_distinct"))
    val all = merged.crossJoin(globalExact)
      .select(lit("ALL").as("event_type"), col("mins"), col("exact_distinct"))
    perType.unionByName(all)
      .select(col("event_type"),
        graft.functions.Kmv.estimate(col("mins"), k).as("est_distinct"),
        col("exact_distinct"))
      .orderBy("event_type")
  }

  private val kmvDistinctUsersSql =
    """WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
      |h AS (SELECT event_type,
      |        CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),1,15)) AS BIGINT) AS h
      |      FROM du),
      |-- rank DISTINCT hashes: KmvAgg keeps k distinct minima, so a 60-bit
      |-- collision between two users must collapse here too; the exact
      |-- count (cn.n) deliberately stays pre-dedup
      |rk AS (SELECT event_type, h,
      |         row_number() OVER (PARTITION BY event_type ORDER BY h) AS r
      |       FROM (SELECT DISTINCT event_type, h FROM h)),
      |cn AS (SELECT event_type, count(*) AS n FROM h GROUP BY event_type),
      |km AS (SELECT event_type, max(h) AS hk, count(*) AS n_mins, max(n) AS n
      |       FROM rk JOIN cn USING (event_type) WHERE r <= 64
      |       GROUP BY event_type),
      |mrk AS (SELECT h, row_number() OVER (ORDER BY h) AS r
      |        FROM (SELECT DISTINCT h FROM rk WHERE r <= 64)),
      |mkm AS (SELECT max(h) AS hk, count(*) AS n_mins FROM mrk WHERE r <= 64),
      |ge AS (SELECT count(DISTINCT user_id) AS exact_distinct FROM events),
      |pt AS (SELECT event_type,
      |         CASE WHEN n_mins < 64 THEN n_mins
      |              ELSE CAST(round(63.0 * 1152921504606846976 / hk) AS BIGINT)
      |         END AS est_distinct,
      |         n AS exact_distinct
      |       FROM km),
      |al AS (SELECT 'ALL' AS event_type,
      |         CASE WHEN m.n_mins < 64 THEN m.n_mins
      |              ELSE CAST(round(63.0 * 1152921504606846976 / m.hk) AS BIGINT)
      |         END AS est_distinct,
      |         ge.exact_distinct
      |       FROM mkm m, ge)
      |SELECT * FROM pt UNION ALL SELECT * FROM al
      |ORDER BY event_type""".stripMargin

  /** SCD2-style state-interval build (gaps-and-islands): collapse each
    * user's consecutive same-`event_type` runs into validity intervals
    * with `valid_to_us = next interval's start` (NULL on the open current
    * interval) — the standard construction for a slowly-changing dimension
    * from an event log. Distinct from t12: islands close on a VALUE change,
    * not a time gap.
    *
    * Scale plan: both window layers partition by user_id, so after the one
    * exchange on user_id the island flag, running island id, interval agg,
    * and the lead() that chains valid_to all run within the same partition
    * — one shuffle total (the agg reuses the window's hash partitioning).
    * Ordering carries the (ts, event_id) tie-breaker per the float policy;
    * interval bounds are epoch-µs longs.
    */
  def stateIntervals(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val islands = Tables.events(s, dir)
      .withColumn("chg",
        when(lag("event_type", 1).over(byUser).isNull ||
          lag("event_type", 1).over(byUser) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("seq", sum("chg").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "seq")
      .agg(first("event_type").as("event_type"),
        count(lit(1)).as("n_events"),
        unix_micros(min("ts")).as("valid_from_us"))
    islands
      .withColumn("valid_to_us",
        lead("valid_from_us", 1).over(
          Window.partitionBy("user_id").orderBy("seq")))
      .orderBy("user_id", "seq")
  }

  private val stateIntervalsSql =
    """WITH flagged AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    CASE WHEN lag(event_type) OVER w IS NULL
      |              OR lag(event_type) OVER w <> event_type
      |         THEN 1 ELSE 0 END AS chg
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |isl AS (
      |  SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS seq
      |  FROM flagged),
      |iv AS (
      |  SELECT user_id, seq, min(event_type) AS event_type,
      |         count(*) AS n_events, epoch_us(min(ts)) AS valid_from_us
      |  FROM isl GROUP BY user_id, seq)
      |SELECT user_id, seq, event_type, n_events, valid_from_us,
      |       lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY seq) AS valid_to_us
      |FROM iv ORDER BY user_id, seq""".stripMargin

  /** Per-user TIME-WEIGHTED average value — the telemetry op plain avg()
    * gets wrong when sampling is irregular: each reading holds until the
    * next one, so it weighs by its holding duration (lead(ts) − ts; the
    * final open reading carries no weight).
    *
    * Float determinism: value is 2-decimal data stored as double, and
    * Σ(value·µs) overflows round-trippable double precision (~1e15 > 2⁵³
    * ulp grain), so the weighted sum runs in EXACT INTEGER ARITHMETIC —
    * per-row products as long (cents ≤ ~1e6 × µs-gaps ≤ ~1e12 stays well
    * under 2⁶³ for any plausible telemetry domain), ACCUMULATED AS
    * DECIMAL(38,0) so the sum itself cannot wrap at corpus scale: DuckDB
    * promotes BIGINT sums to HUGEINT, and Spark's non-ANSI long sum would
    * wrap silently exactly where the exactness rationale matters. Only the
    * final single division (identical integers → identical IEEE op both
    * engines) emits a double. One user_id exchange: window and agg share it.
    */
  def timeWeightedValue(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("next_us", unix_micros(lead("ts", 1).over(byUser)))
      .filter(col("next_us").isNotNull)
      .withColumn("dur_us", col("next_us") - unix_micros(col("ts")))
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_intervals"),
        sum("dur_us").as("active_us"),
        (sum((col("cents") * col("dur_us")).cast("decimal(38,0)")).cast("double") /
          (sum("dur_us").cast("double") * 100.0)).as("twa"))
      .filter(col("active_us") > 0)
      .orderBy("user_id")
  }

  private val timeWeightedValueSql =
    """WITH d AS (
      |  SELECT user_id,
      |    epoch_us(lead(ts) OVER w) - epoch_us(ts) AS dur_us,
      |    CAST(round(value*100) AS BIGINT) AS cents
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT user_id, count(*) AS n_intervals,
      |  CAST(sum(dur_us) AS BIGINT) AS active_us,
      |  CAST(sum(cents*dur_us) AS DOUBLE) / (CAST(sum(dur_us) AS DOUBLE) * 100.0) AS twa
      |FROM d WHERE dur_us IS NOT NULL
      |GROUP BY user_id HAVING sum(dur_us) > 0
      |ORDER BY user_id""".stripMargin

  /** Time-to-conversion: latency from first signup to first subsequent
    * purchase, summarized as exact P50/P90 per signup-week cohort
    * (complements t20's day-grain retention and t21's stage counts with a
    * LATENCY distribution). Both firsts are per-user min-aggregates —
    * pre-reduced to one row per user before joining, so the join never
    * touches raw event volume; the percentile runs over the already-tiny
    * per-user frame. Latencies are integer µs, so P50's midpoint
    * interpolation is exactly representable; both engines interpolate the
    * same two order statistics (rule-6 display rounding absorbs ulp).
    */
  def timeToConversion(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val su = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("s_ts"))
    val pu = ev.filter(col("event_type") === "purchase")
      .join(su, Seq("user_id"))
      .filter(col("ts") >= col("s_ts"))
      .groupBy("user_id")
      // s_ts is constant within the group (one row per user in `su`)
      .agg(min("ts").as("p_ts"), first("s_ts").as("s_ts"))
    pu.withColumn("lat_us", unix_micros(col("p_ts")) - unix_micros(col("s_ts")))
      .groupBy(unix_micros(date_trunc("week", col("s_ts"))).as("cohort_week_us"))
      .agg(count(lit(1)).as("n_converted"),
        round(expr("percentile(lat_us, 0.5)"), 6).as("p50_latency_us"),
        round(expr("percentile(lat_us, 0.9)"), 6).as("p90_latency_us"))
      .orderBy("cohort_week_us")
  }

  private val timeToConversionSql =
    """WITH su AS (SELECT user_id, min(ts) AS s_ts FROM events
      |            WHERE event_type = 'signup' GROUP BY user_id),
      |pu AS (SELECT e.user_id, min(e.ts) AS p_ts, min(su.s_ts) AS s_ts
      |       FROM events e JOIN su USING (user_id)
      |       WHERE e.event_type = 'purchase' AND e.ts >= su.s_ts
      |       GROUP BY e.user_id)
      |SELECT epoch_us(date_trunc('week', s_ts)) AS cohort_week_us,
      |  count(*) AS n_converted,
      |  round(quantile_cont(epoch_us(p_ts) - epoch_us(s_ts), 0.5), 6) AS p50_latency_us,
      |  round(quantile_cont(epoch_us(p_ts) - epoch_us(s_ts), 0.9), 6) AS p90_latency_us
      |FROM pu GROUP BY cohort_week_us ORDER BY cohort_week_us""".stripMargin

  /** OHLC candle downsampling: per hour, the opening/highest/lowest/
    * closing `value` — the standard lossy compaction that turns a raw
    * tick stream into a dashboard-grade series at 1/n the volume.
    * Open/close are ORDER-dependent aggregates; they are spelled as
    * row_number()=1 over (ts, event_id) asc/desc — fully tie-broken, so
    * the result is deterministic and portable (DuckDB's arg_min/first
    * carry no composite-key tie-break). One exchange on the hour bucket
    * serves both windows and the final aggregate.
    */
  def hourlyOhlc(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .withColumn("h_us", unix_micros(date_trunc("hour", col("ts"))))
    val byHour = Window.partitionBy("h_us")
    val asc = byHour.orderBy(col("ts").asc, col("event_id").asc)
    val desc = byHour.orderBy(col("ts").desc, col("event_id").desc)
    ev.withColumn("rn_a", row_number().over(asc))
      .withColumn("rn_d", row_number().over(desc))
      .groupBy("h_us")
      .agg(
        max(when(col("rn_a") === 1, col("value"))).as("open"),
        max("value").as("high"),
        min("value").as("low"),
        max(when(col("rn_d") === 1, col("value"))).as("close"),
        count(lit(1)).as("n_ticks"))
      .orderBy("h_us")
  }

  private val hourlyOhlcSql =
    """WITH e AS (
      |  SELECT epoch_us(date_trunc('hour', ts)) AS h_us, value,
      |    row_number() OVER (PARTITION BY date_trunc('hour', ts)
      |                       ORDER BY ts ASC, event_id ASC) AS rn_a,
      |    row_number() OVER (PARTITION BY date_trunc('hour', ts)
      |                       ORDER BY ts DESC, event_id DESC) AS rn_d
      |  FROM events)
      |SELECT h_us,
      |  max(CASE WHEN rn_a = 1 THEN value END) AS open,
      |  max(value) AS high, min(value) AS low,
      |  max(CASE WHEN rn_d = 1 THEN value END) AS close,
      |  count(*) AS n_ticks
      |FROM e GROUP BY h_us ORDER BY h_us""".stripMargin

  /** Calendar-gap detection: hours in the stream's span where an event
    * type is SILENT — absence is invisible to any group-by, so the query
    * builds the expected (type × hour) spine with a generator over the
    * global [min, max] hour range and anti-joins the observed buckets.
    * The data-quality twin of t07's rollup: a monitoring pipeline alerts
    * on these rows, not on the present ones.
    *
    * Scale notes: the spine is |types| × |hours| rows — thousands per
    * year — generated from a 1-row min/max aggregate, never from the
    * fact table; the anti-join ships the (tiny) observed bucket set, and
    * the fact table is touched exactly twice (span agg + bucket agg),
    * both single-exchange aggregations.
    */
  def missingHours(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
    // the distinct type set rides the SAME 1-row span aggregate, keeping
    // the fact table at exactly two scans (span+types, observed buckets)
    val span = ev.agg(min("h").as("h_lo"), max("h").as("h_hi"),
      collect_set("event_type").as("types"))
    val spine = span
      .select(explode(sequence(col("h_lo"), col("h_hi"),
        expr("INTERVAL 1 HOUR"))).as("h"), col("types"))
      .select(col("h"), explode(col("types")).as("event_type"))
    val observed = ev.distinct()
    spine.join(observed, Seq("event_type", "h"), "left_anti")
      .select(col("event_type"), unix_micros(col("h")).as("h_us"))
      .orderBy("event_type", "h_us")
  }

  private val missingHoursSql =
    """WITH b AS (SELECT event_type, date_trunc('hour', ts) AS h FROM events),
      |span AS (SELECT min(h) AS h_lo, max(h) AS h_hi FROM b),
      |spine AS (SELECT t.event_type, g.h
      |          FROM (SELECT DISTINCT event_type FROM b) t,
      |               (SELECT unnest(generate_series(h_lo, h_hi,
      |                  INTERVAL 1 HOUR)) AS h FROM span) g)
      |SELECT s.event_type, epoch_us(s.h) AS h_us
      |FROM spine s
      |WHERE NOT EXISTS (SELECT 1 FROM b
      |                  WHERE b.event_type = s.event_type AND b.h = s.h)
      |ORDER BY event_type, h_us""".stripMargin

  /** Grouped closed-form OLS ("million models" shape): per event type,
    * the daily-count trend slope fit entirely inside one aggregation —
    * slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) over (day-index, count)
    * pairs. No iteration, no solver, no collect: each group's model is
    * five integer sums with map-side partial aggregation, which is why
    * this fits millions of groups where a per-group lmfit cannot.
    *
    * Float determinism: x and y are integers, so numerator and
    * denominator are EXACT longs; the single long→double division is the
    * only float op and is bit-identical across engines.
    */
  def perTypeTrend(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("y"))
    val lo = daily.agg(min("d").as("d_lo"))
    daily.crossJoin(broadcast(lo))
      .withColumn("x", datediff(col("d"), col("d_lo")).cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"), sum("y").as("total"),
        sum("x").as("sx"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .filter(col("n_days") > 1)
      .selectExpr("event_type", "n_days", "total",
        "CAST(n_days * sxy - sx * total AS DOUBLE)" +
          " / CAST(n_days * sxx - sx * sx AS DOUBLE) AS slope_per_day")
      .orderBy("event_type")
  }

  private val perTypeTrendSql =
    """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS y
      |               FROM events GROUP BY 1, 2),
      |lo AS (SELECT min(d) AS d_lo FROM daily),
      |g AS (SELECT event_type, count(*) AS n_days,
      |        CAST(sum(y) AS BIGINT) AS total,
      |        CAST(sum(x) AS BIGINT) AS sx,
      |        CAST(sum(x * y) AS BIGINT) AS sxy,
      |        CAST(sum(x * x) AS BIGINT) AS sxx
      |      FROM (SELECT event_type, CAST(datediff('day', d_lo, d) AS BIGINT) AS x, y
      |            FROM daily, lo)
      |      GROUP BY event_type HAVING count(*) > 1)
      |SELECT event_type, n_days, total,
      |  CAST(n_days * sxy - sx * total AS DOUBLE)
      |    / CAST(n_days * sxx - sx * sx AS DOUBLE) AS slope_per_day
      |FROM g ORDER BY event_type""".stripMargin

  /** Event-type transition counts (first-order Markov edges): how often
    * each type follows each type within a user's stream — the edge list
    * behind funnel/path diagrams. lag() over the fully-tie-broken
    * per-user ordering, then one count aggregation; the window and the
    * groupBy share nothing (different keys), so this is two exchanges —
    * user_id for adjacency, then the tiny (from, to) key space.
    */
  def typeTransitions(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev_type", lag("event_type", 1).over(byUser))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type").as("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .orderBy("from_type", "to_type")
  }

  private val typeTransitionsSql =
    """WITH l AS (SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      |  FROM events)
      |SELECT prev_type AS from_type, event_type AS to_type,
      |  count(*) AS n_transitions
      |FROM l WHERE prev_type IS NOT NULL
      |GROUP BY from_type, to_type ORDER BY from_type, to_type""".stripMargin

  /** DAU / trailing-7-day WAU / stickiness per day — the engagement
    * series every product dashboard opens with. DISTINCT-over-a-sliding-
    * window doesn't distribute, so the scale formulation dedups to
    * user-days once, then each user-day VOTES FORWARD into the 7 windows
    * it belongs to (a 7× explode of the already-tiny user-day frame) and
    * each window dedups (day, user) again — linear work, key-partitioned
    * shuffles, no window-function distinct. Votes landing on days past
    * the stream's end need no clipping: such days have no dau row, so
    * the inner join drops them.
    */
  def dauWauStickiness(s: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val dau = ud.groupBy("d").agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("user_id"),
        explode(sequence(col("d"), date_add(col("d"), 6))).as("d"))
      .distinct()
      .groupBy("d").agg(count(lit(1)).as("wau"))
    dau.join(wau, "d")
      .select(col("d"), col("dau"), col("wau"),
        (col("dau").cast("double") / col("wau").cast("double")).as("stickiness"))
      .orderBy("d")
  }

  private val dauWauStickinessSql =
    """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |dau AS (SELECT d, count(*) AS dau FROM ud GROUP BY d),
      |days AS (SELECT DISTINCT d FROM ud),
      |wau AS (SELECT dy.d, count(DISTINCT u.user_id) AS wau
      |        FROM days dy JOIN ud u
      |          ON u.d BETWEEN dy.d - INTERVAL 6 DAY AND dy.d
      |        GROUP BY dy.d)
      |SELECT d, dau, wau,
      |  CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE) AS stickiness
      |FROM dau JOIN wau USING (d) ORDER BY d""".stripMargin

  /** Incident extraction: consecutive anomalous hours (hourly mean value
    * z-scored against the type's own distribution, z > 2) merge into
    * incident intervals with start/end/duration/peak — the alerting op
    * that turns t02-style pointwise anomalies into reportable events.
    * Gaps-and-islands on TIME ADJACENCY (next hour = +1h exactly),
    * per-type; one exchange on event_type carries baseline join, island
    * windows, and the interval aggregation.
    *
    * The z > 2 predicate compares the 6-dp-ROUNDED z, so engine ulp
    * differences collapse before the comparison (policy rule 6).
    */
  def anomalyIncidents(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg((round(sum("value"), 2) / count(lit(1))).as("hm"))
    val stats = hourly.groupBy("event_type")
      .agg(avg("hm").as("mu"), stddev_samp("hm").as("sd"))
    val flagged = hourly.join(stats, "event_type")
      .withColumn("z", round((col("hm") - col("mu")) /
        when(col("sd") === 0, 1e-9).otherwise(col("sd")), 6))
      .filter(col("z") > 2)
    val byType = Window.partitionBy("event_type").orderBy("h")
    flagged
      .withColumn("new_inc",
        when(unix_micros(col("h")) - unix_micros(lag("h", 1).over(byType))
          === 3600000000L, 0L).otherwise(1L))
      .withColumn("inc", sum("new_inc").over(
        byType.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("event_type", "inc")
      .agg(unix_micros(min("h")).as("start_us"),
        unix_micros(max("h")).as("end_us"),
        count(lit(1)).as("n_hours"),
        max("z").as("peak_z"))
      .orderBy("event_type", "inc")
  }

  private val anomalyIncidentsSql =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h,
      |         round(sum(value), 2) / count(*) AS hm
      |  FROM events GROUP BY 1, 2),
      |stats AS (SELECT event_type, avg(hm) AS mu, stddev_samp(hm) AS sd
      |          FROM hourly GROUP BY 1),
      |flagged AS (
      |  SELECT h.event_type, h.h,
      |    round((h.hm - s.mu) / (CASE WHEN s.sd = 0 THEN 1e-9 ELSE s.sd END), 6) AS z
      |  FROM hourly h JOIN stats s USING (event_type)),
      |anom AS (SELECT * FROM flagged WHERE z > 2),
      |isl AS (
      |  SELECT event_type, h, z,
      |    CASE WHEN epoch_us(h) - epoch_us(lag(h) OVER w) = 3600000000 THEN 0
      |         ELSE 1 END AS new_inc
      |  FROM anom WINDOW w AS (PARTITION BY event_type ORDER BY h)),
      |num AS (
      |  SELECT *, CAST(sum(new_inc) OVER (PARTITION BY event_type ORDER BY h
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS inc
      |  FROM isl)
      |SELECT event_type, inc, epoch_us(min(h)) AS start_us,
      |  epoch_us(max(h)) AS end_us, count(*) AS n_hours, max(z) AS peak_z
      |FROM num GROUP BY event_type, inc ORDER BY event_type, inc""".stripMargin

  /** PageRank over the t29 transition graph, 3 fixed power iterations
    * (damping 0.85) — the graph-analytics shape (d13's iterative joins,
    * but with float state): each iteration is ONE key-partitioned join +
    * aggregation of p·weight inflows, so a billion-edge graph costs one
    * shuffle per iteration. A fixed iteration count keeps the query
    * oracle-checkable (the DuckDB side unrolls the same three steps);
    * production would loop to an L1-convergence test instead.
    *
    * Float determinism: edge weights are exact long/long divisions;
    * per-node inflow sums are ≤|types| terms whose ordering ulps stay
    * ~1e-16 over three damped iterations — absorbed by the 6-dp display
    * rounding (rule 6; only the FINAL rank is rounded, never the
    * iterates). DuckDB constants are CAST to DOUBLE explicitly: its bare
    * 0.15/0.85 literals are DECIMALs, and decimal arithmetic would
    * diverge from Spark's double math.
    */
  def typePagerank(s: SparkSession, dir: String): DataFrame = {
    val e = typeTransitions(s, dir)
    val out = e.groupBy("from_type").agg(sum("n_transitions").as("out_n"))
    val w = e.join(out, "from_type")
      .select(col("from_type"), col("to_type"),
        (col("n_transitions").cast("double") / col("out_n").cast("double")).as("wt"))
    val nodes = e.select(col("from_type").as("t"))
      .union(e.select(col("to_type"))).distinct()
    val withN = nodes.crossJoin(broadcast(nodes.agg(count(lit(1)).as("nn"))))
    var p = withN.select(col("t"), (lit(1.0) / col("nn")).as("p"))
    for (_ <- 1 to 3) {
      val inflow = w.join(p.withColumnRenamed("t", "from_type"), "from_type")
        .groupBy(col("to_type").as("t"))
        .agg(sum(col("p") * col("wt")).as("inflow"))
      p = withN.join(inflow, Seq("t"), "left")
        .select(col("t"),
          (lit(0.15) / col("nn") + lit(0.85) * coalesce(col("inflow"), lit(0.0))).as("p"))
    }
    p.select(col("t").as("event_type"), round(col("p"), 6).as("pagerank"))
      .orderBy("event_type")
  }

  private val typePagerankSql = {
    def iter(prev: String, i: Int): String =
      s"""i$i AS (SELECT w.to_type AS t, sum($prev.p * w.wt) AS inflow
         |       FROM w JOIN $prev ON w.from_type = $prev.t GROUP BY 1),
         |p$i AS (SELECT n.t,
         |         CAST(0.15 AS DOUBLE) / (SELECT nn FROM nn)
         |           + CAST(0.85 AS DOUBLE) * coalesce(i$i.inflow, CAST(0 AS DOUBLE)) AS p
         |       FROM nodes n LEFT JOIN i$i USING (t))""".stripMargin
    s"""WITH l AS (SELECT user_id, event_type,
       |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
       |  FROM events),
       |e AS (SELECT prev_type AS from_type, event_type AS to_type, count(*) AS n
       |      FROM l WHERE prev_type IS NOT NULL GROUP BY 1, 2),
       |out AS (SELECT from_type, sum(n) AS out_n FROM e GROUP BY 1),
       |w AS (SELECT e.from_type, e.to_type,
       |        CAST(n AS DOUBLE) / CAST(out_n AS DOUBLE) AS wt
       |      FROM e JOIN out USING (from_type)),
       |nodes AS (SELECT DISTINCT t
       |          FROM (SELECT from_type AS t FROM e UNION SELECT to_type FROM e)),
       |nn AS (SELECT count(*) AS nn FROM nodes),
       |p0 AS (SELECT t, CAST(1.0 AS DOUBLE) / nn AS p FROM nodes, nn),
       |${iter("p0", 1)},
       |${iter("p1", 2)},
       |${iter("p2", 3)}
       |SELECT t AS event_type, round(p, 6) AS pagerank
       |FROM p3 ORDER BY event_type""".stripMargin
  }

  /** Peak session concurrency — the interval-overlap sweep: t12's sessions
    * become +1/−1 boundary deltas at MINUTE grain, the running level is a
    * cumulative sum over those minutes, and the output is the top-10
    * transition minutes by level. Grain matters for scale: deltas
    * pre-aggregate map-side onto the calendar-minute keyspace, so the
    * ordered cumsum runs over a frame bounded by the calendar span (43k
    * minutes per month) regardless of session volume — the same defense
    * as q27's daily frame. Every distinct level value first occurs at a
    * +1 boundary, so top-of-plateau peaks are exact; sessions that start
    * and end within one minute net to zero (counted active for 0 full
    * minutes). Level at minute m = sessions with start_min ≤ m < end_min.
    */
  def concurrentSessions(s: SparkSession, dir: String): DataFrame = {
    val sess = userSessions(s, dir)
      // integer `div`, not `/`: double division of epoch-µs magnitudes can
      // round a true-integer quotient a hair below the boundary before the
      // truncating cast (same hazard Tables.events avoids for ns→µs)
      .selectExpr("start_us div 60000000 AS start_min",
        "end_us div 60000000 AS end_min")
    val deltas = sess.select(col("start_min").as("m"), lit(1L).as("d"))
      .unionByName(sess.select(col("end_min").as("m"), lit(-1L).as("d")))
      .groupBy("m").agg(sum("d").as("net"))
    deltas
      .withColumn("concurrent", sum("net").over(
        Window.orderBy("m").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select((col("m") * 60000000L).as("minute_us"), col("concurrent"))
      .orderBy(desc("concurrent"), col("minute_us"))
      .limit(10)
  }

  private val concurrentSessionsSql =
    """WITH flagged AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30*60*1000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id, ts
      |  FROM flagged),
      |iv AS (
      |  SELECT epoch_us(min(ts)) // 60000000 AS start_min,
      |         epoch_us(max(ts)) // 60000000 AS end_min
      |  FROM sess GROUP BY user_id, sess_id),
      |ev AS (
      |  SELECT start_min AS m, 1 AS d FROM iv
      |  UNION ALL
      |  SELECT end_min AS m, -1 AS d FROM iv),
      |net AS (SELECT m, CAST(sum(d) AS BIGINT) AS net FROM ev GROUP BY m)
      |SELECT m * 60000000 AS minute_us,
      |  CAST(sum(net) OVER (ORDER BY m
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS concurrent
      |FROM net ORDER BY concurrent DESC, minute_us LIMIT 10""".stripMargin

  /** Top user journeys — the path-mining staple: each session's first 5
    * event types in time order, concatenated as a path string, counted
    * across sessions, top-10 paths. The per-session ordered head rides the
    * SAME user_id exchange the sessionization windows created (row_number
    * within session, ≤5 rows survive); the path keyspace is tiny (≤5⁵
    * combinations of 5 types), so the final count agg partial-aggregates
    * map-side. Ordering is fully tie-broken ((ts, event_id) within
    * session, (n desc, path) at the limit) — deterministic in both engines.
    */
  def sessionPaths(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val bySess = Window.partitionBy("user_id", "sess_id")
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 30L * 60 * 1000000, 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum("new_sess").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rn", row_number().over(bySess))
      .filter(col("rn") <= 5)
      .groupBy("user_id", "sess_id")
      // sort_array on (rn, type) structs orders by rn — collect_list order
      // is nondeterministic, the sort restores it deterministically
      .agg(array_join(expr(
        "transform(sort_array(collect_list(struct(rn, event_type))), x -> x.event_type)"),
        ">").as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(desc("n_sessions"), col("path"))
      .limit(10)
  }

  private val sessionPathsSql =
    """WITH flagged AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30*60*1000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
      |  FROM flagged),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id, sess_id
      |    ORDER BY ts, event_id) AS rn
      |  FROM sess),
      |paths AS (
      |  SELECT user_id, sess_id,
      |    string_agg(event_type, '>' ORDER BY rn) AS path
      |  FROM ranked WHERE rn <= 5 GROUP BY user_id, sess_id)
      |SELECT path, count(*) AS n_sessions
      |FROM paths GROUP BY path ORDER BY n_sessions DESC, path LIMIT 10""".stripMargin

  /** Winsorized (tail-clamped) robust mean per event type — the display
    * convention the reference documents for KPI tails
    * (docs/KPI_dictionary.md:19-21 "winsorize tails") promoted to a
    * first-class aggregate: clamp each value into its group's
    * [P05, P95], then average. Plan: one exact-percentile aggregate over
    * the type keyspace (5 rows), broadcast back onto the fact, one more
    * hash agg — the fact table never sorts globally and shuffles only on
    * event_type. At 100 TB swap the exact percentile for t19's mergeable
    * histogram sketch; the clamp+mean stages are unchanged.
    * Determinism: the interpolated bounds are rounded to 6 dp on BOTH
    * engines BEFORE clamping, so every clamped value is an exact decimal
    * of scale ≤ 6 and round(sum,6)/n is the exact-restore mean (QueryDef
    * rules 1-2) — no ulp-order hazard survives.
    */
  def winsorizedStats(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val bounds = ev.groupBy(col("event_type").as("bt"))
      .agg(round(expr("percentile(value, 0.05)"), 6).as("lo"),
        round(expr("percentile(value, 0.95)"), 6).as("hi"))
    ev.join(broadcast(bounds), col("event_type") === col("bt"))
      .withColumn("wv", least(greatest(col("value"), col("lo")), col("hi")))
      .groupBy("event_type")
      .agg(first("lo").as("lo"), first("hi").as("hi"),
        count(lit(1)).as("n"),
        (round(sum("wv"), 6) / count(lit(1))).as("wins_mean"),
        (round(sum("value"), 2) / count(lit(1))).as("raw_mean"))
      .orderBy("event_type")
  }

  private val winsorizedStatsSql =
    """WITH b AS (
      |  SELECT event_type AS bt,
      |    round(quantile_cont(value, 0.05), 6) AS lo,
      |    round(quantile_cont(value, 0.95), 6) AS hi
      |  FROM events GROUP BY event_type)
      |SELECT event_type, any_value(lo) AS lo, any_value(hi) AS hi,
      |  count(*) AS n,
      |  round(sum(least(greatest(value, lo), hi)), 6) / count(*) AS wins_mean,
      |  round(sum(value), 2) / count(*) AS raw_mean
      |FROM events JOIN b ON event_type = bt
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** CDC changelog apply — latest-wins snapshot with delete tombstones
    * (the MERGE/upsert pattern every lakehouse table maintenance job
    * runs): events is read as an ordered changelog per user_id; the
    * user's LATEST event decides their snapshot row, and a latest
    * 'error' acts as a tombstone that deletes the user from the
    * snapshot. One user_id exchange serves both window computations
    * (recency rank and per-user change count); the snapshot is
    * key-cardinality-sized, never event-volume-sized. At 100 TB the
    * changelog would be date-partitioned and this exact plan applies a
    * day's partition against the key space it touches.
    * Determinism: ordering is fully tie-broken (ts desc, event_id desc);
    * value is emitted raw (stored bits, QueryDef rule 4).
    */
  def cdcSnapshot(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(byUser))
      .withColumn("n_events", count(lit(1)).over(Window.partitionBy("user_id")))
      .filter(col("rn") === 1 && col("event_type") =!= "error")
      .select(col("user_id"), col("event_type").as("last_type"),
        col("value").as("last_value"),
        unix_micros(col("ts")).as("last_ts_us"), col("n_events"))
      .orderBy("user_id")
  }

  private val cdcSnapshotSql =
    """WITH ranked AS (
      |  SELECT user_id, event_type, value, ts,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS rn,
      |    count(*) OVER (PARTITION BY user_id) AS n_events
      |  FROM events)
      |SELECT user_id, event_type AS last_type, value AS last_value,
      |  epoch_us(ts) AS last_ts_us, n_events
      |FROM ranked WHERE rn = 1 AND event_type <> 'error'
      |ORDER BY user_id""".stripMargin

  /** Session-quality rollup — the product-analytics report over t12's
    * sessionization: per DAY of session start, session count, bounce
    * rate (1-event sessions), mean duration, and mean depth. The
    * sessionize→reduce-to-sessions→rollup-by-day chain shuffles the
    * event log ONCE (on user_id, for the gap windows); the session frame
    * is session-cardinality-sized and the day rollup's keyspace is the
    * calendar. Determinism: bounce/duration/depth means are exact-
    * integer sums divided by exact counts (QueryDef rule 3) — no
    * rounding anywhere. Duration sums are µs longs: a day's sum stays
    * under 2⁵³ while per-session durations are gap-bounded (30 min/gap ×
    * events); at corpus scales beyond that, accumulate DECIMAL(38,0)
    * like t24.
    */
  def sessionStats(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 30L * 60 * 1000000, 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum("new_sess").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sess_id")
      .agg(min("ts").as("start_ts"), max("ts").as("end_ts"),
        count(lit(1)).as("n_ev"))
      .groupBy(to_date(col("start_ts")).as("day"))
      .agg(count(lit(1)).as("n_sessions"),
        (sum(when(col("n_ev") === 1, 1L).otherwise(0L)) * lit(1.0) /
          count(lit(1))).as("bounce_rate"),
        (sum(unix_micros(col("end_ts")) - unix_micros(col("start_ts"))) * lit(1.0) /
          count(lit(1))).as("avg_duration_us"),
        (sum("n_ev") * lit(1.0) / count(lit(1))).as("avg_depth"))
      .orderBy("day")
  }

  private val sessionStatsSql =
    """WITH flagged AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30*60*1000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id, ts
      |  FROM flagged),
      |sr AS (
      |  SELECT user_id, sess_id, min(ts) AS start_ts, max(ts) AS end_ts,
      |    count(*) AS n_ev
      |  FROM sess GROUP BY user_id, sess_id)
      |SELECT CAST(start_ts AS DATE) AS day, count(*) AS n_sessions,
      |  sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) * 1.0 / count(*) AS bounce_rate,
      |  sum(epoch_us(end_ts) - epoch_us(start_ts)) * 1.0 / count(*) AS avg_duration_us,
      |  sum(n_ev) * 1.0 / count(*) AS avg_depth
      |FROM sr GROUP BY day ORDER BY day""".stripMargin

  /** Exponentially-weighted moving average over each type's hourly series
    * — trend smoothing that discounts the past geometrically (α = 0.3,
    * trailing 24 observed buckets). Spelled as 24 EXPLICIT weighted lag
    * terms in a FIXED left-to-right summation order on both engines
    * (QueryDef rule 5 taken further: not just explicit lags, but an
    * order-pinned fold), with the weights (1−α)^d materialized as
    * literal doubles from repeated multiplication — libm pow() is NOT
    * cross-engine bit-stable, literals round-trip exactly. Even with
    * the spelled-out fold one engine still reassociates (measured ≤2e-14
    * absolute), so the quotient carries 6-dp display rounding per
    * QueryDef rule 6 (an EWMA is never exactly on a rounding boundary).
    * The window is per-type over the hours-sized aggregate (tiny after
    * reduction); the raw event volume only ever feeds the bucket agg.
    */
  def ewmaHourly(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg((round(sum("value"), 2) / count(lit(1))).as("av"))
    val w = Window.partitionBy("event_type").orderBy("h")
    val num = ewmaWeights.zipWithIndex.map { case (wt, d) =>
      coalesce(lag(col("av"), d).over(w), lit(0.0)) * lit(wt)
    }.reduceLeft(_ + _)
    val den = ewmaWeights.zipWithIndex.map { case (wt, d) =>
      when(lag(col("av"), d).over(w).isNotNull, lit(wt)).otherwise(lit(0.0))
    }.reduceLeft(_ + _)
    hourly
      .withColumn("ewma", round(num / den, 6))
      .select(col("event_type"), unix_micros(col("h")).as("h_us"),
        col("av").as("avg_value"), col("ewma"))
      .orderBy("event_type", "h_us")
  }

  /** (1−α)^d for d = 0..23 by repeated multiplication; printed into both
    * query texts via Double.toString (shortest round-trip repr).
    */
  private val ewmaWeights: Seq[Double] =
    Iterator.iterate(1.0)(_ * 0.7).take(24).toSeq

  private val ewmaHourlySql = {
    val num = ewmaWeights.zipWithIndex.map { case (wt, d) =>
      s"coalesce(lag(av, $d) OVER w, 0.0) * $wt"
    }.mkString(" + ")
    val den = ewmaWeights.zipWithIndex.map { case (wt, d) =>
      s"CASE WHEN lag(av, $d) OVER w IS NOT NULL THEN $wt ELSE 0.0 END"
    }.mkString(" + ")
    s"""WITH hourly AS (
       |  SELECT event_type, date_trunc('hour', ts) AS h,
       |    round(sum(value), 2) / count(*) AS av
       |  FROM events GROUP BY event_type, h)
       |SELECT event_type, epoch_us(h) AS h_us, av AS avg_value,
       |  round(($num) / ($den), 6) AS ewma
       |FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY h)
       |ORDER BY event_type, h_us""".stripMargin
  }

  /** Median absolute deviation per event type — the robust dispersion
    * companion to t35's winsorized mean (σ is wrecked by the same tails
    * winsorization clamps; MAD is the standard outlier-immune scale
    * estimate, and MAD·1.4826 the robust σ). Two-level percentile: the
    * per-type median is computed, 6-dp-pinned (t35's determinism trick —
    * the deviations |v − m| then start from identical doubles in both
    * engines), broadcast back, and the deviation median is one more
    * per-type exact percentile. Same scale posture as t35: two passes
    * over the fact, each reducing on the 5-key type space; at 100 TB
    * both percentile stages swap for t19's mergeable histogram sketch.
    */
  def madByType(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val med = ev.groupBy(col("event_type").as("mt"))
      .agg(round(expr("percentile(value, 0.5)"), 6).as("med"))
    ev.join(broadcast(med), col("event_type") === col("mt"))
      .withColumn("dev", abs(col("value") - col("med")))
      .groupBy("event_type")
      .agg(first("med").as("median_v"),
        count(lit(1)).as("n"),
        round(expr("percentile(dev, 0.5)"), 6).as("mad"))
      .withColumn("robust_sigma", round(col("mad") * lit(1.4826), 6))
      .orderBy("event_type")
  }

  private val madByTypeSql =
    """WITH m AS (
      |  SELECT event_type AS mt, round(quantile_cont(value, 0.5), 6) AS med
      |  FROM events GROUP BY event_type)
      |SELECT event_type, any_value(med) AS median_v, count(*) AS n,
      |  round(quantile_cont(abs(value - med), 0.5), 6) AS mad,
      |  round(round(quantile_cont(abs(value - med), 0.5), 6) * 1.4826, 6)
      |    AS robust_sigma
      |FROM events JOIN m ON event_type = mt
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Snapshot diff / reconciliation — the "data diff" every pipeline
    * migration and backfill audit runs: the t36 CDC snapshot is
    * evaluated at two cutoffs (mid-month and month-end) and FULL OUTER
    * joined on the key, classifying every user as added (absent at T1),
    * removed (tombstoned between the cutoffs), or changed (any newer
    * event); unchanged keys are suppressed like any diff. Each snapshot
    * is one user_id window pass over its cutoff-filtered scan (the
    * filter pushes to parquet); the full outer join hashes both
    * key-cardinality-sized snapshots on user_id. Determinism: status is
    * decided by exact epoch-µs comparison, values emitted raw.
    */
  def snapshotDiff(s: SparkSession, dir: String): DataFrame = {
    def snap(cutoff: String, pre: String): DataFrame = {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, dir)
        .filter(col("ts") < lit(cutoff).cast("timestamp"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("event_type") =!= "error")
        .select(col("user_id").as(s"${pre}_uid"),
          col("event_type").as(s"${pre}_type"),
          col("value").as(s"${pre}_value"),
          unix_micros(col("ts")).as(s"${pre}_ts_us"))
    }
    snap("2024-01-15", "old")
      .join(snap("2024-01-30", "new"),
        col("old_uid") === col("new_uid"), "full_outer")
      .withColumn("user_id", coalesce(col("old_uid"), col("new_uid")))
      .withColumn("status",
        when(col("old_uid").isNull, "added")
          .when(col("new_uid").isNull, "removed")
          .when(col("new_ts_us") =!= col("old_ts_us"), "changed")
          .otherwise("unchanged"))
      .filter(col("status") =!= "unchanged")
      .select("user_id", "status", "old_type", "new_type",
        "old_value", "new_value")
      .orderBy("user_id")
  }

  private val snapshotDiffSql =
    """WITH s1 AS (
      |  SELECT user_id AS old_uid, event_type AS old_type,
      |    value AS old_value, epoch_us(ts) AS old_ts_us
      |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
      |          ORDER BY ts DESC, event_id DESC) AS rn
      |        FROM events WHERE ts < TIMESTAMP '2024-01-15')
      |  WHERE rn = 1 AND event_type <> 'error'),
      |s2 AS (
      |  SELECT user_id AS new_uid, event_type AS new_type,
      |    value AS new_value, epoch_us(ts) AS new_ts_us
      |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
      |          ORDER BY ts DESC, event_id DESC) AS rn
      |        FROM events WHERE ts < TIMESTAMP '2024-01-30')
      |  WHERE rn = 1 AND event_type <> 'error')
      |SELECT coalesce(old_uid, new_uid) AS user_id,
      |  CASE WHEN old_uid IS NULL THEN 'added'
      |       WHEN new_uid IS NULL THEN 'removed'
      |       WHEN new_ts_us <> old_ts_us THEN 'changed'
      |       ELSE 'unchanged' END AS status,
      |  old_type, new_type, old_value, new_value
      |FROM s1 FULL OUTER JOIN s2 ON old_uid = new_uid
      |WHERE CASE WHEN old_uid IS NULL THEN 'added'
      |           WHEN new_uid IS NULL THEN 'removed'
      |           WHEN new_ts_us <> old_ts_us THEN 'changed'
      |           ELSE 'unchanged' END <> 'unchanged'
      |ORDER BY user_id""".stripMargin

  /** Additive seasonal decomposition — the two-factor (hour-of-day ×
    * weekday) baseline model behind every "is this hour unusual for a
    * Tuesday 3 pm" check, generalizing t02's single-factor hour
    * baseline: expected(h, d) = ĝ + (h̄ − ĝ) + (d̄ − ĝ), residual =
    * actual − expected per calendar cell. All three effect tables are
    * tiny aggregates (1, 24, 7 rows) broadcast onto the 168-cell
    * output — the fact table feeds four independent reductions and
    * never joins anything its own size. Determinism: every mean is an
    * exact-restored 2-dec sum over an exact count (QueryDef rules 1-2),
    * and expected/residual are fixed-order arithmetic on those — NO
    * display rounding anywhere.
    */
  def seasonalBaseline(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("value"), weekday(col("ts")).as("dow"),
        hour(col("ts")).as("hod"))
    val g = ev.agg((round(sum("value"), 2) / count(lit(1))).as("g"))
    val byHour = ev.groupBy("hod")
      .agg((round(sum("value"), 2) / count(lit(1))).as("hmean"))
    val byDow = ev.groupBy("dow")
      .agg((round(sum("value"), 2) / count(lit(1))).as("dmean"))
    ev.groupBy("dow", "hod")
      .agg(count(lit(1)).as("n"),
        (round(sum("value"), 2) / count(lit(1))).as("actual"))
      .join(broadcast(byHour), "hod")
      .join(broadcast(byDow), "dow")
      .crossJoin(broadcast(g))
      .withColumn("expected", col("g") + (col("hmean") - col("g")) +
        (col("dmean") - col("g")))
      .withColumn("residual", col("actual") - col("expected"))
      .select("dow", "hod", "n", "actual", "expected", "residual")
      .orderBy("dow", "hod")
  }

  private val seasonalBaselineSql =
    """WITH ev AS (
      |  SELECT value, (dayofweek(ts) + 6) % 7 AS dow, hour(ts) AS hod
      |  FROM events),
      |g AS (SELECT round(sum(value), 2) / count(*) AS g FROM ev),
      |h AS (SELECT hod, round(sum(value), 2) / count(*) AS hmean
      |      FROM ev GROUP BY hod),
      |d AS (SELECT dow, round(sum(value), 2) / count(*) AS dmean
      |      FROM ev GROUP BY dow),
      |cell AS (SELECT dow, hod, count(*) AS n,
      |           round(sum(value), 2) / count(*) AS actual
      |         FROM ev GROUP BY dow, hod)
      |SELECT cell.dow, cell.hod, cell.n, cell.actual,
      |  g.g + (h.hmean - g.g) + (d.dmean - g.g) AS expected,
      |  cell.actual - (g.g + (h.hmean - g.g) + (d.dmean - g.g)) AS residual
      |FROM cell JOIN h ON cell.hod = h.hod
      |JOIN d ON cell.dow = d.dow, g
      |ORDER BY cell.dow, cell.hod""".stripMargin

  /** Irregular→regular resampling with linear interpolation — gap filling
    * onto the hourly grid, the step between raw telemetry and any
    * fixed-step model input (t27 finds the holes; this FILLS them).
    * Plan: the per-(type, hour) observation aggregate, a generated
    * calendar spine (t27's 1-row span + type set — the fact is touched
    * exactly twice), then per type TWO directional ignore-nulls running
    * windows (last non-null obs looking back, first looking forward)
    * over the spine-sized frame — linear single-shuffle, the same
    * tagged-union discipline as the t13 as-of join, never a point-in-
    * time join per gap. Rows are labeled obs/interp/edge (edges have no
    * bracketing pair and stay null). Determinism: observed means are
    * exact restores; the interpolation pv + (nv−pv)·(Δ1·1.0/Δ2) runs
    * the SAME fixed-order float ops on exact-integer µs deltas in both
    * engines — no display rounding.
    */
  def resampleInterpolate(s: SparkSession, dir: String): DataFrame = {
    val obs = Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg((round(sum("value"), 2) / count(lit(1))).as("v"))
    val span = obs.agg(min("h").as("h_lo"), max("h").as("h_hi"),
      collect_set("event_type").as("types"))
    val spine = span
      .select(explode(sequence(col("h_lo"), col("h_hi"),
        expr("INTERVAL 1 HOUR"))).as("h"), col("types"))
      .select(col("h"), explode(col("types")).as("event_type"))
    val back = Window.partitionBy("event_type").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy("event_type").orderBy("h")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsH = when(col("v").isNotNull, col("h"))
    spine.join(obs, Seq("event_type", "h"), "left")
      .withColumn("pv", last("v", ignoreNulls = true).over(back))
      .withColumn("ph", last(obsH, ignoreNulls = true).over(back))
      .withColumn("nv", first("v", ignoreNulls = true).over(fwd))
      .withColumn("nh", first(obsH, ignoreNulls = true).over(fwd))
      .select(col("event_type"), unix_micros(col("h")).as("h_us"),
        when(col("v").isNotNull, "obs")
          .when(col("pv").isNotNull && col("nv").isNotNull, "interp")
          .otherwise("edge").as("kind"),
        when(col("v").isNotNull, col("v"))
          .when(col("pv").isNotNull && col("nv").isNotNull,
            col("pv") + (col("nv") - col("pv")) *
              ((unix_micros(col("h")) - unix_micros(col("ph"))) * lit(1.0) /
                (unix_micros(col("nh")) - unix_micros(col("ph")))))
          .as("value"))
      .orderBy("event_type", "h_us")
  }

  private val resampleInterpolateSql =
    """WITH obs AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h,
      |    round(sum(value), 2) / count(*) AS v
      |  FROM events GROUP BY event_type, h),
      |span AS (SELECT min(h) AS h_lo, max(h) AS h_hi FROM obs),
      |spine AS (SELECT t.event_type, g.h
      |          FROM (SELECT DISTINCT event_type FROM obs) t,
      |               (SELECT unnest(generate_series(h_lo, h_hi,
      |                  INTERVAL 1 HOUR)) AS h FROM span) g),
      |j AS (SELECT s.event_type, s.h, o.v
      |      FROM spine s LEFT JOIN obs o
      |        ON s.event_type = o.event_type AND s.h = o.h),
      |f AS (SELECT *,
      |  last_value(v IGNORE NULLS) OVER wb AS pv,
      |  last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
      |    OVER wb AS ph,
      |  first_value(v IGNORE NULLS) OVER wf AS nv,
      |  first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
      |    OVER wf AS nh
      |  FROM j WINDOW
      |    wb AS (PARTITION BY event_type ORDER BY h
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |    wf AS (PARTITION BY event_type ORDER BY h
      |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT event_type, epoch_us(h) AS h_us,
      |  CASE WHEN v IS NOT NULL THEN 'obs'
      |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN 'interp'
      |       ELSE 'edge' END AS kind,
      |  CASE WHEN v IS NOT NULL THEN v
      |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
      |         pv + (nv - pv) * ((epoch_us(h) - epoch_us(ph)) * 1.0
      |           / (epoch_us(nh) - epoch_us(ph)))
      |       ELSE NULL END AS value
      |FROM f ORDER BY event_type, h_us""".stripMargin

  /** Burstiest-user audit — rate-limit / abuse detection over a TRUE
    * sliding horizon: per event, how many of the user's events fall in
    * the trailing hour ENDING AT IT (t17's RANGE frame counting rows
    * instead of summing — the frame is value-defined, so simultaneous
    * events are peers and the count is order-independent); per user, the
    * peak burst; top-20 burstiest. Tumbling buckets UNDERCOUNT bursts
    * that straddle a boundary — the sliding frame is the correct
    * semantics, and it stays one user_id exchange (window + agg ride
    * it) plus a TakeOrderedAndProject. Pure integer outputs — nothing
    * to round.
    */
  def burstiestUsers(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .selectExpr("user_id",
        """count(*) OVER (PARTITION BY user_id ORDER BY ts
          |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS burst""".stripMargin)
      .groupBy("user_id")
      .agg(max("burst").as("max_burst"), count(lit(1)).as("n_events"))
      .orderBy(desc("max_burst"), col("user_id"))
      .limit(20)

  private val burstiestUsersSql =
    """WITH b AS (
      |  SELECT user_id,
      |    count(*) OVER (PARTITION BY user_id ORDER BY ts
      |      RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS burst
      |  FROM events)
      |SELECT user_id, max(burst) AS max_burst, count(*) AS n_events
      |FROM b GROUP BY user_id
      |ORDER BY max_burst DESC, user_id LIMIT 20""".stripMargin

  /** Last-touch attribution (t13's as-of discipline applied to marketing
    * analytics): each purchase is credited to the user's most recent
    * prior view/click within a 1-hour window, else 'direct'; revenue
    * rolls up per attributed channel. One user_id exchange carries the
    * carry-forward window (`last(..., ignoreNulls)` over an unbounded-
    * preceding frame — linear, never a per-purchase point-in-time join);
    * the channel keyspace is tiny so the rollup partials map-side.
    * Revenue is the scale-2 exact-restore sum (QueryDef rule 1).
    */
  def lastTouchAttribution(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select("event_id", "ts", "user_id", "event_type", "value")
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    e
      .withColumn("src_type",
        last(when(col("event_type") =!= "purchase", col("event_type")), true).over(w))
      .withColumn("src_ts",
        last(when(col("event_type") =!= "purchase", col("ts")), true).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("attributed", coalesce(
        when(col("src_ts") >= col("ts") - expr("INTERVAL 1 HOUR"), col("src_type")),
        lit("direct")))
      .groupBy("attributed")
      .agg(count(lit(1)).as("n_purchases"), round(sum("value"), 2).as("revenue"))
      .orderBy("attributed")
  }

  private val lastTouchAttributionSql =
    """WITH e AS (
      |  SELECT event_id, ts, user_id, event_type, value FROM events
      |  WHERE event_type IN ('view', 'click', 'purchase')),
      |w AS (
      |  SELECT *,
      |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS src_type,
      |    last_value(CASE WHEN event_type <> 'purchase' THEN ts END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS src_ts
      |  FROM e)
      |SELECT coalesce(CASE WHEN src_ts >= ts - INTERVAL 1 HOUR THEN src_type END,
      |                'direct') AS attributed,
      |  count(*) AS n_purchases, round(sum(value), 2) AS revenue
      |FROM w WHERE event_type = 'purchase'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Incremental aggregate maintenance — the materialized-view update
    * discipline: the hourly rollup is maintained by MERGING partial
    * aggregates of a base corpus and a new-arrivals delta (md5-60
    * bucket split, d14's deterministic cut) instead of re-aggregating
    * the full fact — count/sum are algebraic so merge = one more
    * group-by over |buckets| partial rows, never a second fact scan of
    * base. The ORACLE recomputes directly over everything, so the
    * hash-equality check IS the proof that merge ≡ recompute holds
    * cross-engine. Floats: partials stay UNROUNDED; the scale-2
    * exact-restore round applies once, after the merge (QueryDef rule
    * 1 — rounding partials first would double-round); the mean derives
    * from merged sum/count (rule 2).
    */
  def incrementalRollup(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val ev = Tables.events(s, dir)
      .selectExpr("ts", "event_type", "value",
        "pmod(md5_long60(CAST(event_id AS STRING)), 100) AS bucket")
    def partial(df: DataFrame): DataFrame = df
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("pn"), sum("value").as("psum"))
    partial(ev.filter(col("bucket") < 80))
      .unionByName(partial(ev.filter(col("bucket") >= 80)))
      .groupBy("h", "event_type")
      .agg(sum("pn").as("n"), round(sum("psum"), 2).as("sum_value"))
      .select(unix_micros(col("h")).as("bucket_us"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("bucket_us", "event_type")
  }

  private val incrementalRollupSql =
    """SELECT epoch_us(date_trunc('hour', ts)) AS bucket_us, event_type,
      | count(*) AS n, round(sum(value), 2) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY bucket_us, event_type""".stripMargin

  /** Per-type CALENDAR-DENSE hourly counts — the shared input of the
    * time-series trio t48/t49/t51: observed (type, hour) counts
    * left-joined onto each type's full [min(h), max(h)] hour spine
    * (t27's generator idiom), silent hours as explicit zeros. Without
    * the spine, `lag(d, 24)` is 24 OBSERVED rows back — not 24 calendar
    * hours — and a full-outage hour is INVISIBLE to the downward CUSUM,
    * the one event it most needs to see. Per-type span (not global):
    * interior gaps are outages; hours before a type's first event are
    * unknowable, not zero. Scale shape: the fact table reduces to the
    * hours-sized observed rollup once; the spine generates from a
    * |types|-row min/max aggregate and the zero-fill join is
    * spine-sized — nothing here rescans or reshuffles the fact table.
    */
  private def hourlyDenseCounts(s: SparkSession, dir: String): DataFrame = {
    val observed = Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n0"))
    val spine = observed.groupBy("event_type")
      .agg(min("h").as("lo"), max("h").as("hi"))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"),
          expr("INTERVAL 1 HOUR"))).as("h"))
    spine.join(observed, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"),
        coalesce(col("n0"), lit(0L)).as("n"))
  }

  /** The DuckDB twin of [[hourlyDenseCounts]] — CTEs ending in
    * `hourly(event_type, h, n)`, shared verbatim by the t48/t49/t51
    * oracles.
    */
  private val hourlyDenseSqlCte =
    """hourly0 AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
      |  FROM events GROUP BY event_type, h),
      |sp AS (SELECT event_type, min(h) AS lo, max(h) AS hi
      |       FROM hourly0 GROUP BY event_type),
      |spine AS (SELECT event_type,
      |            unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
      |          FROM sp),
      |hourly AS (SELECT s.event_type, s.h, coalesce(h0.n, CAST(0 AS BIGINT)) AS n
      |           FROM spine s LEFT JOIN hourly0 h0 USING (event_type, h))""".stripMargin

  /** Page's CUSUM drift detector over each type's hourly event-rate series
    * — the sequential change-point monitor (Page 1954) that flags a
    * sustained rate shift long before a fixed z-threshold (t02/t31) fires:
    * small deviations ACCUMULATE until the cumulative excess crosses the
    * decision band. The textbook statistic is recursive
    * (s_i = max(0, s_{i−1} + x_i − μ)), which no SQL window expresses
    * directly; the identity this query pins is that the clamped recursion
    * equals a PREFIX SUM MINUS ITS RUNNING MINIMUM —
    * up_i = P_i − min(0, P_1..P_i) with P_i = Σ_{j≤i}(n_j − μ) — so the
    * whole detector is two stock window functions over the hours-sized
    * per-type aggregate (and the mirrored running max gives the downward
    * detector). Decision band h = 4·√μ, the Poisson-scaled four-sigma
    * convention.
    *
    * Float discipline: P_i = S_i − i·μ where S_i is a cumulative INTEGER
    * sum and i a row_number — the only float ops are one multiply and one
    * subtract on exact inputs (μ = total/hours, one int/int division), so
    * every cusum value is bit-identical cross-engine and is emitted
    * UNROUNDED (QueryDef rules 3-4; a windowed SUM of doubles would be
    * reassociation-unsafe — over ints it is exact). Scale shape: the raw
    * event stream feeds one map-side-combining bucket agg; every window
    * runs per-type over the bounded hours series. The series is
    * CALENDAR-DENSE ([[hourlyDenseCounts]]): a silent hour is an
    * explicit zero, so a full outage drives the downward detector
    * instead of silently vanishing from the series.
    */
  def cusumDrift(s: SparkSession, dir: String): DataFrame = {
    val hourly = hourlyDenseCounts(s, dir)
      .select(col("event_type"), col("h"), col("n").as("n_events"))
    val mu = hourly.groupBy(col("event_type").as("mt"))
      .agg((sum("n_events") * lit(1.0) / count(lit(1))).as("mu"))
    val w = Window.partitionBy("event_type").orderBy("h")
    val wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hourly.join(broadcast(mu), col("event_type") === col("mt"))
      .withColumn("p",
        sum("n_events").over(wrun).cast("double") -
          row_number().over(w) * col("mu"))
      .withColumn("cusum_up", col("p") - least(min("p").over(wrun), lit(0.0)))
      .withColumn("cusum_down",
        greatest(max("p").over(wrun), lit(0.0)) - col("p"))
      .select(col("event_type"), unix_micros(col("h")).as("h_us"),
        col("n_events"), col("mu"), col("cusum_up"), col("cusum_down"),
        (col("cusum_up") > lit(4.0) * sqrt(col("mu"))).as("up_drift"),
        (col("cusum_down") > lit(4.0) * sqrt(col("mu"))).as("down_drift"))
      .orderBy("event_type", "h_us")
  }

  private val cusumDriftSql =
    s"""WITH $hourlyDenseSqlCte,
      |hd AS (SELECT event_type, h, n AS n_events FROM hourly),
      |m AS (SELECT event_type, sum(n_events) * 1.0 / count(*) AS mu
      |      FROM hd GROUP BY event_type),
      |pp AS (SELECT event_type, h, n_events, mu,
      |        CAST(sum(n_events) OVER wr AS DOUBLE)
      |          - row_number() OVER wo * mu AS p
      |      FROM hd JOIN m USING (event_type)
      |      WINDOW wo AS (PARTITION BY event_type ORDER BY h),
      |             wr AS (PARTITION BY event_type ORDER BY h
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT event_type, epoch_us(h) AS h_us, n_events, mu,
      |  p - least(min(p) OVER wr, 0.0) AS cusum_up,
      |  greatest(max(p) OVER wr, 0.0) - p AS cusum_down,
      |  p - least(min(p) OVER wr, 0.0) > 4.0 * sqrt(mu) AS up_drift,
      |  greatest(max(p) OVER wr, 0.0) - p > 4.0 * sqrt(mu) AS down_drift
      |FROM pp
      |WINDOW wr AS (PARTITION BY event_type ORDER BY h
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY event_type, h_us""".stripMargin

  /** Autocorrelation of each type's hourly event-rate series at lags
    * 1/2/3/6/12/24 — the diagnostic that tells an operator WHICH temporal
    * structure the other t-queries should model: a daily cycle shows as a
    * lag-24 peak (t41's seasonal baseline is then justified), short-range
    * stickiness as lag-1/2 mass (t38's EWMA horizon), white noise as
    * nothing (model-free thresholds suffice). r_k = Σ d_i·d_{i−k} / Σ d_i²
    * with d = n − μ, the standard biased ACF estimator (denominator over
    * the full series, so r_k is a positive-semidefinite sequence — the
    * property fitting methods require).
    *
    * Scale/float shape: the raw stream reduces to the hours-sized per-type
    * aggregate before any window; the six lag columns ride ONE
    * type-partitioned sort (six `lag` frames over the same window spec);
    * products are exact doubles (int counts minus an int/int μ) and only
    * the final ratio carries 6-dp rounding — sum reassociation noise
    * ~1e-12 against the 5e-7 boundary (e02's measured-noise argument).
    * Lag terms with no partner (series head) drop out of num/count via
    * null propagation; the denominator spans the full series. The
    * series is CALENDAR-DENSE ([[hourlyDenseCounts]]): lag(d, 24) is 24
    * calendar hours — the daily cycle the lag-24 peak claims to
    * measure — not 24 observed rows, which on a gapped series would
    * silently misalign every lag.
    */
  def acfHourly(s: SparkSession, dir: String): DataFrame = {
    val lags = Seq(1, 2, 3, 6, 12, 24)
    val hourly = hourlyDenseCounts(s, dir)
    val mu = hourly.groupBy(col("event_type").as("mt"))
      .agg((sum("n") * lit(1.0) / count(lit(1))).as("mu"))
    val w = Window.partitionBy("event_type").orderBy("h")
    val dd = hourly.join(broadcast(mu), col("event_type") === col("mt"))
      .withColumn("d", col("n") - col("mu"))
    val withLags = lags.foldLeft(dd) { (df, k) =>
      df.withColumn(s"d$k", lag("d", k).over(w))
    }
    val aggs = sum(col("d") * col("d")).as("den") +:
      (lags.map(k => sum(col("d") * col(s"d$k")).as(s"num$k")) ++
        lags.map(k => count(col(s"d$k")).as(s"n$k")))
    val byType = withLags.groupBy("event_type").agg(aggs.head, aggs.tail: _*)
    val stackArgs = lags
      .map(k => s"$k, n$k, round(num$k / den, 6)").mkString(", ")
    byType.selectExpr("event_type",
        s"stack(${lags.size}, $stackArgs) AS (lag_h, n_pairs, acf)")
      .orderBy("event_type", "lag_h")
  }

  private val acfHourlySql = {
    val lags = Seq(1, 2, 3, 6, 12, 24)
    val lagCols = lags.map(k => s"lag(d, $k) OVER w AS d$k").mkString(", ")
    val aggCols = lags.map(k =>
      s"sum(d * d$k) AS num$k, count(d$k) AS n$k").mkString(", ")
    val rows = lags.map(k =>
      s"SELECT event_type, $k AS lag_h, n$k AS n_pairs, round(num$k / den, 6) AS acf FROM a")
      .mkString("\n|", "\n|UNION ALL ", "")
    s"""WITH $hourlyDenseSqlCte,
       |m AS (SELECT event_type, sum(n) * 1.0 / count(*) AS mu
       |      FROM hourly GROUP BY event_type),
       |dv AS (SELECT event_type, h, n - mu AS d
       |       FROM hourly JOIN m USING (event_type)),
       |l AS (SELECT event_type, d, $lagCols
       |      FROM dv WINDOW w AS (PARTITION BY event_type ORDER BY h)),
       |a AS (SELECT event_type, sum(d * d) AS den, $aggCols
       |      FROM l GROUP BY event_type)$rows
       |ORDER BY event_type, lag_h""".stripMargin
  }

  /** Seasonal-strength decomposition — per event type, how much of the
    * hourly-count variance the hour-of-day cycle explains: the ANOVA R²
    * (eta-squared) of the 24-level hour-of-day factor,
    * strength = 1 − SSW/SST = SSB/SST ∈ [0, 1]. This is the quantified
    * companion to t41's baseline (t41 FITS the seasonal means; this says
    * whether they are worth fitting) and the model-selection gate before
    * t38's EWMA or t49's ACF lags are trusted: strength near 1 → a
    * seasonal baseline removes most variance; near 0 → the cycle is
    * noise and a flat baseline does as well.
    *
    * Scale shape: one map-side-combining hour-grain count aggregate of
    * the fact table, then two reductions of the hours-sized frame (a
    * per-(type, hod) partial and a per-type total) joined on the
    * |types|-bounded key — the fact table is scanned once and never
    * joined to anything its own size. Floats: hourly counts are exact
    * ints, so SST's Σx and Σx² are exact; the ANOVA identity
    * SSW = Σx² − Σ_h S_h²/n_h needs one division per hour-of-day cell
    * (24 per type) and the 24-term sum order differs across engines, so
    * strength and variance carry 6-dp display rounding (QueryDef rule 6);
    * the mean is one int/int division. Products are promoted to double
    * BEFORE multiplying (`s · 1.0 · s`), identically on both engines —
    * overflow-safe where a long·long square is not.
    */
  def seasonalStrength(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .groupBy("event_type", "h").agg(count(lit(1)).as("cnt"))
    val byHod = hourly
      .select(col("event_type"), hour(col("h")).as("hod"), col("cnt"))
      .groupBy("event_type", "hod")
      .agg(sum("cnt").as("sh"), count(lit(1)).as("nh"))
      .groupBy("event_type")
      .agg(sum(col("sh") * lit(1.0) * col("sh") / col("nh")).as("ss_hod"))
    val tot = hourly.groupBy("event_type")
      .agg(count(lit(1)).as("n_hours"), sum("cnt").as("sx"),
        sum(col("cnt") * col("cnt")).as("sxx"))
    tot.join(byHod, "event_type")
      .selectExpr("event_type", "n_hours",
        "sx * 1.0D / n_hours AS mean_hourly",
        "round((sxx - sx * 1.0D * sx / n_hours) / n_hours, 6) AS var_hourly",
        """round(CASE WHEN sxx - sx * 1.0D * sx / n_hours = 0.0D THEN NULL
          |  ELSE 1.0D - (sxx - ss_hod) / (sxx - sx * 1.0D * sx / n_hours)
          |  END, 6) AS seasonal_strength""".stripMargin)
      .orderBy("event_type")
  }

  private val seasonalStrengthSql =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS cnt
      |  FROM events GROUP BY event_type, h),
      |w AS (SELECT event_type,
      |        sum(sh * 1.0 * sh / nh) AS ss_hod
      |      FROM (SELECT event_type, hour(h) AS hod,
      |              CAST(sum(cnt) AS BIGINT) AS sh, count(*) AS nh
      |            FROM hourly GROUP BY event_type, hod)
      |      GROUP BY event_type),
      |t AS (SELECT event_type, count(*) AS n_hours,
      |        CAST(sum(cnt) AS BIGINT) AS sx,
      |        CAST(sum(cnt * cnt) AS BIGINT) AS sxx
      |      FROM hourly GROUP BY event_type)
      |SELECT event_type, n_hours,
      |  sx * 1.0 / n_hours AS mean_hourly,
      |  round((sxx - sx * 1.0 * sx / n_hours) / n_hours, 6) AS var_hourly,
      |  round(CASE WHEN sxx - sx * 1.0 * sx / n_hours = 0.0 THEN NULL
      |    ELSE 1.0 - (sxx - ss_hod) / (sxx - sx * 1.0 * sx / n_hours)
      |    END, 6) AS seasonal_strength
      |FROM t JOIN w USING (event_type)
      |ORDER BY event_type""".stripMargin

  /** Changepoint LOCALIZATION — one binary-segmentation step (Scott &
    * Knott 1974; the recursion under every offline changepoint method)
    * per event type over the hourly counts: the split hour k that
    * maximizes the squared-error reduction
    * Δ(k) = S_k²/k + (S_n−S_k)²/(n−k) − S_n²/n, i.e. the best
    * two-segment piecewise-constant fit. t48's CUSUM DETECTS that a
    * sustained shift happened; this answers the operator's next
    * question — WHERE — with the before/after means a root-cause
    * review actually reads. (Production recurses on the louder
    * segment; one level is the pinned kernel.)
    *
    * Scale shape: one map-side-combining hour-grain count aggregate of
    * the fact table; the prefix sums are a window PARTITIONED BY
    * event_type over the hours-sized rollup (parallel across types,
    * calendar-bounded within one), and the argmax is a bounded top-1
    * row_number over the same partitioning. Floats: hourly counts are
    * exact ints, so S_k/k/n are exact; each Δ term is one
    * double-promoted product of exact ints over an exact int
    * (`s·1.0·s/k` — overflow-safe where a long·long square is not) and
    * the three-term sum is written in the same fixed order on both
    * engines — bit-identical, so the argmax needs NO rounding; the
    * reported means are int/int divisions (rule 3) and only the
    * reported Δ carries 6-dp display rounding. The series is
    * CALENDAR-DENSE ([[hourlyDenseCounts]]) so the split index k counts
    * calendar hours and an outage window is localizable — the segments
    * a root-cause review reads are wall-clock segments.
    */
  def changepoint(s: SparkSession, dir: String): DataFrame = {
    val hourly = hourlyDenseCounts(s, dir)
      .select(col("event_type"), col("h"), col("n").as("cnt"))
    val w = Window.partitionBy("event_type").orderBy("h")
    val scored = hourly
      .withColumn("k", row_number().over(w))
      .withColumn("sk", sum("cnt").over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      .withColumn("sn", sum("cnt").over(Window.partitionBy("event_type")))
      .filter(col("k") < col("n")) // both segments nonempty
      .withColumn("delta",
        expr("""sk * 1.0D * sk / k
          |  + (sn - sk) * 1.0D * (sn - sk) / (n - k)
          |  - sn * 1.0D * sn / n""".stripMargin))
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy(desc("delta"), col("h"))))
      .filter(col("rn") === 1)
      .selectExpr("event_type", "unix_micros(h) AS split_hour_us",
        "CAST(k AS BIGINT) AS n_hours_before",
        "CAST(n - k AS BIGINT) AS n_hours_after",
        "sk * 1.0D / k AS mean_before",
        "(sn - sk) * 1.0D / (n - k) AS mean_after",
        "round(delta, 6) AS delta_ss")
      .orderBy("event_type")
  }

  private val changepointSql =
    s"""WITH $hourlyDenseSqlCte,
      |hd AS (SELECT event_type, h, n AS cnt FROM hourly),
      |sc AS (SELECT event_type, h,
      |         row_number() OVER w AS k,
      |         CAST(sum(cnt) OVER w AS BIGINT) AS sk,
      |         count(*) OVER (PARTITION BY event_type) AS n,
      |         CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS sn
      |       FROM hd
      |       WINDOW w AS (PARTITION BY event_type ORDER BY h)),
      |d AS (SELECT *,
      |        sk * 1.0 * sk / k
      |          + (sn - sk) * 1.0 * (sn - sk) / (n - k)
      |          - sn * 1.0 * sn / n AS delta
      |      FROM sc WHERE k < n),
      |best AS (SELECT *, row_number() OVER (PARTITION BY event_type
      |           ORDER BY delta DESC, h) AS rn
      |         FROM d)
      |SELECT event_type, epoch_us(h) AS split_hour_us,
      |  CAST(k AS BIGINT) AS n_hours_before,
      |  CAST(n - k AS BIGINT) AS n_hours_after,
      |  sk * 1.0 / k AS mean_before,
      |  (sn - sk) * 1.0 / (n - k) AS mean_after,
      |  round(delta, 6) AS delta_ss
      |FROM best WHERE rn = 1 ORDER BY event_type""".stripMargin

  /** Session-level event-type affinity — PMI between event types
    * co-occurring in the same session (t12's 30-minute gap sessions):
    * pmi(a,b) = ln(P(a,b)·N / (P(a)·P(b)·…)) computed over session
    * baskets, the behavioral companion to q46's order baskets and
    * d41's text-bigram PMI — "users who error also buy?" is this table.
    * Types present in a session count ONCE (set semantics, like q46);
    * the per-pair count, marginals, and total are session-level.
    *
    * Scale shape: sessionization is the user-partitioned window t12
    * pins (parallel across users), the per-session DISTINCT type set is
    * a tiny list (≤ |types| = 5), pairs stream via pair_explode over
    * the slim (session, type-list) frame, and the |types|²-bounded
    * affinity table joins two broadcast marginals. Floats: pmi = one
    * ln of a ratio of exact ints (double-promoted products, one
    * division) — ln is irrational, 6-dp display rounding (rule 6);
    * supports are exact int/int.
    *
    * Type names map to a dense int code via a BROADCAST sorted
    * vocabulary so pair_explode (typed Long) serves this plan too —
    * codes join back to names for the report.
    */
  def sessionTypePmi(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val sess = Tables.events(s, dir)
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 30L * 60 * 1000000, 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum("new_sess").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("user_id", "sess_id", "event_type")
    val vocab = sess.select("event_type").distinct()
      .withColumn("tc", row_number().over(
        Window.orderBy("event_type")).cast("long") - 1)
    // NOT persisted, measured (round 15): the three consumers re-run
    // the sessionization windows, but caching the session-type frame
    // measured 1.03 → 1.27 s (cache write + reads beat by the cheap
    // window recompute — q46's lesson on the same shape)
    val coded = sess.join(broadcast(vocab), "event_type")
      .select(col("user_id"), col("sess_id"), col("tc")).distinct()
    val nSess = coded.select("user_id", "sess_id").distinct()
      .agg(count(lit(1)).as("n_sessions"))
    val marg = coded.groupBy("tc").agg(count(lit(1)).as("n_t"))
    val pairs = coded.groupBy("user_id", "sess_id")
      .agg(sort_array(collect_list(col("tc"))).as("ds"))
      .where(size(col("ds")) > 1)
      .selectExpr("pair_explode(ds) AS (x, y)")
      .groupBy("x", "y").agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(marg.select(col("tc").as("x"), col("n_t").as("n_a"))), "x")
      .join(broadcast(marg.select(col("tc").as("y"), col("n_t").as("n_b"))), "y")
      .join(broadcast(vocab.select(col("tc").as("x"),
        col("event_type").as("type_a"))), "x")
      .join(broadcast(vocab.select(col("tc").as("y"),
        col("event_type").as("type_b"))), "y")
      .crossJoin(broadcast(nSess))
      .select(col("type_a"), col("type_b"), col("n_both"),
        col("n_a"), col("n_b"),
        (col("n_both") * lit(1.0) / col("n_sessions")).as("support"),
        round(log(col("n_both") * lit(1.0) * col("n_sessions") /
          (col("n_a") * lit(1.0) * col("n_b"))), 6).as("pmi"))
      .orderBy("type_a", "type_b")
  }

  private val sessionTypePmiSql =
    """WITH flagged AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30*60*1000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, event_type,
      |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS sess_id
      |  FROM flagged),
      |coded AS (SELECT DISTINCT user_id, sess_id, event_type FROM sess),
      |ns AS (SELECT count(*) AS n_sessions
      |       FROM (SELECT DISTINCT user_id, sess_id FROM coded)),
      |mg AS (SELECT event_type, count(*) AS n_t FROM coded
      |       GROUP BY event_type),
      |pr AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
      |         count(*) AS n_both
      |       FROM coded a JOIN coded b ON a.user_id = b.user_id
      |         AND a.sess_id = b.sess_id AND a.event_type < b.event_type
      |       GROUP BY type_a, type_b)
      |SELECT type_a, type_b, n_both, x.n_t AS n_a, y.n_t AS n_b,
      |  n_both * 1.0 / n_sessions AS support,
      |  round(ln(n_both * 1.0 * n_sessions / (x.n_t * 1.0 * y.n_t)), 6)
      |    AS pmi
      |FROM pr JOIN mg x ON type_a = x.event_type
      |JOIN mg y ON type_b = y.event_type, ns
      |ORDER BY type_a, type_b""".stripMargin

  /** k-anonymity audit over the behavioral quasi-identifier — the
    * privacy-risk histogram a dataset release (or a training-data
    * inclusion decision) is reviewed against, complementing text-side
    * PII scrubbing: group events by the QI tuple (event_type, weekday,
    * hour-of-day) and report how many DISTINCT USERS share each tuple —
    * an event whose tuple is shared by k users hides in a crowd of k.
    * Output: per k-band (k=1 unique, 2-5, 6-20, 21+), the class count,
    * event count, and share of all events — the "what fraction of this
    * data singles someone out" number (Sweeney 2002's k-anonymity
    * measured, not enforced; enforcement = suppress/coarsen the k=1
    * band and re-audit).
    *
    * Scale shape: one map-side-combining (QI → events, distinct-user)
    * aggregate — the QI space is |types|×7×24-bounded so the class
    * frame is tiny; the band rollup and the 1-row total broadcast are
    * free. Exact-count distinct per class is the point of the audit
    * (a sketch that UNDERCOUNTS users would overstate anonymity);
    * shares are exact int/int divisions (rule 3).
    */
  def kAnonymity(s: SparkSession, dir: String): DataFrame = {
    val classes = Tables.events(s, dir)
      .select(col("event_type"), weekday(col("ts")).as("dow"),
        hour(col("ts")).as("hod"), col("user_id"))
      .groupBy("event_type", "dow", "hod")
      .agg(countDistinct("user_id").as("k_users"),
        count(lit(1)).as("n_events"))
    val banded = classes
      .withColumn("k_band",
        when(col("k_users") === 1, "1 (unique)")
          .when(col("k_users") <= 5, "2-5")
          .when(col("k_users") <= 20, "6-20")
          .otherwise("21+"))
      .groupBy("k_band")
      .agg(count(lit(1)).as("n_classes"), sum("n_events").as("n_events"),
        min("k_users").as("min_k"))
    val tot = banded.agg(sum("n_events").as("te"))
    banded.crossJoin(broadcast(tot))
      .select(col("k_band"), col("n_classes"), col("n_events"),
        (col("n_events") * lit(1.0) / col("te")).as("event_share"))
      .orderBy("min_k")
      .select("k_band", "n_classes", "n_events", "event_share")
  }

  private val kAnonymitySql =
    """WITH c AS (
      |  SELECT event_type, (dayofweek(ts) + 6) % 7 AS dow, hour(ts) AS hod,
      |    count(DISTINCT user_id) AS k_users, count(*) AS n_events
      |  FROM events GROUP BY event_type, dow, hod),
      |b AS (SELECT CASE WHEN k_users = 1 THEN '1 (unique)'
      |             WHEN k_users <= 5 THEN '2-5'
      |             WHEN k_users <= 20 THEN '6-20'
      |             ELSE '21+' END AS k_band,
      |        count(*) AS n_classes,
      |        CAST(sum(n_events) AS BIGINT) AS n_events,
      |        min(k_users) AS min_k
      |      FROM c GROUP BY k_band),
      |t AS (SELECT sum(n_events) AS te FROM b)
      |SELECT k_band, n_classes, n_events,
      |  n_events * 1.0 / te AS event_share
      |FROM b, t ORDER BY min_k""".stripMargin

  /** Burstiness (Fano factor) of each type's hourly arrival process —
    * the dispersion diagnostic that decides which MODEL the monitoring
    * queries should assume: F = Var(n)/E(n) over the CALENDAR-DENSE
    * hourly counts ([[hourlyDenseCounts]] — silent hours are real zeros
    * and excluding them would bias F down exactly when traffic is
    * burstiest). A Poisson process gives F ≈ 1, so t48's 4·√μ decision
    * band is calibrated; F ≫ 1 means overdispersion (bursts/batching —
    * widen the band or switch to a negative-binomial model); F < 1
    * means regularity (rate limiting upstream).
    *
    * Float discipline: with H hours and S = Σn, Q = Σn² (exact ints),
    * population Var/mean = (H·Q − S²)/(H·S) — ONE division of exact
    * integers (rule 3, emitted unrounded); mean_rate = S/H likewise.
    * Products stay far under int64 at any realistic hour count
    * (H·Q ≈ 10⁹ at sf0.1). Scale shape: the fact table reduces once to
    * the hours-sized spine; everything after is a |types|-row aggregate.
    */
  def fanoBurstiness(s: SparkSession, dir: String): DataFrame =
    hourlyDenseCounts(s, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_hours"), sum("n").as("s"),
        sum(col("n") * col("n")).as("q"))
      .select(col("event_type"), col("n_hours"),
        (col("s") * lit(1.0) / col("n_hours")).as("mean_rate"),
        ((col("n_hours") * col("q") - col("s") * col("s")) * lit(1.0) /
          (col("n_hours") * col("s"))).as("fano"))
      .orderBy("event_type")

  private val fanoBurstinessSql =
    s"""WITH $hourlyDenseSqlCte,
       |a AS (SELECT event_type, count(*) AS n_hours,
       |        CAST(sum(n) AS BIGINT) AS s, CAST(sum(n * n) AS BIGINT) AS q
       |      FROM hourly GROUP BY event_type)
       |SELECT event_type, n_hours,
       |  s * 1.0 / n_hours AS mean_rate,
       |  (n_hours * q - s * s) * 1.0 / (n_hours * s) AS fano
       |FROM a ORDER BY event_type""".stripMargin

  /** Dominant-period detection — per event type, the single-frequency
    * DFT power (Goertzel 1958's statistic, evaluated directly) of the
    * demeaned hourly series at the candidate periods an hourly business
    * series can plausibly carry (6/12/24 h), normalized by total
    * variance × series length so scores compare across types and
    * periods. This closes the model-selection loop t49/t50 open: the
    * ACF says "SOME cycle exists" (a lag-24 peak also fires at 12's
    * harmonics), t50 scores ONLY hour-of-day — this ranks the candidate
    * periods directly and names the winner, the input t41's seasonal
    * baseline and t48's μ actually need. A pure period-p sinusoid
    * scores 0.25 at p and ≈0 elsewhere; white noise scores ≈1/n_hours
    * everywhere.
    *
    * Scale/float shape: the fact table reduces ONCE to the
    * calendar-dense hours-sized series ([[hourlyDenseCounts]] — on a
    * gapped series the phase index t would misalign every angle); one
    * type-partitioned window assigns t; the six trig aggregates ride
    * ONE map-side-combined groupBy. Angles are computed from the
    * REDUCED argument 2π(t mod p)/p — t mod p is exact integer math on
    * both engines, keeping libm inputs small and identical, so the
    * only cross-engine noise is sum reassociation (~1e-12 against the
    * 5e-7 rounding boundary — t49's measured-noise argument). The
    * winner flag ranks by the ROUNDED score (ties to the shortest
    * period), so both engines pick identically.
    */
  def dominantPeriod(s: SparkSession, dir: String): DataFrame = {
    val periods = Seq(6, 12, 24)
    val hourly = hourlyDenseCounts(s, dir)
    val mu = hourly.groupBy(col("event_type").as("mt"))
      .agg((sum("n") * lit(1.0) / count(lit(1))).as("mu"))
    val w = Window.partitionBy("event_type").orderBy("h")
    val dd = hourly.join(broadcast(mu), col("event_type") === col("mt"))
      .withColumn("t", row_number().over(w) - 1)
      .withColumn("d", col("n") - col("mu"))
    val aggs = count(lit(1)).as("nh") +: sum(col("d") * col("d")).as("den") +:
      periods.flatMap(p => Seq(
        sum(expr(s"d * cos(2 * pi() * CAST(t % $p AS DOUBLE) / $p)")).as(s"c$p"),
        sum(expr(s"d * sin(2 * pi() * CAST(t % $p AS DOUBLE) / $p)")).as(s"s$p")))
    val byType = dd.groupBy("event_type").agg(aggs.head, aggs.tail: _*)
    val stackArgs = periods.map(p =>
      s"$p, CASE WHEN den > 0 THEN round((c$p * c$p + s$p * s$p) / (den * nh), 6) ELSE 0.0D END")
      .mkString(", ")
    byType.selectExpr("event_type", "nh AS n_hours",
        s"stack(${periods.size}, $stackArgs) AS (period_h, score)")
      .withColumn("dominant", row_number().over(
        Window.partitionBy("event_type")
          .orderBy(desc("score"), col("period_h"))) === 1)
      .select("event_type", "period_h", "n_hours", "score", "dominant")
      .orderBy("event_type", "period_h")
  }

  private val dominantPeriodSql = {
    val periods = Seq(6, 12, 24)
    val trigCols = periods.map(p =>
      s"sum(d * cos(2 * pi() * CAST(t % $p AS DOUBLE) / $p)) AS c$p, " +
        s"sum(d * sin(2 * pi() * CAST(t % $p AS DOUBLE) / $p)) AS s$p")
      .mkString(", ")
    val rows = periods.map(p =>
      s"SELECT event_type, $p AS period_h, nh AS n_hours, CASE WHEN den > 0 " +
        s"THEN round((c$p * c$p + s$p * s$p) / (den * nh), 6) ELSE 0.0 END AS score FROM a")
      .mkString("\n|", "\n|UNION ALL ", "")
    s"""WITH $hourlyDenseSqlCte,
       |m AS (SELECT event_type, sum(n) * 1.0 / count(*) AS mu
       |      FROM hourly GROUP BY event_type),
       |dv AS (SELECT event_type, n - mu AS d,
       |         row_number() OVER (PARTITION BY event_type ORDER BY h) - 1 AS t
       |       FROM hourly JOIN m USING (event_type)),
       |a AS (SELECT event_type, count(*) AS nh, sum(d * d) AS den, $trigCols
       |      FROM dv GROUP BY event_type),
       |sc AS ($rows)
       |SELECT event_type, period_h, n_hours, score,
       |  row_number() OVER (PARTITION BY event_type
       |    ORDER BY score DESC, period_h) = 1 AS dominant
       |FROM sc ORDER BY event_type, period_h""".stripMargin
  }

  /** Drift-alarm EPISODES — the alert-fatigue layer over t48: a CUSUM
    * that stays over its band for 30 consecutive hours is ONE incident,
    * not 30 pages, so the monitor's deliverable is the episode
    * (start, end, duration, peak severity), the unit an on-call rota
    * actually consumes (t31 does this for point anomalies; drift flags
    * are stickier and need it more). Consecutive flagged hours coalesce
    * by the gaps-and-islands identity on the DENSE series — island id =
    * hour index − rank among flagged hours, constant exactly while
    * flagged hours are calendar-consecutive (the dense spine is what
    * makes "consecutive" mean calendar hours, not observed rows).
    *
    * Scale/float shape: rides [[cusumDrift]]'s hours-sized frame (one
    * more pair of type-partitioned windows + one episode-sized
    * groupBy); cusum values are bit-identical cross-engine (t48's
    * integer-prefix-sum discipline), so max-severity needs no display
    * rounding, and episode boundaries are integer hour arithmetic.
    */
  def driftEpisodes(s: SparkSession, dir: String): DataFrame = {
    val flags = cusumDrift(s, dir)
      .select(col("event_type"), col("h_us"), col("cusum_up"),
        col("up_drift"))
    val w = Window.partitionBy("event_type").orderBy("h_us")
    flags
      .withColumn("t", row_number().over(w))
      .filter(col("up_drift"))
      .withColumn("island",
        col("t") - row_number().over(w))
      .groupBy(col("event_type"), col("island"))
      .agg(min("h_us").as("start_us"), max("h_us").as("end_us"),
        count(lit(1)).as("n_hours"), max("cusum_up").as("peak_cusum"))
      .select(col("event_type"), col("start_us"), col("end_us"),
        col("n_hours"), col("peak_cusum"))
      .orderBy("event_type", "start_us")
  }

  private val driftEpisodesSql =
    s"""WITH $hourlyDenseSqlCte,
      |hd AS (SELECT event_type, h, n AS n_events FROM hourly),
      |m AS (SELECT event_type, sum(n_events) * 1.0 / count(*) AS mu
      |      FROM hd GROUP BY event_type),
      |pp AS (SELECT event_type, h, mu,
      |        CAST(sum(n_events) OVER wr AS DOUBLE)
      |          - row_number() OVER wo * mu AS p,
      |        row_number() OVER wo AS t
      |      FROM hd JOIN m USING (event_type)
      |      WINDOW wo AS (PARTITION BY event_type ORDER BY h),
      |             wr AS (PARTITION BY event_type ORDER BY h
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |cu AS (SELECT event_type, h, t,
      |         p - least(min(p) OVER wr, 0.0) AS cusum_up,
      |         p - least(min(p) OVER wr, 0.0) > 4.0 * sqrt(mu) AS up_drift
      |       FROM pp
      |       WINDOW wr AS (PARTITION BY event_type ORDER BY h
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |fl AS (SELECT event_type, h, t, cusum_up,
      |         t - row_number() OVER (PARTITION BY event_type ORDER BY h)
      |           AS island
      |       FROM cu WHERE up_drift)
      |SELECT event_type, epoch_us(min(h)) AS start_us,
      |  epoch_us(max(h)) AS end_us, count(*) AS n_hours,
      |  max(cusum_up) AS peak_cusum
      |FROM fl GROUP BY event_type, island
      |ORDER BY event_type, start_us""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("t01_hourly_value_ma", hourlyValueMa, Some(hourlyValueMaSql)),
    QueryDef("t02_hour_baseline_zscore", hourBaselineZscore, Some(hourBaselineZscoreSql)),
    QueryDef("t03_latest_snapshot", latestSnapshot, Some(latestSnapshotSql)),
    QueryDef("t04_risk_share_by_type", riskShareByType, Some(riskShareByTypeSql)),
    QueryDef("t05_weekday_rollup", weekdayRollup, Some(weekdayRollupSql)),
    QueryDef("t06_json_props_stats", jsonPropsStats, Some(jsonPropsStatsSql)),
    QueryDef("t07_tumbling_hourly", tumblingHourly, Some(tumblingHourlySql)),
    QueryDef("t08_sliding_two_hour", slidingTwoHour, Some(slidingTwoHourSql)),
    QueryDef("t09_top_anomalous_users", topAnomalousUsers, Some(topAnomalousUsersSql)),
    QueryDef("t10_type_vs_global_hourly", typeVsGlobalHourly, Some(typeVsGlobalHourlySql)),
    QueryDef("t11_data_contract_audit", dataContractAudit, Some(dataContractAuditSql)),
    QueryDef("t12_user_sessions", userSessions, Some(userSessionsSql)),
    QueryDef("t13_asof_purchase_before_error", asofPurchaseBeforeError, Some(asofPurchaseBeforeErrorSql)),
    QueryDef("t14_value_tier_range_join", valueTierRangeJoin, Some(valueTierRangeJoinSql)),
    QueryDef("t15_salted_distinct_users", saltedDistinctUsers, Some(saltedDistinctUsersSql)),
    QueryDef("t16_purchases_near_errors", purchasesNearErrors, Some(purchasesNearErrorsSql)),
    QueryDef("t17_trailing_hour_sum", trailingHourSum, Some(trailingHourSumSql)),
    QueryDef("t18_cumulative_distinct_users", cumulativeDistinctUsers,
      Some(cumulativeDistinctUsersSql)),
    QueryDef("t19_histogram_quantiles", histogramQuantiles,
      Some(histogramQuantilesSql)),
    QueryDef("t20_cohort_retention", cohortRetention, Some(cohortRetentionSql)),
    QueryDef("t21_conversion_funnel", conversionFunnel, Some(conversionFunnelSql)),
    QueryDef("t22_kmv_distinct_users", kmvDistinctUsers,
      Some(kmvDistinctUsersSql)),
    QueryDef("t23_state_intervals", stateIntervals, Some(stateIntervalsSql)),
    QueryDef("t24_time_weighted_value", timeWeightedValue, Some(timeWeightedValueSql)),
    QueryDef("t25_time_to_conversion", timeToConversion, Some(timeToConversionSql)),
    QueryDef("t26_hourly_ohlc", hourlyOhlc, Some(hourlyOhlcSql)),
    QueryDef("t27_missing_hours", missingHours, Some(missingHoursSql)),
    QueryDef("t28_per_type_trend", perTypeTrend, Some(perTypeTrendSql)),
    QueryDef("t29_type_transitions", typeTransitions, Some(typeTransitionsSql)),
    QueryDef("t30_dau_wau_stickiness", dauWauStickiness, Some(dauWauStickinessSql)),
    QueryDef("t31_anomaly_incidents", anomalyIncidents, Some(anomalyIncidentsSql)),
    QueryDef("t32_type_pagerank", typePagerank, Some(typePagerankSql)),
    QueryDef("t33_concurrent_sessions", concurrentSessions,
      Some(concurrentSessionsSql)),
    QueryDef("t34_session_paths", sessionPaths, Some(sessionPathsSql)),
    QueryDef("t35_winsorized_stats", winsorizedStats, Some(winsorizedStatsSql)),
    QueryDef("t36_cdc_snapshot", cdcSnapshot, Some(cdcSnapshotSql)),
    QueryDef("t37_session_stats", sessionStats, Some(sessionStatsSql)),
    QueryDef("t38_ewma_hourly", ewmaHourly, Some(ewmaHourlySql)),
    QueryDef("t39_mad_by_type", madByType, Some(madByTypeSql)),
    QueryDef("t40_snapshot_diff", snapshotDiff, Some(snapshotDiffSql)),
    QueryDef("t41_seasonal_baseline", seasonalBaseline, Some(seasonalBaselineSql)),
    QueryDef("t42_resample_interpolate", resampleInterpolate,
      Some(resampleInterpolateSql)),
    QueryDef("t43_burstiest_users", burstiestUsers, Some(burstiestUsersSql)),
    QueryDef("t44_last_touch_attribution", lastTouchAttribution, Some(lastTouchAttributionSql)),
    QueryDef("t45_incremental_rollup", incrementalRollup, Some(incrementalRollupSql)),
    QueryDef("t46_purchases_near_errors_outer", purchasesNearErrorsOuter,
      Some(purchasesNearErrorsOuterSql)),
    QueryDef("t47_purchases_near_errors_full", purchasesNearErrorsFullOuter,
      Some(purchasesNearErrorsFullOuterSql)),
    QueryDef("t48_cusum_drift", cusumDrift, Some(cusumDriftSql)),
    QueryDef("t49_acf_hourly", acfHourly, Some(acfHourlySql)),
    QueryDef("t50_seasonal_strength", seasonalStrength,
      Some(seasonalStrengthSql)),
    QueryDef("t51_changepoint", changepoint, Some(changepointSql)),
    QueryDef("t52_k_anonymity", kAnonymity, Some(kAnonymitySql)),
    QueryDef("t53_session_type_pmi", sessionTypePmi, Some(sessionTypePmiSql)),
    QueryDef("t54_fano_burstiness", fanoBurstiness, Some(fanoBurstinessSql)),
    QueryDef("t55_dominant_period", dominantPeriod, Some(dominantPeriodSql)),
    QueryDef("t56_drift_episodes", driftEpisodes, Some(driftEpisodesSql)),
  )
}
