package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operator inventory over the star-schema testdata —
  * re-expresses SURVEY.md §2.1-§2.7 Spark-first.
  *
  * Each operator row from the survey maps to a declarative DataFrame plan so
  * Catalyst gets predicate pushdown, column pruning, partial aggregation and
  * join-strategy selection for free. Scale posture (100 TB):
  *  - dimension tables (region/nation/customer at its fact-relative size)
  *    join via `broadcast()` hints — no shuffle of the fact side;
  *  - fact-fact joins shuffle on the join key once and reuse that exchange;
  *  - top-k is orderBy+limit → planned as TakeOrderedAndProject (no global
  *    sort materialization);
  *  - scalar thresholds (min/max/percentile) are tiny aggregates cross-joined
  *    back via broadcast, never a `Window.partitionBy()` over the whole
  *    dataset (which would single-partition the data).
  *
  * Reference provenance is cited per query (sa = streamlit_app.py,
  * ing = src/ingest/spark_ingest.py in /root/reference).
  */
object Relational {

  /** TPC-H Q1-shaped pricing summary: scan → filter → hash agg.
    * Survey ops: S2 (parquet scan), P1 (cleansing filter), A1/A3 (aggs).
    * Reference: sa:276-303 KPI scalars + sa:322 hourly rollup.
    */
  def pricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1999-12-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      // Cross-engine determinism policy (see QueryDef): round(sum, k) where k
      // = the data's true decimal scale is an EXACT restore (never a rounding
      // tie); averages are that exact sum divided by the exact count, left
      // unrounded (identical input bits + identical op → identical output).
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("sum_disc_price"),
        (sum("l_quantity") / count(lit(1))).as("avg_qty"),
        (round(sum("l_extendedprice"), 2) / count(lit(1))).as("avg_price"),
        (round(sum("l_discount"), 2) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val pricingSummarySql =
    """SELECT l_returnflag, l_linestatus,
      | round(sum(l_quantity),2) AS sum_qty,
      | round(sum(l_extendedprice),2) AS sum_base_price,
      | round(sum(l_extendedprice*(1-l_discount)),4) AS sum_disc_price,
      | sum(l_quantity) / count(*) AS avg_qty,
      | round(sum(l_extendedprice),2) / count(*) AS avg_price,
      | round(sum(l_discount),2) / count(*) AS avg_disc,
      | count(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-12-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Projection + conjunctive filter, row-level arithmetic; filters/columns
    * push into the parquet scan (visible as PushedFilters in explain).
    * Survey ops: P1/P6 (predicates), P2 (derived projection), F7 (casts).
    */
  def filterProject(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_quantity") >= 30 && col("l_discount") >= 0.05)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        // raw IEEE product, no rounding: the same double multiply is
        // bit-identical in any engine, while round() at half-way points is not
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net_price"),
        to_date(col("l_shipdate")).as("ship_date"))
      .orderBy("l_orderkey", "l_linenumber")

  private val filterProjectSql =
    """SELECT l_orderkey, l_linenumber,
      | l_extendedprice*(1-l_discount) AS net_price,
      | CAST(l_shipdate AS DATE) AS ship_date
      |FROM lineitem WHERE l_quantity >= 30 AND l_discount >= 0.05
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Fact-fact shuffle join (lineitem⋈orders on orderkey) + broadcast dim
    * join (customer) + agg + top-k. Survey ops: J1/J5, A1, T2/T5.
    * At 100 TB the lineitem⋈orders exchange hashes on the join key once;
    * customer is broadcast so the fact side never reshuffles for it.
    */
  def topRevenueCustomers(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o  = Tables.orders(s, dir)
    val c  = Tables.customer(s, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_name")
      .agg(
        // price*(1-disc) has true scale 4 → round(sum,4) is an exact restore
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"),
        countDistinct("o_orderkey").as("n_orders"))
      .orderBy(desc("revenue"), col("c_custkey"))
      .limit(10)
  }

  private val topRevenueCustomersSql =
    """SELECT c_custkey, c_name,
      | round(sum(l_extendedprice*(1-l_discount)),4) AS revenue,
      | count(DISTINCT o_orderkey) AS n_orders
      |FROM lineitem JOIN orders ON l_orderkey=o_orderkey
      |JOIN customer ON o_custkey=c_custkey
      |GROUP BY c_custkey, c_name ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin

  /** Broadcast-chain snowflake join: supplier ⋈ nation ⋈ region, rollup per
    * region. Survey ops: J1 (equi-join chain), A7 (group means), S8 (dim
    * scan). Both dims are broadcast — zero shuffles on the supplier side.
    */
  def regionSupplierRollup(s: SparkSession, dir: String): DataFrame = {
    val sup = Tables.supplier(s, dir)
    val nat = Tables.nation(s, dir)
    val reg = Tables.region(s, dir)
    sup.join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(
        count(lit(1)).as("n_suppliers"),
        (round(sum("s_acctbal"), 2) / count(lit(1))).as("avg_acctbal"),
        round(sum("s_acctbal"), 2).as("total_acctbal"))
      .orderBy("r_name")
  }

  private val regionSupplierRollupSql =
    """SELECT r_name, count(*) AS n_suppliers,
      | round(sum(s_acctbal),2) / count(*) AS avg_acctbal,
      | round(sum(s_acctbal),2) AS total_acctbal
      |FROM supplier JOIN nation ON s_nationkey=n_nationkey
      |JOIN region ON n_regionkey=r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** NPS-proxy conditional aggregate: 100·(avg(promoter) − avg(detractor)).
    * Survey ops: A2 (NPS proxy), P6 (promoter/detractor predicates).
    * Reference: sa:257-261, 288-303.
    */
  def segmentNps(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .groupBy("c_mktsegment")
      // promoter/detractor counts are exact → the whole NPS expression is
      // bit-deterministic with no rounding needed
      .agg(
        (sum(when(col("c_acctbal") >= 7000, 1.0).otherwise(0.0)) * 100 / count(lit(1)) -
         sum(when(col("c_acctbal") < 1000, 1.0).otherwise(0.0)) * 100 / count(lit(1))).as("nps"),
        count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")

  private val segmentNpsSql =
    """SELECT c_mktsegment,
      | sum(CASE WHEN c_acctbal >= 7000 THEN 1.0 ELSE 0.0 END)*100 / count(*)
      |      - sum(CASE WHEN c_acctbal < 1000 THEN 1.0 ELSE 0.0 END)*100 / count(*) AS nps,
      | count(*) AS n_customers
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Exact interpolating percentiles + sample stddev per group. Spark's
    * exact `percentile` (linear interpolation) = pandas quantile = DuckDB
    * quantile_cont — pinned per SURVEY §7.5.5. NOT approx_percentile (that
    * would break the oracle). Survey ops: A1/A6/A11, A4 (stddev_samp).
    */
  def groupPercentiles(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_extendedprice, 0.5)"), 6).as("p50_price"),
        round(expr("percentile(l_extendedprice, 0.95)"), 6).as("p95_price"),
        round(stddev_samp(col("l_extendedprice")), 6).as("sd_price"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  private val groupPercentilesSql =
    """SELECT l_returnflag,
      | round(quantile_cont(l_extendedprice, 0.5),6) AS p50_price,
      | round(quantile_cont(l_extendedprice, 0.95),6) AS p95_price,
      | round(stddev_samp(l_extendedprice),6) AS sd_price,
      | count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Exact count-distinct per group (A9). Exact, not approx_count_distinct —
    * the reference's nunique is exact; approx is exposed separately for the
    * 100 TB path where a 2% error is acceptable.
    */
  def statusCountDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderstatus")
      .agg(
        countDistinct("o_custkey").as("n_customers"),
        count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("total_price"))
      .orderBy("o_orderstatus")

  private val statusCountDistinctSql =
    """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_customers,
      | count(*) AS n_orders, round(sum(o_totalprice),2) AS total_price
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Dedup-keep-latest via row_number window (Survey W5; reference
    * sa:971-975 drop_duplicates keep="last"). Deterministic tie-break on
    * o_orderkey per SURVEY §7.5.7.
    */
  def latestOrderPerCustomer(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("o_custkey"),
        col("o_orderkey").as("latest_orderkey"),
        to_date(col("o_orderdate")).as("latest_date"))
      .orderBy("o_custkey")
  }

  private val latestOrderPerCustomerSql =
    """SELECT o_custkey, o_orderkey AS latest_orderkey, CAST(o_orderdate AS DATE) AS latest_date
      |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |      FROM orders) WHERE rn = 1 ORDER BY o_custkey""".stripMargin

  /** Trailing 3-row rolling mean per key (Survey W2; reference sa:697-700
    * per-cell rolling(3, min_periods=1)). Spark's frame naturally shrinks at
    * partition edges = pandas min_periods=1.
    */
  def rollingAvgOrderPrice(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    // Spelled as an explicit lag-composed 3-term mean rather than a sliding
    // frame avg: sliding-frame add/remove accumulates engine-specific float
    // error, while this exact expression over raw inputs is bit-identical.
    val p1 = lag("o_totalprice", 1).over(w)
    val p2 = lag("o_totalprice", 2).over(w)
    Tables.orders(s, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        ((coalesce(p2, lit(0.0)) + coalesce(p1, lit(0.0)) + col("o_totalprice")) /
          (p2.isNotNull.cast("int") + p1.isNotNull.cast("int") + lit(1))).as("rolling_avg_price"))
      .orderBy("o_custkey", "o_orderkey")
  }

  private val rollingAvgOrderPriceSql =
    """SELECT o_custkey, o_orderkey,
      | (coalesce(lag(o_totalprice, 2) OVER w, 0.0) + coalesce(lag(o_totalprice, 1) OVER w, 0.0) + o_totalprice)
      |  / (CAST(lag(o_totalprice, 2) OVER w IS NOT NULL AS INT)
      |     + CAST(lag(o_totalprice, 1) OVER w IS NOT NULL AS INT) + 1) AS rolling_avg_price
      |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Lag-diff per key with fillna(0) (Survey W4/F11; reference sa:702
    * `c.diff().fillna(0)`).
    */
  def orderPriceDelta(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        coalesce(col("o_totalprice") - lag("o_totalprice", 1).over(w), lit(0.0))
          .as("price_delta"))
      .orderBy("o_custkey", "o_orderkey")
  }

  private val orderPriceDeltaSql =
    """SELECT o_custkey, o_orderkey,
      | coalesce(o_totalprice - lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 0.0) AS price_delta
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Semi/anti-join: customers with vs without an URGENT order, per segment.
    * Spark plans left_semi/left_anti (no row multiplication, no payload
    * shuffle of the right side beyond the key). Survey: §2.3 note (Spark
    * supplies semi/anti beyond the reference's merges).
    */
  def urgentSemiAnti(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val urgent = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    val withU = c.join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_with_urgent"))
    val withoutU = c.join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_without_urgent"))
    withU.join(withoutU, Seq("c_mktsegment"), "full_outer")
      .na.fill(0L, Seq("n_with_urgent", "n_without_urgent"))
      .orderBy("c_mktsegment")
  }

  private val urgentSemiAntiSql =
    """WITH u AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |SELECT c_mktsegment,
      | count(u.o_custkey) AS n_with_urgent,
      | count(*) - count(u.o_custkey) AS n_without_urgent
      |FROM customer LEFT JOIN u ON c_custkey = u.o_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Hierarchical ROLLUP grouping sets (status × priority). The reference
    * has no grouping sets; Catalyst supplies them free (SURVEY §2.4 note).
    */
  def statusPriorityRollup(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total_price"),
        // grouping() (not coalesce) sentinels the subtotal rows: a genuine
        // NULL data value must stay distinguishable from the rollup's ALL.
        grouping(col("o_orderstatus")).as("g_s"),
        grouping(col("o_orderpriority")).as("g_p"))
      .select(
        when(col("g_s") === 1, lit("ALL")).otherwise(col("o_orderstatus")).as("status"),
        when(col("g_p") === 1, lit("ALL")).otherwise(col("o_orderpriority")).as("priority"),
        col("n"), col("total_price"))
      .orderBy("status", "priority")

  private val statusPriorityRollupSql =
    """SELECT
      | CASE WHEN GROUPING(o_orderstatus)=1 THEN 'ALL' ELSE o_orderstatus END AS status,
      | CASE WHEN GROUPING(o_orderpriority)=1 THEN 'ALL' ELSE o_orderpriority END AS priority,
      | count(*) AS n, round(sum(o_totalprice),2) AS total_price
      |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  /** Min-max rescale against global scalars (Survey A13/F10; reference
    * sa:996-1002 map sizing). Scalars come from a tiny agg broadcast back —
    * NOT a `Window` over the full data (that would single-partition 100 TB).
    */
  def acctbalRescaled(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val stats = c.agg(min("c_acctbal").as("mn"), max("c_acctbal").as("mx"))
    c.crossJoin(broadcast(stats))
      .select(
        col("c_custkey"),
        ((col("c_acctbal") - col("mn")) / (col("mx") - col("mn"))).as("acctbal_scaled"))
      .orderBy("c_custkey")
  }

  private val acctbalRescaledSql =
    """SELECT c_custkey,
      | (c_acctbal - (SELECT min(c_acctbal) FROM customer))
      |     / ((SELECT max(c_acctbal) FROM customer) - (SELECT min(c_acctbal) FROM customer)) AS acctbal_scaled
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** Top-k with deterministic tie-break (Survey T1-T5; SURVEY §7.5.7).
    * Plans as TakeOrderedAndProject — a per-partition heap + driver merge,
    * no global sort.
    */
  def topOrders(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        to_date(col("o_orderdate")).as("order_date"))
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .limit(20)

  private val topOrdersSql =
    """SELECT o_orderkey, o_custkey, o_totalprice, CAST(o_orderdate AS DATE) AS order_date
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  /** Union + unpivot (Survey U1/U3; reference sa:425-430 melt for the
    * comparison chart). Wide per-status aggregates → long (status, metric,
    * value) via Spark's native unpivot (Spark ≥3.4).
    */
  def statusUnpivot(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderstatus")
      .agg(
        (round(sum("o_totalprice"), 2) / count(lit(1))).as("avg_price"),
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50_price"))
      .unpivot(
        Array(col("o_orderstatus")),
        Array(col("avg_price"), col("p50_price")),
        "metric", "value")
      .orderBy("o_orderstatus", "metric")

  private val statusUnpivotSql =
    """WITH w AS (
      |  SELECT o_orderstatus, round(sum(o_totalprice),2) / count(*) AS avg_price,
      |         round(quantile_cont(o_totalprice,0.5),4) AS p50_price
      |  FROM orders GROUP BY o_orderstatus)
      |SELECT o_orderstatus, 'avg_price' AS metric, avg_price AS value FROM w
      |UNION ALL
      |SELECT o_orderstatus, 'p50_price' AS metric, p50_price AS value FROM w
      |ORDER BY o_orderstatus, metric""".stripMargin

  /** INTERSECT / EXCEPT set operations (absent from the reference; Catalyst
    * built-ins — SURVEY §2.7 note). Customers with both F- and O-status
    * orders vs F-only, as tagged counts.
    */
  def statusSetOps(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    val op = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
    val both = f.intersect(op).agg(count(lit(1)).as("n")).withColumn("tag", lit("both"))
    val fOnly = f.except(op).agg(count(lit(1)).as("n")).withColumn("tag", lit("f_only"))
    both.unionByName(fOnly).select("tag", "n").orderBy("tag")
  }

  private val statusSetOpsSql =
    """WITH f AS (SELECT o_custkey FROM orders WHERE o_orderstatus='F'),
      |o AS (SELECT o_custkey FROM orders WHERE o_orderstatus='O')
      |SELECT 'both' AS tag, count(*) AS n FROM (SELECT * FROM f INTERSECT SELECT * FROM o)
      |UNION ALL
      |SELECT 'f_only' AS tag, count(*) AS n FROM (SELECT * FROM f EXCEPT SELECT * FROM o)
      |ORDER BY tag""".stripMargin

  /** CUBE grouping sets over (status, priority) — all 4 grouping
    * combinations, keys sentineled with 'ALL'.
    */
  def statusPriorityCube(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total_price"),
        grouping(col("o_orderstatus")).as("g_s"),
        grouping(col("o_orderpriority")).as("g_p"))
      .select(
        when(col("g_s") === 1, lit("ALL")).otherwise(col("o_orderstatus")).as("status"),
        when(col("g_p") === 1, lit("ALL")).otherwise(col("o_orderpriority")).as("priority"),
        col("n"), col("total_price"))
      .orderBy("status", "priority")

  private val statusPriorityCubeSql =
    """SELECT
      | CASE WHEN GROUPING(o_orderstatus)=1 THEN 'ALL' ELSE o_orderstatus END AS status,
      | CASE WHEN GROUPING(o_orderpriority)=1 THEN 'ALL' ELSE o_orderpriority END AS priority,
      | count(*) AS n, round(sum(o_totalprice),2) AS total_price
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  /** Explicit GROUPING SETS ((status), (priority), ()) — the third member
    * of the grouping-variants family beside rollup (q12) and cube (q17),
    * via Spark 4's native `groupingSets` API. One hash aggregation with
    * an Expand node — each input row fans out only to its 3 declared
    * sets, cheaper than cube's 4 at scale.
    */
  def statusPriorityGroupingSets(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total_price"),
        grouping(col("o_orderstatus")).as("g_s"),
        grouping(col("o_orderpriority")).as("g_p"))
      .select(
        when(col("g_s") === 1, lit("ALL")).otherwise(col("o_orderstatus")).as("status"),
        when(col("g_p") === 1, lit("ALL")).otherwise(col("o_orderpriority")).as("priority"),
        col("n"), col("total_price"))
      .orderBy("status", "priority")

  private val statusPriorityGroupingSetsSql =
    """SELECT
      | CASE WHEN GROUPING(o_orderstatus)=1 THEN 'ALL' ELSE o_orderstatus END AS status,
      | CASE WHEN GROUPING(o_orderpriority)=1 THEN 'ALL' ELSE o_orderpriority END AS priority,
      | count(*) AS n, round(sum(o_totalprice),2) AS total_price
      |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY status, priority""".stripMargin

  /** Top-3 orders per customer via the bounded-state TopKAgg Aggregator
    * (graft.functions.TopK) — per-group top-k WITHOUT the window
    * formulation's full per-group shuffle+sort: map-side partial heaps
    * carry ≤ k rows per group per partition. The oracle spells the same
    * semantics as row_number() (value desc, id asc tie-break).
    */
  def topOrdersPerCustomer(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val topk = udaf(new graft.functions.TopKAgg(3),
      ExpressionEncoder[graft.functions.Ranked]())
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(topk(col("o_totalprice"), col("o_orderkey")).as("top"))
      .selectExpr("o_custkey", "posexplode(top) AS (pos, r)")
      .selectExpr("o_custkey", "CAST(pos + 1 AS INT) AS rnk",
        "r.id AS o_orderkey", "r.value AS o_totalprice")
      .orderBy("o_custkey", "rnk")
  }

  private val topOrdersPerCustomerSql =
    """SELECT o_custkey, CAST(rnk AS INT) AS rnk, o_orderkey, o_totalprice
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |        row_number() OVER (PARTITION BY o_custkey
      |          ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      |      FROM orders)
      |WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin

  /** PIVOT: order counts + summed price per status, pivoted wide by
    * priority. Spark's `pivot` with an explicit value list (no extra
    * distinct-values job — the list IS the contract at scale) lowers to
    * conditional aggregation, which is exactly what the SQL oracle spells
    * out; one hash aggregation either way.
    */
  def statusPivot(s: SparkSession, dir: String): DataFrame = {
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus").as("status"))
      .pivot("o_orderpriority", prios)
      .agg(round(sum("o_totalprice"), 2))
      .select(col("status") +:
        prios.zipWithIndex.map { case (p, i) => col(p).as(s"total_${i + 1}") }: _*)
      .orderBy("status")
  }

  private val statusPivotSql =
    """SELECT o_orderstatus AS status,
      | round(sum(CASE WHEN o_orderpriority='1-URGENT' THEN o_totalprice END),2) AS total_1,
      | round(sum(CASE WHEN o_orderpriority='2-HIGH' THEN o_totalprice END),2) AS total_2,
      | round(sum(CASE WHEN o_orderpriority='3-MEDIUM' THEN o_totalprice END),2) AS total_3,
      | round(sum(CASE WHEN o_orderpriority='4-NOT SPECIFIED' THEN o_totalprice END),2) AS total_4,
      | round(sum(CASE WHEN o_orderpriority='5-LOW' THEN o_totalprice END),2) AS total_5
      |FROM orders GROUP BY o_orderstatus ORDER BY status""".stripMargin

  /** Ranking-window family (SURVEY §2.5 note: absent from the reference,
    * supplied natively): rank / dense_rank / cume_dist over price within
    * status, ntile(4) over a UNIQUE ordering. Determinism: rank,
    * dense_rank and cume_dist depend only on the sort-key multiset, so
    * price ties are safe; ntile depends on row order within ties, so its
    * window adds the o_orderkey tiebreak. One shuffle (by status), one
    * sort, all four functions in a single Window exec.
    */
  def orderPriceRanks(s: SparkSession, dir: String): DataFrame = {
    val byPrice = Window.partitionBy("o_orderstatus").orderBy(col("o_totalprice").desc)
    val unique = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        rank().over(byPrice).as("rnk"),
        dense_rank().over(byPrice).as("drnk"),
        cume_dist().over(byPrice).as("cd"),
        ntile(4).over(unique).as("quartile"))
      .filter(col("rnk") <= 100)
      .orderBy("o_orderstatus", "rnk", "o_orderkey")
  }

  private val orderPriceRanksSql =
    """SELECT * FROM (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice,
      |   rank()       OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS rnk,
      |   dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS drnk,
      |   cume_dist()  OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS cd,
      |   ntile(4)     OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) AS quartile
      |  FROM orders)
      |WHERE rnk <= 100 ORDER BY o_orderstatus, rnk, o_orderkey""".stripMargin

  /** Correlated scalar subquery through the SQL front end: orders priced
    * >1.5× their customer's average. Catalyst DECORRELATES the subquery
    * into an aggregate + join (no per-row re-execution — asserted in
    * PlanSpec), the rewrite the reference's eager pandas had to do by
    * hand (scalar thresholds precomputed and inlined, SURVEY §4.1). Also
    * exercises `spark.sql(...)` as an entry surface next to the
    * DataFrame API.
    */
  def aboveAvgOrders(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT o_custkey, count(*) AS n_above,
        | round(max(o_totalprice), 2) AS max_price
        |FROM orders_v o
        |WHERE o_totalprice > 1.5 * (SELECT avg(i.o_totalprice)
        |                            FROM orders_v i
        |                            WHERE i.o_custkey = o.o_custkey)
        |GROUP BY o_custkey
        |ORDER BY n_above DESC, o_custkey
        |LIMIT 50""".stripMargin)
  }

  private val aboveAvgOrdersSql =
    """SELECT o_custkey, count(*) AS n_above,
      | round(max(o_totalprice), 2) AS max_price
      |FROM orders o
      |WHERE o_totalprice > 1.5 * (SELECT avg(i.o_totalprice)
      |                            FROM orders i
      |                            WHERE i.o_custkey = o.o_custkey)
      |GROUP BY o_custkey
      |ORDER BY n_above DESC, o_custkey
      |LIMIT 50""".stripMargin

  /** Promo-type revenue share per brand (TPC-H Q14 flavor): lineitem fact
    * ⋈ broadcast part dim on partkey, p_type predicate pushed to the dim
    * scan before the broadcast (the dim is filtered THEN shipped), share =
    * conditional sum over total. One fact-side pass, no fact shuffle for
    * the join.
    */
  def brandPromoShare(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val p = Tables.part(s, dir).select("p_partkey", "p_brand", "p_type")
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(
        round(sum(when(col("p_type") === "PROMO",
          col("l_extendedprice") * (lit(1.0) - col("l_discount")))), 4).as("promo_revenue"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("total_revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("p_brand")
  }

  private val brandPromoShareSql =
    """SELECT p_brand,
      | round(sum(CASE WHEN p_type='PROMO' THEN l_extendedprice*(1-l_discount) END),4) AS promo_revenue,
      | round(sum(l_extendedprice*(1-l_discount)),4) AS total_revenue,
      | count(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** Multi-table star join: revenue per (region, order year) across
    * lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region (TPC-H Q5 shape;
    * generalizes the reference's single cell-vs-network join chain,
    * `/root/reference/streamlit_app.py:614-641`, to a 5-table snowflake).
    *
    * Scale plan: exactly ONE fact-fact shuffle (lineitem ⋈ orders on
    * orderkey). customer joins on o_custkey WITHOUT a broadcast hint —
    * customer scales with the fact tables at 100 TB, so the plan must stay
    * valid as a shuffle join; at bench SF, AQE converts it to broadcast
    * from runtime stats. nation/region are fixed-cardinality → explicit
    * `broadcast()`. Aggregation is partial (map-side) before the final
    * group-by exchange on (r_name, o_year).
    */
  def regionYearRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select("l_orderkey", "l_extendedprice", "l_discount")
    val ord = Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_orderdate")
    val cust = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
    val nat = Tables.nation(s, dir)
    val reg = Tables.region(s, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), year(col("o_orderdate")).as("o_year"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "o_year")
  }

  private val regionYearRevenueSql =
    """SELECT r_name, CAST(year(o_orderdate) AS INT) AS o_year,
      | round(sum(l_extendedprice*(1-l_discount)),4) AS revenue,
      | count(*) AS n_items
      |FROM lineitem JOIN orders ON l_orderkey=o_orderkey
      |JOIN customer ON o_custkey=c_custkey
      |JOIN nation ON c_nationkey=n_nationkey
      |JOIN region ON n_regionkey=r_regionkey
      |GROUP BY r_name, o_year ORDER BY r_name, o_year""".stripMargin

  /** Correlated EXISTS / NOT EXISTS subqueries (SQL surface; complements
    * q20's correlated SCALAR subquery): segments counted over customers
    * that have a completed order but never placed an urgent one. Catalyst
    * decorrelates the pair into one left-semi and one left-anti join on
    * c_custkey — no per-row subquery execution survives (PlanSpec) — so
    * at scale this costs two key-partitioned joins, not |customer|
    * probes.
    */
  def existsNotExists(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("customer_v")
    Tables.orders(s, dir).createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer_v c
        |WHERE EXISTS (SELECT 1 FROM orders_v o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |  AND NOT EXISTS (SELECT 1 FROM orders_v o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
  }

  private val existsNotExistsSql =
    """SELECT c_mktsegment, count(*) AS n_customers
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Share-of-partition-total window (ratio_to_report): each order's
    * fraction of its customer's lifetime spend — an UNBOUNDED-frame
    * window aggregate (the frame shape q09/q10's rolling windows don't
    * cover). One exchange on o_custkey serves the window; the share
    * divides the raw price by the customer total restored exactly at the
    * data's 2-decimal scale, so both engines divide identical doubles.
    */
  def orderShareOfCustomer(s: SparkSession, dir: String): DataFrame = {
    val byCust = Window.partitionBy("o_custkey")
    Tables.orders(s, dir)
      .withColumn("cust_total", round(sum("o_totalprice").over(byCust), 2))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        (col("o_totalprice") / col("cust_total")).as("share"))
      .orderBy("o_orderkey")
  }

  private val orderShareOfCustomerSql =
    """SELECT o_orderkey, o_custkey, o_totalprice,
      | o_totalprice / round(sum(o_totalprice) OVER (PARTITION BY o_custkey), 2) AS share
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Open-order backlog over time — the event-sourced balance pattern:
    * +1 on the order date, −1 on the order's LAST shipment date, daily
    * net delta, then a running sum. All heavy work happens in
    * key-partitioned aggregations (per-order close date, per-day delta);
    * only the |days|-sized daily frame passes through the final ordered
    * cumsum (thousands of rows regardless of fact volume — the d25
    * two-level treatment applies if a calendar ever outgrows that).
    */
  def openOrderBacklog(s: SparkSession, dir: String): DataFrame = {
    val opens = Tables.orders(s, dir)
      .select(col("o_orderdate").as("d"), lit(1L).as("delta"))
    val closes = Tables.lineitem(s, dir)
      .groupBy("l_orderkey").agg(max("l_shipdate").as("d"))
      .select(col("d"), lit(-1L).as("delta"))
    opens.unionByName(closes)
      .groupBy("d").agg(sum("delta").as("net"))
      .withColumn("backlog", sum("net").over(
        Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("d")
  }

  private val openOrderBacklogSql =
    """WITH ev AS (
      |  SELECT o_orderdate AS d, 1 AS delta FROM orders
      |  UNION ALL
      |  SELECT max(l_shipdate) AS d, -1 AS delta FROM lineitem GROUP BY l_orderkey),
      |daily AS (SELECT d, CAST(sum(delta) AS BIGINT) AS net FROM ev GROUP BY d)
      |SELECT d, net,
      |  CAST(sum(net) OVER (ORDER BY d
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS backlog
      |FROM daily ORDER BY d""".stripMargin

  /** TPC-H Q17 shape — small-quantity lost revenue per brand: lineitems
    * whose quantity is under half their part's average quantity. The
    * textbook spelling is a CORRELATED scalar subquery per lineitem (one
    * re-aggregation of the fact table per outer row — the oracle keeps
    * that form); the scale formulation is decorrelation BY HAND: one
    * per-part pre-aggregation, then a self-join back on l_partkey. Both
    * sides of that join hash on partkey — co-partitioned, one exchange
    * each — and the part dim broadcasts for the brand label.
    * Determinism: quantities are integer-valued doubles → sum exact in
    * any order, avg = exact sum / exact count is one IEEE division, and
    * 0.5× is exact — both engines compare identical thresholds.
    */
  def smallQtyRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val partAvg = li.groupBy("l_partkey")
      .agg((sum("l_quantity") / count(lit(1))).as("avg_qty"))
    li.join(partAvg, Seq("l_partkey"))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(round(sum("l_extendedprice"), 2).as("lost_revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("p_brand")
  }

  private val smallQtyRevenueSql =
    """SELECT p_brand, round(sum(l_extendedprice),2) AS lost_revenue,
      | count(*) AS n_lines
      |FROM lineitem l JOIN part p ON p_partkey = l_partkey
      |WHERE l_quantity < 0.5 * (SELECT sum(l_quantity)/count(*) FROM lineitem li
      |                          WHERE li.l_partkey = p.p_partkey)
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** TPC-H Q22 shape — wealthy-but-lapsed customers per nation: acctbal
    * above the average of all positive balances AND no orders since
    * 2000-01-01. Three classic pieces composed: a scalar global threshold
    * (tiny agg, broadcast back — never a whole-table window), an ANTI
    * join against the recent orders, and a broadcast dim join for the
    * nation label. The anti join's right side is filtered (pushed to the
    * orders scan) then pre-reduced to DISTINCT o_custkey, so the shuffle
    * carries one row per recently-active customer instead of every order
    * (map-side dedup at 100 TB).
    * Determinism: acctbal is 2-decimal data; round(sum,2) is the exact
    * decimal restore, and the single division by the exact count gives
    * both engines bit-identical thresholds (QueryDef rules 1-2).
    */
  def inactiveHighBalance(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val thr = c.filter(col("c_acctbal") > 0)
      .agg((round(sum("c_acctbal"), 2) / count(lit(1))).as("thr"))
    val active = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("date"))
      .select("o_custkey").distinct()
    c.crossJoin(broadcast(thr))
      .filter(col("c_acctbal") > col("thr"))
      .join(active, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_custs"),
        round(sum("c_acctbal"), 2).as("total_bal"))
      .orderBy("n_name")
  }

  private val inactiveHighBalanceSql =
    """WITH thr AS (
      |  SELECT round(sum(c_acctbal),2)/count(*) AS thr
      |  FROM customer WHERE c_acctbal > 0)
      |SELECT n_name, count(*) AS n_custs, round(sum(c_acctbal),2) AS total_bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey, thr
      |WHERE c_acctbal > thr.thr
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderdate >= DATE '2000-01-01')
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** TPC-H Q7 shape — cross-border shipping volume by (supplier nation,
    * customer nation, year): the SAME dimension joined twice under two
    * roles (nation as shipper vs nation as buyer), which is the shape
    * role-playing dimensions always take in a star schema. Both nation
    * sides and supplier broadcast; customer stays unhinted like q24 so
    * the plan survives customer scaling with the fact tables (AQE
    * broadcasts it at bench SF); lineitem⋈orders is the one fact-fact
    * exchange. Volume has true scale 4 → round(sum,4) is the exact
    * decimal restore (QueryDef rule 1).
    */
  def nationTradeVolume(s: SparkSession, dir: String): DataFrame = {
    val n1 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
          .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  private val nationTradeVolumeSql =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      | CAST(year(l_shipdate) AS INT) AS l_year,
      | round(sum(l_extendedprice*(1-l_discount)),4) AS revenue,
      | count(*) AS n_lines
      |FROM lineitem JOIN orders ON l_orderkey=o_orderkey
      |JOIN customer ON o_custkey=c_custkey
      |JOIN supplier ON l_suppkey=s_suppkey
      |JOIN nation n1 ON s_nationkey=n1.n_nationkey
      |JOIN nation n2 ON c_nationkey=n2.n_nationkey
      |WHERE n1.n_name <> n2.n_name
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** TPC-H Q15 shape — the supplier(s) with the maximum quarterly revenue,
    * ties preserved. The classic compute-once-use-twice plan: the per-
    * supplier revenue view feeds both its own max (one-row aggregate,
    * broadcast back) and the tie-preserving equality against that max
    * (the shape where `orderBy(desc).limit(1)` silently drops ties).
    * The view is EXPLICITLY persisted: Catalyst's exchange reuse does
    * not fire across the two differing parent aggregates (verified on
    * the executed plan — without the persist the fact subtree is built
    * twice), so the materialization is what makes "the fact is read and
    * shuffled exactly once" true at 100 TB; the cached frame is
    * supplier-cardinality-sized. Revenue has true scale 4 →
    * round(sum,4) is the exact decimal restore, so the tie equality
    * compares exact decimals, never drifting ulps (QueryDef rules 1, 4).
    */
  def topSupplierRevenue(s: SparkSession, dir: String): DataFrame = {
    // lifecycle: the returned frame is lazy, so this function cannot
    // unpersist — Verify/Bench clearCache() between queries; library
    // callers wanting scoped cleanup use [[topSupplierRevenueScoped]]
    val rev = supplierRevenueView(s, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    topSupplierRevenueFrom(s, dir, rev)
  }

  /** Scoped form for library callers: the revenue view lives exactly for
    * the duration of `f` ([[graft.Caching.withPersisted]] — unpersist in
    * finally), so no runner sweep is needed. `f` must consume the frame
    * eagerly (collect/write) within the scope.
    */
  def topSupplierRevenueScoped[A](s: SparkSession, dir: String)(f: DataFrame => A): A =
    graft.Caching.withPersisted(supplierRevenueView(s, dir)) { rev =>
      f(topSupplierRevenueFrom(s, dir, rev))
    }

  private def supplierRevenueView(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
        .as("total_rev"))

  private def topSupplierRevenueFrom(s: SparkSession, dir: String,
      rev: DataFrame): DataFrame = {
    val mx = rev.agg(max("total_rev").as("mx"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_rev") === col("mx"))
      .join(broadcast(Tables.supplier(s, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev"))
      .orderBy("s_suppkey")
  }

  private val topSupplierRevenueSql =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    round(sum(l_extendedprice*(1-l_discount)),4) AS total_rev
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate <  TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_rev
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_rev = (SELECT max(total_rev) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** Argmin join-back (TPC-H Q2's min-cost-supplier core): for every part,
    * the minimum observed line price and the supplier(s) that quoted it.
    * The window-free argmin plan: a per-key min aggregate joined back to
    * the fact on (key, value-equality). Executed-plan shape: the fact is
    * scanned twice (a 2-column scan for the min agg, a 3-column probe),
    * but the PROBE side never shuffles — AQE broadcasts the per-key min
    * frame — and no per-group sort ever runs (the row_number()
    * alternative — q08 — sorts every group). When the key space outgrows
    * broadcast, both sides hash on the join keys (still no sort); the
    * window plan's single scan only wins when the fact:key ratio is
    * small. The equality is on the RAW stored double (no arithmetic),
    * identical bits in any engine. Ties on (part, price) across
    * suppliers are all kept, deduplicated map-side.
    */
  def cheapestSupplierPerPart(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val mn = li.groupBy(col("l_partkey").as("mk"))
      .agg(min("l_extendedprice").as("min_price"))
    li.join(mn, col("l_partkey") === col("mk") &&
        col("l_extendedprice") === col("min_price"))
      .select(col("l_partkey"), col("min_price"), col("l_suppkey"))
      .distinct()
      .orderBy("l_partkey", "l_suppkey")
  }

  private val cheapestSupplierPerPartSql =
    """WITH mn AS (
      |  SELECT l_partkey AS mk, min(l_extendedprice) AS min_price
      |  FROM lineitem GROUP BY l_partkey)
      |SELECT DISTINCT l_partkey, min_price, l_suppkey
      |FROM lineitem JOIN mn
      |  ON l_partkey = mk AND l_extendedprice = min_price
      |ORDER BY l_partkey, l_suppkey""".stripMargin

  /** TPC-H Q21 shape — the double-correlated semi + anti composition:
    * suppliers who were the ONLY supplier with a returned line in a
    * multi-supplier order (EXISTS another supplier in the order, NOT
    * EXISTS another supplier with a return). Both probe sides are
    * PRE-REDUCED to distinct (order, supplier) pairs before any join —
    * the shuffles carry pair cardinality, never raw line volume (q29's
    * map-side-dedup discipline applied twice) — and both derive from a
    * SINGLE persisted pair aggregate carrying a has-return flag (one
    * fact scan and one pair exchange where the two-distinct spelling
    * pays two of each). The semi and anti joins share the orderkey
    * hash; the supplier label is a broadcast; the top-10 is
    * TakeOrderedAndProject.
    */
  def soleReturner(s: SparkSession, dir: String): DataFrame = {
    // lifecycle: lazy return ⇒ runner-owns-cleanup, like q31; scoped
    // library callers use [[soleReturnerScoped]]
    val pairs = orderSupplierPairs(s, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    soleReturnerFrom(s, dir, pairs)
  }

  /** Scoped form for library callers — pair aggregate unpersisted in
    * finally; `f` must consume eagerly within the scope.
    */
  def soleReturnerScoped[A](s: SparkSession, dir: String)(f: DataFrame => A): A =
    graft.Caching.withPersisted(orderSupplierPairs(s, dir)) { pairs =>
      f(soleReturnerFrom(s, dir, pairs))
    }

  // ONE fact pass builds both probe relations: the (order, supplier)
  // pair frame carries a has-return flag, so "all pairs" and "return
  // pairs" are the same aggregate (persisted — three consumers would
  // otherwise rebuild the fact subtree, q31's lesson) and the two
  // distinct-pair shuffles of the naive spelling collapse into one.
  private def orderSupplierPairs(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("has_r"))

  private def soleReturnerFrom(s: SparkSession, dir: String,
      pairs: DataFrame): DataFrame = {
    val rs = pairs.filter(col("has_r") === 1).select("ok", "sk")
    val other = pairs.select(col("ok").as("ook"), col("sk").as("osk"))
    val otherR = rs.select(col("ok").as("rok"), col("sk").as("rsk"))
    rs
      .join(other, col("ok") === col("ook") && col("sk") =!= col("osk"),
        "left_semi")
      .join(otherR, col("ok") === col("rok") && col("sk") =!= col("rsk"),
        "left_anti")
      .groupBy("sk").agg(count(lit(1)).as("n_orders"))
      .join(broadcast(Tables.supplier(s, dir)), col("sk") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_orders"))
      .orderBy(desc("n_orders"), col("s_suppkey"))
      .limit(10)
  }

  private val soleReturnerSql =
    """WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem),
      |rs AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
      |       FROM lineitem WHERE l_returnflag = 'R')
      |SELECT s_suppkey, s_name, count(*) AS n_orders
      |FROM rs JOIN supplier ON rs.sk = s_suppkey
      |WHERE EXISTS (SELECT 1 FROM os
      |              WHERE os.ok = rs.ok AND os.sk <> rs.sk)
      |  AND NOT EXISTS (SELECT 1 FROM rs r2
      |                  WHERE r2.ok = rs.ok AND r2.sk <> rs.sk)
      |GROUP BY s_suppkey, s_name
      |ORDER BY n_orders DESC, s_suppkey LIMIT 10""".stripMargin

  /** Column profiling — the data-discovery report every warehouse "ANALYZE
    * TABLE"/profiler emits, as ONE query: per numeric lineitem column,
    * row/value/null counts, exact distinct count, min/max, mean. The wide
    * row is unpivoted with `stack` into (col_name, v) pairs so a SINGLE
    * scan feeds one hash aggregate over a 4-key keyspace — partial
    * aggregation collapses each map task to 4 rows, so the "4 groups ×
    * full volume" shape never skews the shuffle. All quantities are
    * exact-integer or exact-restored decimal (QueryDef rules 1-3).
    * At 100 TB the exact countDistinct is the one term to swap
    * (approx_count_distinct or t22's KMV) — the rest is map-side-thin.
    */
  def numericProfile(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"))
      .selectExpr(
        """stack(4,
          |  'l_quantity', l_quantity,
          |  'l_extendedprice', l_extendedprice,
          |  'l_discount', l_discount,
          |  'l_tax', l_tax) AS (col_name, v)""".stripMargin)
      .groupBy("col_name")
      .agg(count(lit(1)).as("n_rows"),
        count(col("v")).as("n_vals"),
        (count(lit(1)) - count(col("v"))).as("n_null"),
        countDistinct(col("v")).as("ndv"),
        min("v").as("min_v"), max("v").as("max_v"),
        (round(sum("v"), 2) / count(col("v"))).as("mean_v"))
      .orderBy("col_name")

  private val numericProfileSql =
    """SELECT col_name, count(*) AS n_rows, count(v) AS n_vals,
      |  count(*) - count(v) AS n_null, count(DISTINCT v) AS ndv,
      |  min(v) AS min_v, max(v) AS max_v,
      |  round(sum(v), 2) / count(v) AS mean_v
      |FROM (
      |  SELECT 'l_quantity' AS col_name, l_quantity AS v FROM lineitem
      |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
      |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
      |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
      |GROUP BY col_name ORDER BY col_name""".stripMargin

  /** Decile lift / gains table — the ranking-evaluation report behind the
    * reference's published P@k/R@k metrics (README.md:34-38,
    * model_card_skeleton), generalized to any score: customers ranked by
    * a score (acctbal as the stand-in), cut into deciles, each decile
    * reporting its positive rate (here: ordered since 2000), cumulative
    * capture share, and lift over the base rate. The positive label is a
    * pre-reduced DISTINCT key set (q29's discipline); per-decile stats
    * are exact-integer ratios and the cumulative runs over the 10-row
    * aggregate only. Decile assignment is [[Ranking.exactNtile]] — the
    * exact two-level formulation (value bins → bounded offset frame →
    * in-bin window), so NO window ever sees the whole customer dimension
    * in one partition; the only sequential steps are the ≤1024-row bin
    * frame and the 10-row decile aggregate.
    */
  def decileLift(s: SparkSession, dir: String): DataFrame = {
    val active = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("date"))
      .select("o_custkey").distinct()
    // exactNtile scans its input three times (span, bin counts, rank);
    // the scored view is an orders-wide DISTINCT plus the customer join,
    // so persist the narrow 3-column result — registry contract: no
    // unpersist here, Verify/Bench clearCache() between queries (q31's
    // documented ownership model; d42 follows the same pattern).
    val scored = Tables.customer(s, dir)
      .join(active, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("c_acctbal"),
        when(col("o_custkey").isNotNull, 1L).otherwise(0L).as("pos"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val agg = Ranking
      .exactNtile(scored, 10, col("c_acctbal"), ascending = false,
        ties = Seq(col("c_custkey")), out = "decile")
      .groupBy("decile")
      .agg(count(lit(1)).as("n_customers"), sum("pos").as("n_active"))
    val tot = agg.agg(sum("n_active").as("ta"), sum("n_customers").as("tc"))
    agg.crossJoin(broadcast(tot))
      .withColumn("active_rate", col("n_active") * lit(1.0) / col("n_customers"))
      .withColumn("cum_capture",
        sum("n_active").over(Window.orderBy("decile")) * lit(1.0) / col("ta"))
      .withColumn("lift",
        (col("n_active") * lit(1.0) / col("n_customers")) /
          (col("ta") * lit(1.0) / col("tc")))
      .select("decile", "n_customers", "n_active", "active_rate",
        "cum_capture", "lift")
      .orderBy("decile")
  }

  private val decileLiftSql =
    """WITH act AS (SELECT DISTINCT o_custkey FROM orders
      |             WHERE o_orderdate >= DATE '2000-01-01'),
      |sc AS (SELECT c_custkey, c_acctbal,
      |         CASE WHEN o_custkey IS NULL THEN 0 ELSE 1 END AS pos
      |       FROM customer LEFT JOIN act ON c_custkey = o_custkey),
      |dec AS (SELECT *, ntile(10) OVER
      |          (ORDER BY c_acctbal DESC, c_custkey) AS decile FROM sc),
      |agg AS (SELECT decile, count(*) AS n_customers,
      |          CAST(sum(pos) AS BIGINT) AS n_active
      |        FROM dec GROUP BY decile),
      |tot AS (SELECT CAST(sum(n_active) AS BIGINT) AS ta,
      |          CAST(sum(n_customers) AS BIGINT) AS tc FROM agg)
      |SELECT decile, n_customers, n_active,
      |  n_active * 1.0 / n_customers AS active_rate,
      |  CAST(sum(n_active) OVER (ORDER BY decile) AS BIGINT) * 1.0 / ta
      |    AS cum_capture,
      |  (n_active * 1.0 / n_customers) / (ta * 1.0 / tc) AS lift
      |FROM agg, tot ORDER BY decile""".stripMargin

  /** Cross-fact reconciliation audit — does the order header agree with
    * its lines? The t11/e12 data-contract idea extended ACROSS tables:
    * per order, the line-derived total (Σ price·(1−disc)·(1+tax), true
    * scale 6 → exact restore) is compared to o_totalprice; the one-row
    * report counts childless orders, orders within/beyond 1% relative
    * difference, the worst relative difference, and orphaned lines
    * (lineitem keys with no order — the referential-integrity check).
    * Plan: ONE orderkey-co-partitioned fact-fact join for the header
    * comparison, one anti join for orphans; every verdict is decided on
    * bit-identical arithmetic (exact-decimal inputs, fixed-order ops),
    * so the 1% threshold cannot flip between engines.
    */
  def factReconciliation(s: SparkSession, dir: String): DataFrame = {
    val la = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
        (lit(1.0) + col("l_tax"))), 6).as("line_total"))
    val relDiff = abs(col("o_totalprice") - col("line_total")) / col("o_totalprice")
    val orphans = Tables.lineitem(s, dir).select("l_orderkey")
      .join(Tables.orders(s, dir).select(col("o_orderkey").as("ok2")),
        col("l_orderkey") === col("ok2"), "left_anti")
      .agg(count(lit(1)).as("n_orphan_lines"))
    Tables.orders(s, dir)
      .join(la, col("o_orderkey") === col("l_orderkey"), "left")
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("line_total").isNull, 1L).otherwise(0L)).as("n_childless"),
        sum(when(col("line_total").isNotNull && relDiff <= 0.01, 1L)
          .otherwise(0L)).as("n_within_1pct"),
        sum(when(col("line_total").isNotNull && relDiff > 0.01, 1L)
          .otherwise(0L)).as("n_beyond_1pct"),
        round(max(when(col("line_total").isNotNull, relDiff)), 6)
          .as("max_rel_diff"))
      .crossJoin(orphans)
  }

  private val factReconciliationSql =
    """WITH la AS (
      |  SELECT l_orderkey,
      |    round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)), 6) AS line_total
      |  FROM lineitem GROUP BY l_orderkey),
      |j AS (SELECT o_totalprice, line_total
      |      FROM orders LEFT JOIN la ON o_orderkey = l_orderkey)
      |SELECT count(*) AS n_orders,
      |  CAST(sum(CASE WHEN line_total IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_childless,
      |  CAST(sum(CASE WHEN line_total IS NOT NULL
      |    AND abs(o_totalprice - line_total) / o_totalprice <= 0.01
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_within_1pct,
      |  CAST(sum(CASE WHEN line_total IS NOT NULL
      |    AND abs(o_totalprice - line_total) / o_totalprice > 0.01
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_beyond_1pct,
      |  round(max(CASE WHEN line_total IS NOT NULL
      |    THEN abs(o_totalprice - line_total) / o_totalprice END), 6)
      |    AS max_rel_diff,
      |  (SELECT count(*) FROM lineitem
      |   WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey))
      |    AS n_orphan_lines
      |FROM j""".stripMargin

  /** Percent-of-parent hierarchy report — each nation's share of its
    * region and each region's share of the total, on one customer-
    * balance measure: the drill-down ratio columns every OLAP hierarchy
    * browser shows next to the raw measure. ONE aggregation at the leaf
    * grain (nation); the region and grand totals are windows OVER THE
    * LEAF AGGREGATE (25 rows), never re-aggregations of the fact —
    * compute at the finest grain once, derive ancestors by window sums
    * (the additive-measure discipline; non-additive measures would need
    * the separate rollup). Shares are exact-restored decimal sums
    * divided pairwise — same bits both engines, no display rounding.
    */
  def percentOfParent(s: SparkSession, dir: String): DataFrame = {
    val leaf = Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_customers"),
        round(sum("c_acctbal"), 2).as("nation_bal"))
    val byRegion = Window.partitionBy("r_name")
    val all = Window.partitionBy()
    leaf
      // window sums also need the exact-decimal restore (QueryDef rule 1):
      // partition-internal add order is engine-specific, but the summands
      // are 2-dec decimals so round(·, 2) recovers the exact decimal sum
      .withColumn("region_bal", round(sum("nation_bal").over(byRegion), 2))
      .withColumn("total_bal", round(sum("nation_bal").over(all), 2))
      .select(col("r_name"), col("n_name"), col("n_customers"),
        col("nation_bal"),
        (col("nation_bal") / col("region_bal")).as("share_of_region"),
        (col("region_bal") / col("total_bal")).as("region_share_of_total"))
      .orderBy("r_name", "n_name")
  }

  private val percentOfParentSql =
    """WITH leaf AS (
      |  SELECT r_name, n_name, count(*) AS n_customers,
      |    round(sum(c_acctbal), 2) AS nation_bal
      |  FROM customer
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  GROUP BY r_name, n_name)
      |SELECT r_name, n_name, n_customers, nation_bal,
      |  nation_bal / round(sum(nation_bal) OVER (PARTITION BY r_name), 2)
      |    AS share_of_region,
      |  round(sum(nation_bal) OVER (PARTITION BY r_name), 2)
      |    / round(sum(nation_bal) OVER (), 2) AS region_share_of_total
      |FROM leaf ORDER BY r_name, n_name""".stripMargin

  /** Ranking-metrics report — AUC (Mann-Whitney rank-sum with mid-rank
    * ties) and precision/recall@100 for q35's scored frame (acctbal as
    * the score, "ordered since 2000" as the label): the AUC/P@k
    * companion of the decile-lift gains table, and the oracle anchor for
    * [[graft.telemetry.Scorer.rankMetrics]] — the distributed
    * replacement for the collect-based evaluator (reference eval
    * protocol streamlit_app.py:862-872, README.md:34-38).
    *
    * Everything before the final division is exact-integer (the R2
    * doubled-rank-sum trick, see rankMetrics); acctbal ties get
    * mid-ranks and the top-100 boundary breaks ties on c_custkey, so
    * both engines rank identically. The oracle states the cumulative
    * count as one flat window; the Spark side runs d25's two-level
    * bucketed prefix sum (buckets spanning acctbal's [-1000, 10000)
    * domain) — same values, no single-partition funnel.
    */
  def rankMetricsReport(s: SparkSession, dir: String): DataFrame = {
    val active = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("date"))
      .select("o_custkey").distinct()
    val scored = Tables.customer(s, dir)
      .join(active, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"),
        col("c_acctbal").cast("double").as("score"),
        when(col("o_custkey").isNotNull, 1L).otherwise(0L).as("pos"))
    graft.telemetry.Scorer.rankMetrics(scored, "score", "pos", k = 100,
        tieCols = Seq("c_custkey"), bucketLo = -1000.0, bucketHi = 10000.0)
      .select(round(col("auc"), 6).as("auc"),
        round(col("ap"), 6).as("ap"),
        round(col("p_at_k"), 6).as("p_at_k"),
        round(col("r_at_k"), 6).as("r_at_k"),
        col("npos"), col("nneg"), col("n"))
  }

  private val rankMetricsReportSql =
    """WITH act AS (SELECT DISTINCT o_custkey FROM orders
      |             WHERE o_orderdate >= DATE '2000-01-01'),
      |sc AS (SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS s,
      |         CASE WHEN o_custkey IS NULL THEN 0 ELSE 1 END AS y
      |       FROM customer LEFT JOIN act ON c_custkey = o_custkey),
      |g AS (SELECT s, count(*) AS cnt, CAST(sum(y) AS BIGINT) AS pos
      |      FROM sc GROUP BY s),
      |r AS (SELECT *, CAST(coalesce(sum(cnt) OVER (ORDER BY s
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |        AS BIGINT) AS cum,
      |        CAST(coalesce(sum(pos) OVER (ORDER BY s
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |        AS BIGINT) AS cump FROM g),
      |t0 AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
      |         CAST(sum(pos) AS BIGINT) AS npos FROM r),
      |tot AS (SELECT CAST(sum(pos * (2*cum + cnt + 1)) AS BIGINT) AS r2,
      |          any_value(npos) AS npos, any_value(n) AS n,
      |          sum(CAST(pos * (npos - cump) AS DOUBLE) / (n - cum)) AS ap_sum
      |        FROM r, t0),
      |tk AS (SELECT CAST(sum(y) AS BIGINT) AS k_pos FROM
      |        (SELECT y FROM sc ORDER BY s DESC, c_custkey LIMIT 100))
      |SELECT
      |  round((r2 - npos*(npos+1)) / (2.0 * npos * (n - npos)), 6) AS auc,
      |  round(ap_sum / npos, 6) AS ap,
      |  round(k_pos / 100.0, 6) AS p_at_k,
      |  round(k_pos * 1.0 / npos, 6) AS r_at_k,
      |  npos, (n - npos) AS nneg, n
      |FROM tot, tk""".stripMargin

  /** TPC-H Q8 market-share shape — the one classic multi-fact tree
    * q24/q30 don't cover: a nation's share of PROMO-part revenue sold
    * into AMERICA-region customers, per order year. TWO nation roles
    * (customer side selects the region, supplier side labels the
    * seller), a part filter, and a conditional share whose numerator
    * and denominator come from the SAME aggregation (one `when` inside
    * the sum — never a second fact pass or a self-join on year).
    *
    * Plan budget (pinned in PlanSpec): lineitem⋈orders is the ONLY
    * fact-fact shuffle; part, supplier⋈nation, customer⋈nation⋈region
    * all broadcast at this SF. At 100 TB customer graduates to a
    * shuffle join co-bucketed with orders on custkey (q24's argument);
    * the share arithmetic is unaffected. Determinism: volume is a
    * scale-4 decimal so round(sum, 4) exact-restores both sums (q31's
    * rule); the share is ONE division of those exact decimals, then
    * 6-dp display rounding.
    */
  def marketShare(s: SparkSession, dir: String): DataFrame = {
    val promoParts = Tables.part(s, dir)
      .filter(col("p_type") === "PROMO").select("p_partkey")
    val america = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "AMERICA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cnk"))
    val cust = Tables.customer(s, dir)
      .join(broadcast(america), col("c_nationkey") === col("cnk"))
      .select("c_custkey")
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
    val supNation = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("snk"))
      .select("s_suppkey", "supp_nation")
    val li = Tables.lineitem(s, dir)
      .join(broadcast(promoParts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("supp_nation"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("volume"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_year")
      .agg(
        round(sum(when(col("supp_nation") === "NATION_3", col("volume"))
          .otherwise(lit(0.0))), 4).as("target_volume"),
        round(sum("volume"), 4).as("total_volume"))
      .select(col("o_year"), col("target_volume"), col("total_volume"),
        round(col("target_volume") / col("total_volume"), 6).as("mkt_share"))
      .orderBy("o_year")
  }

  private val marketShareSql =
    """WITH am AS (SELECT n_nationkey FROM nation
      |            JOIN region ON n_regionkey = r_regionkey
      |            WHERE r_name = 'AMERICA'),
      |li AS (SELECT l_orderkey, n.n_name AS supp_nation,
      |         l_extendedprice * (1 - l_discount) AS volume
      |       FROM lineitem
      |       JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
      |       JOIN supplier ON l_suppkey = s_suppkey
      |       JOIN nation n ON s_nationkey = n.n_nationkey),
      |o AS (SELECT o_orderkey,
      |        CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year
      |      FROM orders
      |      JOIN customer ON o_custkey = c_custkey
      |      JOIN am ON c_nationkey = am.n_nationkey
      |      WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      |        AND o_orderdate <  TIMESTAMP '1999-01-01')
      |SELECT o_year,
      |  round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END), 4)
      |    AS target_volume,
      |  round(sum(volume), 4) AS total_volume,
      |  round(round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END), 4)
      |        / round(sum(volume), 4), 6) AS mkt_share
      |FROM li JOIN o ON l_orderkey = o_orderkey
      |GROUP BY o_year ORDER BY o_year""".stripMargin

  /** Returned-item revenue loss (TPC-H Q10 shape): per customer, the
    * revenue of their RETURNED lines in one order quarter, top 20 — the
    * chargeback/loss report every commerce warehouse runs. Plan budget:
    * lineitem(R-only, filter pushed to the scan) ⋈ orders(quarter) is
    * the ONLY fact-fact shuffle; customer and nation broadcast; top-20
    * is TakeOrderedAndProject with full (revenue desc, custkey) order.
    * Revenue has true scale 4 → round(sum, 4) is the exact decimal
    * restore (QueryDef rule 1).
    */
  def returnedRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1995-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1995-10-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
        .as("lost_revenue"),
        count(lit(1)).as("n_returned_lines"))
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        col("lost_revenue"), col("n_returned_lines"))
      .orderBy(desc("lost_revenue"), col("c_custkey"))
      .limit(20)
  }

  private val returnedRevenueSql =
    """SELECT c_custkey, c_name, n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS lost_revenue,
      |  count(*) AS n_returned_lines
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1995-07-01'
      |  AND o_orderdate <  TIMESTAMP '1995-10-01'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY lost_revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** Large-volume orders (TPC-H Q18 shape): orders whose line quantities
    * total > 250, resolved to their customer. The HAVING probe is a
    * pre-reduced fact aggregate: ONE lineitem orderkey agg (map-side
    * combinable; quantities are integral-valued doubles so the sum is
    * exact, no rounding layer), whose survivors join orders ON THE SAME
    * KEY — co-partitioned behind the agg's exchange, so the only
    * fact-fact shuffle is the aggregation itself. Customer resolves via
    * the q03/q40 broadcast-hint convention (swap to a keyed join when
    * the customer dim outgrows broadcast). Top-100 rides
    * TakeOrderedAndProject with full tie-break.
    */
  def bigOrders(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(s, dir)
      .groupBy("l_orderkey")
      .agg(sum("l_quantity").as("total_qty"))
      .filter(col("total_qty") > 250)
    Tables.orders(s, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("order_date"),
        col("o_totalprice"), col("total_qty"))
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .limit(100)
  }

  private val bigOrdersSql =
    """SELECT c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
      |  o_totalprice, total_qty
      |FROM (SELECT l_orderkey, sum(l_quantity) AS total_qty
      |      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250) t
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  /** Order inter-arrival analysis per market segment — the purchase-
    * cadence profile (how long between a customer's consecutive orders)
    * that drives churn/frequency models: per customer the day gaps
    * between successive orders (a customer-partitioned lag, fully
    * tie-broken on order key so same-day orders resolve identically on
    * any engine), rolled up per segment to count, exact mean, and exact
    * p50/p90 percentiles. Scale shape: the window partitions on
    * o_custkey (never global), the segment dimension joins AFTER the
    * per-customer reduction feed, and the rollup lands on the 5-key
    * segment space; at 100 TB the exact percentiles swap for t19's
    * mergeable histogram sketch. Floats: gaps are exact ints, mean is
    * one int/int division, percentile interpolation carries 6-dp display
    * rounding (QueryDef rules 3 and 6).
    */
  def orderInterarrival(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("od", "o_orderkey")
    val gaps = Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("od"))
      .withColumn("prev", lag("od", 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("o_custkey"), datediff(col("od"), col("prev")).as("gap_days"))
    gaps
      .join(Tables.customer(s, dir)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
        "o_custkey")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_gaps"),
        (sum("gap_days") * lit(1.0) / count(lit(1))).as("mean_gap_days"),
        round(expr("percentile(gap_days, 0.5)"), 6).as("p50_gap_days"),
        round(expr("percentile(gap_days, 0.9)"), 6).as("p90_gap_days"))
      .orderBy("c_mktsegment")
  }

  private val orderInterarrivalSql =
    """WITH o AS (SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS od
      |       FROM orders),
      |g AS (SELECT o_custkey,
      |        od - lag(od, 1) OVER (PARTITION BY o_custkey
      |          ORDER BY od, o_orderkey) AS gap_days
      |      FROM o)
      |SELECT c_mktsegment, count(*) AS n_gaps,
      |  sum(gap_days) * 1.0 / count(*) AS mean_gap_days,
      |  round(quantile_cont(gap_days, 0.5), 6) AS p50_gap_days,
      |  round(quantile_cont(gap_days, 0.9), 6) AS p90_gap_days
      |FROM g JOIN customer ON o_custkey = c_custkey
      |WHERE gap_days IS NOT NULL
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** RFM customer segmentation — the standard recency/frequency/monetary
    * quartile grid (Hughes 1994) rolled up to named lifecycle segments:
    * per customer, days since last order (vs the corpus max date — a
    * deterministic data anchor, never wall-clock), order count, and
    * 2-dp-exact total spend; each dimension quartile-scored and the
    * (r, f) grid mapped to champion / loyal / promising / at_risk /
    * hibernating — the table a retention campaign is actually driven by.
    *
    * Scale shape: the RFM frame is one map-side-combining aggregate of
    * orders (customer-sized), persisted once (registry contract — the
    * runner owns cache cleanup) because each of the three quartile
    * scores is a [[Ranking.exactNtile]] over it: the exact two-level
    * formulation, so NO window ever sees the whole customer dimension in
    * one partition (q35's discipline, three times). The three slim
    * (custkey, score) frames join back on the aggregate's own key.
    * Floats: recency/frequency are exact ints; monetary is
    * `round(sum, 2)` — an exact decimal restore of 2-dp money (QueryDef
    * rule 1) — so the ntile orders and all reported means divide exact
    * values (rules 2-3), emitted unrounded.
    */
  def rfmSegments(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("od"),
        col("o_totalprice"))
    val mx = o.agg(max("od").as("anchor"))
    val rfm = o.groupBy("o_custkey")
      .agg(max("od").as("last_od"), count(lit(1)).as("frequency"),
        round(sum("o_totalprice"), 2).as("monetary"))
      .crossJoin(broadcast(mx))
      .select(col("o_custkey"),
        datediff(col("anchor"), col("last_od")).as("recency"),
        col("frequency"), col("monetary"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // KEPT AS JOINS, measured (round 15): chaining the three exactNtile
    // calls (adding each tile column in place, no join-backs) measured
    // 2.9 → 3.1 s plain and 3.1 s with per-tile localCheckpoint cuts —
    // the three customer-grain joins off the persisted rfm are cheaper
    // than re-running or materializing the growing window chain.
    def tile(score: String, asc: Boolean, out: String) = Ranking
      .exactNtile(rfm, 4, col(score), ascending = asc,
        ties = Seq(col("o_custkey")), out = out)
      .select("o_custkey", out)
    val scored = rfm
      .join(tile("recency", asc = true, "r_score"), "o_custkey")
      .join(tile("frequency", asc = false, "f_score"), "o_custkey")
      .join(tile("monetary", asc = false, "m_score"), "o_custkey")
    scored
      .withColumn("segment",
        when(col("r_score") === 1 && col("f_score") === 1, "champion")
          .when(col("r_score") <= 2 && col("f_score") <= 2, "loyal")
          .when(col("r_score") <= 2, "promising")
          .when(col("f_score") <= 2, "at_risk")
          .otherwise("hibernating"))
      .groupBy("segment")
      .agg(count(lit(1)).as("n_customers"),
        sum("frequency").as("n_orders"),
        round(sum("monetary"), 2).as("total_monetary"),
        (sum("recency") * lit(1.0) / count(lit(1))).as("mean_recency_days"),
        (round(sum("monetary"), 2) / count(lit(1))).as("mean_monetary"))
      .orderBy("segment")
  }

  private val rfmSegmentsSql =
    """WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS od,
      |        o_totalprice FROM orders),
      |mx AS (SELECT max(od) AS anchor FROM o),
      |rfm AS (SELECT o_custkey, anchor - max(od) AS recency,
      |          count(*) AS frequency,
      |          round(sum(o_totalprice), 2) AS monetary
      |        FROM o, mx GROUP BY o_custkey, anchor),
      |sc AS (SELECT *,
      |         ntile(4) OVER (ORDER BY recency, o_custkey) AS r_score,
      |         ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
      |         ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_score
      |       FROM rfm),
      |seg AS (SELECT CASE
      |          WHEN r_score = 1 AND f_score = 1 THEN 'champion'
      |          WHEN r_score <= 2 AND f_score <= 2 THEN 'loyal'
      |          WHEN r_score <= 2 THEN 'promising'
      |          WHEN f_score <= 2 THEN 'at_risk'
      |          ELSE 'hibernating' END AS segment,
      |          recency, frequency, monetary
      |        FROM sc)
      |SELECT segment, count(*) AS n_customers,
      |  CAST(sum(frequency) AS BIGINT) AS n_orders,
      |  round(sum(monetary), 2) AS total_monetary,
      |  sum(recency) * 1.0 / count(*) AS mean_recency_days,
      |  round(sum(monetary), 2) / count(*) AS mean_monetary
      |FROM seg GROUP BY segment ORDER BY segment""".stripMargin

  /** Revenue concentration — the decile Lorenz curve and its trapezoid
    * Gini: customers ranked by total spend (ascending), the cumulative
    * revenue share at each population decile, and
    * G ≈ 1 − (1/10)·Σ(L_i + L_{i−1}) — the how-concentrated-is-the-
    * business table (and, swapped onto documents × sources, the corpus-
    * concentration audit the same code path serves). The top decile's
    * share and the Gini are what a revenue-risk review actually quotes.
    *
    * Scale shape: one map-side-combining orders aggregate to the
    * customer grain, decile assignment via [[Ranking.exactNtile]] over
    * the persisted customer frame (q35's no-global-window discipline),
    * then everything — cumulative shares, trapezoid sum, Gini — runs on
    * the 10-row decile aggregate (its unpartitioned window is bounded
    * BY CONSTRUCTION, PlanSpec-allowlisted like q35's cum_capture).
    * Floats: per-customer and per-decile revenue are exact 2-dp
    * restores (rule 1), shares divide those exact values (rule 2), and
    * only the Gini — a 10-term sum whose order differs across
    * engines — carries 6-dp display rounding (rule 6).
    */
  def lorenzGini(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.orders(s, dir)
      .groupBy("o_custkey")
      .agg(round(sum("o_totalprice"), 2).as("monetary"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dec = Ranking
      .exactNtile(cust, 10, col("monetary"),
        ascending = true, ties = Seq(col("o_custkey")), out = "decile")
      .groupBy("decile")
      .agg(count(lit(1)).as("n_customers"),
        round(sum("monetary"), 2).as("decile_revenue"))
      // 10 rows BY CONSTRUCTION, three consumers (tot, lorenz, and
      // lorenz's second execution under gini): materialize once,
      // GC-owned — d70's round-15 bounded-frame discipline
      .localCheckpoint()
    val tot = dec.agg(round(sum("decile_revenue"), 2).as("tr"),
      sum("n_customers").as("tc"))
    val w = Window.orderBy("decile")
    val lorenz = dec.crossJoin(broadcast(tot))
      .withColumn("cum_rev", round(sum("decile_revenue").over(w), 2))
      .select(col("decile"), col("n_customers"),
        col("decile_revenue"),
        (col("decile_revenue") / col("tr")).as("revenue_share"),
        (col("cum_rev") / col("tr")).as("cum_revenue_share"))
      // 10 rows; read twice (gini and the final emit)
      .localCheckpoint()
    val gini = lorenz
      .withColumn("prev", coalesce(lag("cum_revenue_share", 1)
        .over(Window.orderBy("decile")), lit(0.0)))
      .agg(round(lit(1.0) - sum(col("cum_revenue_share") + col("prev"))
        / lit(10.0), 6).as("gini"))
    lorenz.crossJoin(broadcast(gini)).orderBy("decile")
  }

  private val lorenzGiniSql =
    """WITH cust AS (SELECT o_custkey, round(sum(o_totalprice), 2) AS monetary
      |        FROM orders GROUP BY o_custkey),
      |dec AS (SELECT decile, count(*) AS n_customers,
      |          round(sum(monetary), 2) AS decile_revenue
      |        FROM (SELECT o_custkey, monetary,
      |                ntile(10) OVER (ORDER BY monetary, o_custkey) AS decile
      |              FROM cust)
      |        GROUP BY decile),
      |tot AS (SELECT round(sum(decile_revenue), 2) AS tr,
      |          CAST(sum(n_customers) AS BIGINT) AS tc FROM dec),
      |lz AS (SELECT decile, n_customers, decile_revenue,
      |         decile_revenue / tr AS revenue_share,
      |         round(sum(decile_revenue) OVER (ORDER BY decile), 2) / tr
      |           AS cum_revenue_share
      |       FROM dec, tot),
      |g0 AS (SELECT cum_revenue_share + coalesce(lag(cum_revenue_share, 1)
      |           OVER (ORDER BY decile), 0.0) AS trap
      |       FROM lz),
      |g AS (SELECT round(1.0 - sum(trap) / 10.0, 6) AS gini FROM g0)
      |SELECT decile, n_customers, decile_revenue, revenue_share,
      |  cum_revenue_share, gini
      |FROM lz, g ORDER BY decile""".stripMargin

  /** Market-basket affinity — co-occurrence LIFT between parts bought in
    * the same order (the association-rule kernel under recommenders and
    * assortment analysis): lift(a,b) = P(a,b)/(P(a)·P(b)) over order
    * baskets, top-20 pairs with a ≥2-order support floor. Lift > 1 =
    * bought together more than chance; the support floor keeps
    * one-basket coincidences out of the ranking.
    *
    * Scale shape: the inverted-index discipline (d05's kernel) — the
    * per-order DISTINCT part list is built ONCE (baskets are small, so
    * the posting list is bounded by basket size, not corpus size),
    * pairs stream lazily via pair_explode, and the pair/part/total
    * supports are three map-side-combining aggregates; the two slim
    * support tables join back by part key. No self-join of the
    * lineitem table anywhere.
    *
    * Determinism: lift = (n_ab·N)/(n_a·n_b) with both products promoted
    * to double before multiplying — exact integers under 2^53 through
    * ONE division (rule 3), bit-identical on both engines, so the
    * (lift DESC, part ids) top-20 needs no rounding.
    */
  def basketLift(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    // NOT persisted, measured (round 15): three consumers re-run the
    // fact scan + distinct, but caching the 600 k-row basket frame
    // measured 1.7 → 2.3 s (cache write + three cache reads cost more
    // than the re-scans — the distinct is map-side-combined and cheap)
    val baskets = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val nOrders = baskets.select("l_orderkey").distinct()
      .agg(count(lit(1)).as("n_orders"))
    val partSupp = baskets.groupBy("l_partkey")
      .agg(count(lit(1)).as("n_part"))
    val pairs = baskets.groupBy("l_orderkey")
      .agg(sort_array(collect_list(col("l_partkey"))).as("ds"))
      .where(size(col("ds")) > 1)
      .selectExpr("pair_explode(ds) AS (x, y)")
      .groupBy(col("x").as("part_a"), col("y").as("part_b"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= 2)
    pairs
      .join(partSupp.select(col("l_partkey").as("part_a"),
        col("n_part").as("n_a")), "part_a")
      .join(partSupp.select(col("l_partkey").as("part_b"),
        col("n_part").as("n_b")), "part_b")
      .crossJoin(broadcast(nOrders))
      .select(col("part_a"), col("part_b"), col("n_both"),
        col("n_a"), col("n_b"),
        (col("n_both") * lit(1.0) / col("n_orders")).as("support"),
        (col("n_both") * lit(1.0) * col("n_orders") /
          (col("n_a") * lit(1.0) * col("n_b"))).as("lift"))
      .orderBy(desc("lift"), col("part_a"), col("part_b"))
      .limit(20)
  }

  /** Supplier concentration per nation — the Herfindahl–Hirschman index
    * (HHI = Σ shareᵢ², the antitrust concentration scalar; 1/HHI is the
    * "effective number of suppliers"): how dependent is each nation's
    * lineitem revenue on few suppliers? Complements q45's Gini — the
    * Gini reads inequality of the whole distribution, HHI reads
    * dominance at the top, and procurement-risk reviews quote both.
    *
    * Scale shape: one map-side-combining (nation, supplier) revenue
    * aggregate of the fact table (supplier dimension broadcast onto the
    * pre-reduced frame — never onto lineitem rows), then a per-nation
    * reduction of the supplier-bounded frame. Floats: revenues are
    * exact 2-dp restores (rule 1); each share is one division of exact
    * values, HHI is the Σshare² over a per-nation supplier set whose
    * sum order differs across engines — 6-dp display rounding (rule 6);
    * the effective count is 1/HHI of that rounded value, same rule.
    */
  def supplierHhi(s: SparkSession, dir: String): DataFrame = {
    val bySupp = Tables.lineitem(s, dir)
      .groupBy("l_suppkey")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("rev"))
    val withNation = bySupp
      .join(broadcast(Tables.supplier(s, dir)
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
    val natTot = withNation.groupBy("n_name")
      .agg(round(sum("rev"), 2).as("nat_rev"),
        count(lit(1)).as("n_suppliers"))
    withNation.join(broadcast(natTot), "n_name")
      .select(col("n_name"), col("n_suppliers"), col("nat_rev"),
        ((col("rev") / col("nat_rev")) * (col("rev") / col("nat_rev")))
          .as("s2"))
      .groupBy("n_name", "n_suppliers", "nat_rev")
      .agg(round(sum("s2"), 6).as("hhi"))
      .withColumn("effective_suppliers", round(lit(1.0) / col("hhi"), 6))
      .select("n_name", "n_suppliers", "nat_rev", "hhi",
        "effective_suppliers")
      .orderBy("n_name")
  }

  private val supplierHhiSql =
    """WITH bs AS (SELECT l_suppkey,
      |        round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev
      |      FROM lineitem GROUP BY l_suppkey),
      |wn AS (SELECT n_name, rev FROM bs
      |       JOIN supplier ON l_suppkey = s_suppkey
      |       JOIN nation ON s_nationkey = n_nationkey),
      |nt AS (SELECT n_name, round(sum(rev), 2) AS nat_rev,
      |         count(*) AS n_suppliers
      |       FROM wn GROUP BY n_name)
      |SELECT n_name, n_suppliers, nat_rev,
      |  round(sum((rev / nat_rev) * (rev / nat_rev)), 6) AS hhi,
      |  round(1.0 / round(sum((rev / nat_rev) * (rev / nat_rev)), 6), 6)
      |    AS effective_suppliers
      |FROM wn JOIN nt USING (n_name)
      |GROUP BY n_name, n_suppliers, nat_rev
      |ORDER BY n_name""".stripMargin

  private val basketLiftSql =
    """WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM b),
      |ps AS (SELECT l_partkey, count(*) AS n_part FROM b GROUP BY l_partkey),
      |pr AS (SELECT a.l_partkey AS part_a, c.l_partkey AS part_b,
      |         count(*) AS n_both
      |       FROM b a JOIN b c ON a.l_orderkey = c.l_orderkey
      |         AND a.l_partkey < c.l_partkey
      |       GROUP BY part_a, part_b
      |       HAVING count(*) >= 2)
      |SELECT part_a, part_b, n_both, x.n_part AS n_a, y.n_part AS n_b,
      |  n_both * 1.0 / n_orders AS support,
      |  n_both * 1.0 * n_orders / (x.n_part * 1.0 * y.n_part) AS lift
      |FROM pr JOIN ps x ON part_a = x.l_partkey
      |JOIN ps y ON part_b = y.l_partkey, n
      |ORDER BY lift DESC, part_a, part_b LIMIT 20""".stripMargin

  /** Model scoring under the oracle hash gate — the native
    * [[graft.functions.XgbScore]] expression (the engine's rebuild of
    * the reference's booster scoring, streamlit_app.py:717-725) walking
    * a deterministic checked-in ensemble ([[graft.functions.XgbToy]])
    * over a feature projection of the customer table. The trees are
    * data, identical on both sides: Spark scores through the codegen'd
    * tree walk, DuckDB through the same trees unrolled to nested CASE
    * SQL — so the oracle hash pins the walk, the float32 feature
    * rounding, AND the NaN/default_left missing-value routing (every
    * 5th nationkey is nulled to exercise it). Cross-engine floats per
    * QueryDef policy: float-exact split halves, 1/64-multiple leaves
    * (exact f64 margin sum), base margin exactly 0; only the sigmoid is
    * irrational, so the probability carries 6-dp display rounding.
    * Scale shape: pure per-row projection — no shuffle, no UDF, stays
    * inside whole-stage codegen (PlanSpec pins the codegen property).
    */
  def xgbScoreQuery(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    val feats: Seq[org.apache.spark.sql.Column] = Seq(
      col("c_acctbal").cast("float"),
      (col("c_custkey") % 97).cast("float"),
      when(col("c_nationkey") % 5 === 0, lit(null))
        .otherwise(col("c_nationkey")).cast("float"),
      length(col("c_mktsegment")).cast("float"))
    Tables.customer(s, dir)
      .withColumn("score", round(GraftSqlBridge.column(
        graft.functions.XgbScore(
          feats.map(GraftSqlBridge.expression), graft.functions.XgbToy.model)), 6))
      .select("c_custkey", "score")
      .orderBy("c_custkey")
  }

  private val xgbScoreQuerySql = {
    val margin = graft.functions.XgbToy.marginSql(Seq("f0", "f1", "f2", "f3"))
    s"""WITH f AS (
       |  SELECT c_custkey,
       |    CAST(c_acctbal AS REAL) AS f0,
       |    CAST(c_custkey % 97 AS REAL) AS f1,
       |    CASE WHEN c_nationkey % 5 = 0 THEN NULL
       |         ELSE CAST(c_nationkey AS REAL) END AS f2,
       |    CAST(length(c_mktsegment) AS REAL) AS f3
       |  FROM customer)
       |SELECT c_custkey,
       |  round(1.0 / (1.0 + exp(-$margin)), 6) AS score
       |FROM f ORDER BY c_custkey""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q01_pricing_summary", pricingSummary, Some(pricingSummarySql)),
    QueryDef("q02_filter_project", filterProject, Some(filterProjectSql)),
    QueryDef("q03_top_revenue_customers", topRevenueCustomers, Some(topRevenueCustomersSql)),
    QueryDef("q04_region_supplier_rollup", regionSupplierRollup, Some(regionSupplierRollupSql)),
    QueryDef("q05_segment_nps", segmentNps, Some(segmentNpsSql)),
    QueryDef("q06_group_percentiles", groupPercentiles, Some(groupPercentilesSql)),
    QueryDef("q07_status_count_distinct", statusCountDistinct, Some(statusCountDistinctSql)),
    QueryDef("q08_latest_order_per_customer", latestOrderPerCustomer, Some(latestOrderPerCustomerSql)),
    QueryDef("q09_rolling_avg_order_price", rollingAvgOrderPrice, Some(rollingAvgOrderPriceSql)),
    QueryDef("q10_order_price_delta", orderPriceDelta, Some(orderPriceDeltaSql)),
    QueryDef("q11_urgent_semi_anti", urgentSemiAnti, Some(urgentSemiAntiSql)),
    QueryDef("q12_status_priority_rollup", statusPriorityRollup, Some(statusPriorityRollupSql)),
    QueryDef("q13_acctbal_rescaled", acctbalRescaled, Some(acctbalRescaledSql)),
    QueryDef("q14_top_orders", topOrders, Some(topOrdersSql)),
    QueryDef("q15_status_unpivot", statusUnpivot, Some(statusUnpivotSql)),
    QueryDef("q16_status_set_ops", statusSetOps, Some(statusSetOpsSql)),
    QueryDef("q17_status_priority_cube", statusPriorityCube, Some(statusPriorityCubeSql)),
    QueryDef("q18_status_pivot", statusPivot, Some(statusPivotSql)),
    QueryDef("q19_order_price_ranks", orderPriceRanks, Some(orderPriceRanksSql)),
    QueryDef("q20_above_avg_orders", aboveAvgOrders, Some(aboveAvgOrdersSql)),
    QueryDef("q21_brand_promo_share", brandPromoShare, Some(brandPromoShareSql)),
    QueryDef("q22_status_priority_grouping_sets", statusPriorityGroupingSets,
      Some(statusPriorityGroupingSetsSql)),
    QueryDef("q23_top_orders_per_customer", topOrdersPerCustomer,
      Some(topOrdersPerCustomerSql)),
    QueryDef("q24_region_year_revenue", regionYearRevenue, Some(regionYearRevenueSql)),
    QueryDef("q25_exists_not_exists", existsNotExists, Some(existsNotExistsSql)),
    QueryDef("q26_order_share", orderShareOfCustomer, Some(orderShareOfCustomerSql)),
    QueryDef("q27_open_order_backlog", openOrderBacklog, Some(openOrderBacklogSql)),
    QueryDef("q28_small_qty_revenue", smallQtyRevenue, Some(smallQtyRevenueSql)),
    QueryDef("q29_inactive_high_balance", inactiveHighBalance,
      Some(inactiveHighBalanceSql)),
    QueryDef("q30_nation_trade_volume", nationTradeVolume,
      Some(nationTradeVolumeSql)),
    QueryDef("q31_top_supplier_revenue", topSupplierRevenue,
      Some(topSupplierRevenueSql)),
    QueryDef("q32_cheapest_supplier_per_part", cheapestSupplierPerPart,
      Some(cheapestSupplierPerPartSql)),
    QueryDef("q33_sole_returner", soleReturner, Some(soleReturnerSql)),
    QueryDef("q34_numeric_profile", numericProfile, Some(numericProfileSql)),
    QueryDef("q35_decile_lift", decileLift, Some(decileLiftSql)),
    QueryDef("q36_fact_reconciliation", factReconciliation,
      Some(factReconciliationSql)),
    QueryDef("q37_percent_of_parent", percentOfParent, Some(percentOfParentSql)),
    QueryDef("q38_rank_metrics", rankMetricsReport, Some(rankMetricsReportSql)),
    QueryDef("q39_market_share", marketShare, Some(marketShareSql)),
    QueryDef("q40_returned_revenue", returnedRevenue, Some(returnedRevenueSql)),
    QueryDef("q41_xgb_score", xgbScoreQuery, Some(xgbScoreQuerySql)),
    QueryDef("q42_big_orders", bigOrders, Some(bigOrdersSql)),
    QueryDef("q43_order_interarrival", orderInterarrival,
      Some(orderInterarrivalSql)),
    QueryDef("q44_rfm_segments", rfmSegments, Some(rfmSegmentsSql)),
    QueryDef("q45_lorenz_gini", lorenzGini, Some(lorenzGiniSql)),
    QueryDef("q46_basket_lift", basketLift, Some(basketLiftSql)),
    QueryDef("q47_supplier_hhi", supplierHhi, Some(supplierHhiSql)),
  )
}
