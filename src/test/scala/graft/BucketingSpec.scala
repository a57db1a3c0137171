package graft

import graft.operators.Bucketing
import org.apache.spark.sql.functions._

/** Proves the bucketing co-location claim on physical plans: a join
  * between two tables bucketed+sorted on the join key runs with no
  * shuffle exchange and no sort, and returns the same rows as the
  * shuffled join.
  */
class BucketingSpec extends SparkSpec {

  /** The in-memory catalog is fresh per JVM but managed-table LOCATIONS
    * persist on disk — drop both, or a rerun hits LOCATION_ALREADY_EXISTS.
    */
  private def resetTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    val dir = new java.io.File(wh, name)
    if (dir.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(dir)
    }
  }

  test("join between same-key bucketed tables is exchange-free and correct") {
    resetTable("orders_b"); resetTable("lineitem_b")
    Bucketing.writeBucketed(
      Tables.orders(spark, sf0001).select("o_orderkey", "o_custkey", "o_totalprice"),
      "orders_b", "o_orderkey", 8)
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sf0001).select(col("l_orderkey"), col("l_quantity")),
      "lineitem_b", "l_orderkey", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
      joined.collect() // AQE finalizes the plan at execution
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan) // co-located: no shuffle either side
      assert(plan.contains("SortMergeJoin"), plan)
      // and the result equals the ordinary shuffled join
      val expected = Tables.orders(spark, sf0001)
        .join(Tables.lineitem(spark, sf0001), col("o_orderkey") === col("l_orderkey"))
        .count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
