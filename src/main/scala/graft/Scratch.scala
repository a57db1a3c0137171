package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe (deleted before final commit rounds). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val ev = spark.read.parquet(s"$d/events.parquet")
      .withColumn("ts", timestamp_micros(col("ts") / lit(1000L) cast "long"))
    ev.printSchema()
    println(ev.select(col("event_id"), col("ts"), unix_micros(col("ts")).as("us"))
      .limit(3).collect().mkString(" | "))
    val em = spark.read.parquet(s"$d/embeddings.parquet")
    em.printSchema()
    println(em.selectExpr("vec_id", "round(aggregate(zip_with(embedding, embedding, (x,y)->cast(x as double)*y), 0.0D, (a,x)->a+x), 6) as norm2")
      .limit(3).collect().mkString(" | "))
    // percentile + weekday availability probe
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    println(li.selectExpr("percentile(l_quantity, 0.95) as p95").collect().mkString)
    println(spark.read.parquet(s"$d/orders.parquet")
      .selectExpr("weekday(o_orderdate) wd", "dayofweek(o_orderdate) dow").limit(2).collect().mkString(" | "))
    spark.stop()
  }
}
