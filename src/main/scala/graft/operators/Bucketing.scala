package graft.operators

import org.apache.spark.sql.DataFrame

/** Bucketed-table co-location (SURVEY §4.1 partitioning row; the 100 TB
  * join posture for repeated fact-fact joins): writing both sides
  * bucketed AND sorted by the join key lets every subsequent equi-join on
  * that key run with NO exchange and NO sort — each task zips bucket i of
  * one table with bucket i of the other. The shuffle is paid once at
  * write time instead of once per join, which is the right trade whenever
  * a join key is hot (fact-to-fact joins in a star schema, repeated
  * training-data joins on document id).
  *
  * Bucket count sizing at scale: buckets ≈ total data / target partition
  * size (e.g. 100 TB / 256 MB ≈ 400k buckets is too many files — prefer
  * table-level bucket counts in the thousands and let multiple keys share
  * a bucket; bucket pruning on point lookups is a free bonus).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted parquet table in the session catalog.
    * Joins between two tables written with the SAME key and bucket count
    * are exchange-free (asserted in BucketingSpec).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)
}
