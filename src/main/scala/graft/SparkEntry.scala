package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Relational, Temporal}
import graft.ext.{Multimodal, RetrievalIndex, TextIndex, TextOps, VectorIndex, VectorOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator claimed in SURVEY.md §2 is registered here twice: a Spark
  * implementation in `queries` and (when SQL-expressible) a DuckDB oracle in
  * `oracleSql` with IDENTICAL column aliases and rounding, so the driver's
  * hash compare is engine-stable.
  */
object SparkEntry {

  def allQueries: Seq[QueryDef] =
    Relational.defs ++ Temporal.defs ++ TextOps.defs ++ TextIndex.defs ++
      RetrievalIndex.defs ++ VectorOps.defs ++ VectorIndex.defs ++
      Multimodal.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
