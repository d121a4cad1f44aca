package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.QueryModule

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory each
  * entry maps to. Query modules live under [[graft.queries]]; each exposes
  * a `queries` map (Spark plans) and an `oracles` map (equivalent DuckDB
  * SQL, omitted for sketch-based rows-only ops).
  */
object SparkEntry {
  private val modules: Seq[QueryModule] = Seq(
    graft.queries.Analytics,
    graft.queries.TpchFull,
    graft.queries.NamespaceQueries,
    graft.queries.TextQueries,
    graft.queries.VectorQueries,
    graft.queries.MultimodalQueries,
    graft.queries.FsImageQueries,
    graft.queries.PipelineQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Analytics.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}
