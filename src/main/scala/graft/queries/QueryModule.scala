package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A bundle of named queries plus their DuckDB oracle SQL (SURVEY §6).
  * Keys in [[oracles]] must be a subset of keys in [[queries]]; queries
  * without an oracle get the driver's weaker rows-only check. */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
