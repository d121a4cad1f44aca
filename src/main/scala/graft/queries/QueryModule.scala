package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A bundle of named queries plus their DuckDB oracle SQL (SURVEY §6).
  * Keys in [[oracles]] must be a subset of keys in [[queries]]; queries
  * without an oracle get the driver's weaker rows-only check. */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}

object QueryModule {
  /** Map-side unordered-pair expansion over a SORTED distinct array:
    * all (a, b) with a before b, as structs — the bounded
    * O(array-size²)-per-row shape that replaces a corpus self-join in
    * `q_basket_pairs` and `t_term_lift`. The lambda index is 0-based
    * while slice is 1-based, hence i + 2 for "strictly after x". */
  private[queries] def sortedPairs(arr: Column): Column =
    flatten(transform(arr, (x, i) =>
      transform(slice(arr, i + 2, size(arr)),
        y => struct(x.as("a"), y.as("b")))))
}
