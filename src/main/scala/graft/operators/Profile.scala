package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling (SURVEY §2.3) — the data-quality sweep a pipeline runs
  * before trusting a new table: per column, row/null/distinct counts and
  * min/max rendered as strings (heterogeneous columns, one schema).
  *
  * One wide aggregate computes every metric in a single pass (the
  * multiple exact `countDistinct`s share one Expand — data is read once);
  * the per-column pivot happens on the resulting SINGLE row via `stack`,
  * so the unpivot costs nothing at any input size.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "Profile.profile: no columns given")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c => Seq(
      sum(col(c).isNull.cast("long")).as(s"${c}__nulls"),
      countDistinct(col(c)).as(s"${c}__nd"),
      min(col(c)).cast("string").as(s"${c}__min"),
      max(col(c)).cast("string").as(s"${c}__max")) }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', ${c}__nulls, ${c}__nd, ${c}__min, ${c}__max"
    }.mkString(", ")
    one.selectExpr("__n",
        s"stack(${cols.size}, $stackArgs) AS (col_name, n_nulls, n_distinct, min_val, max_val)")
      .select(col("col_name"), col("__n").as("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_val"), col("max_val"))
      .orderBy(col("col_name"))
  }
}
