package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigating two-stage aggregation (SURVEY §5): spread each hot key
  * over `saltBuckets` partial groups, then merge. Stage 1 shuffles on
  * (keys, salt) — a hot key's rows land on `saltBuckets` reducers instead
  * of one; stage 2 merges the tiny partial table. Complements AQE's
  * skew-join handling for aggregation-side skew.
  *
  * Sums/counts re-merge with sum; min/max with themselves. Not applicable
  * to non-decomposable aggregates (exact distinct, medians).
  */
object Salted {

  /** count + Σ of `valueCols` per `keys`, salted. Result is identical to
    * `df.groupBy(keys).agg(count, sum(value)…)` for any salt. */
  def groupSum(df: DataFrame, keys: Seq[String], valueCols: Seq[String],
               saltBuckets: Int = 16): DataFrame = {
    require(saltBuckets > 0)
    val salt = pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)).as("_salt")
    val partialAggs = count(lit(1)).as("_n") +: valueCols.map(c => sum(col(c)).as(s"_sum_$c"))
    val mergeAggs = sum(col("_n")).as("n_rows") +: valueCols.map(c => sum(col(s"_sum_$c")).as(s"sum_$c"))
    df.select((keys.map(col) :+ salt) ++ valueCols.map(col): _*)
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(mergeAggs.head, mergeAggs.tail: _*)
  }
}
