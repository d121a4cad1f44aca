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

  /** Skew-mitigating inner equi-join for when AQE can't help (both sides
    * too large to broadcast, one sort-merge reducer drowning in a handful
    * of hot keys): each LEFT row of a hot key gets a random salt in
    * [0, replicas); the RIGHT side's hot-key rows are replicated once per
    * salt value (explode — right side's hot slice must be the smaller
    * one, the usual fact⋈dim skew). Non-hot keys join unsalted, so the
    * only cost is `replicas`× duplication of the right side's hot rows.
    * Result is row-identical to `left.join(right, keys)` for any salt.
    *
    * @param hotKeys the skewed key values (from a cheap pre-count or
    *                known domain knowledge); keep it small — it travels
    *                as a literal filter
    */
  def skewJoin(left: DataFrame, right: DataFrame, key: String,
               hotKeys: Seq[Any], replicas: Int = 16): DataFrame = {
    require(replicas > 0)
    val hot = col(key).isin(hotKeys: _*)
    val lSalt = when(hot,
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(replicas)))
      .otherwise(lit(0)).cast("int").as("_salt")
    val rSalt = explode(when(hot, sequence(lit(0), lit(replicas - 1)))
      .otherwise(array(lit(0)))).as("_salt")
    val l = left.withColumn("_salt", lSalt)
    val r = right.select(col("*"), rSalt)
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}
