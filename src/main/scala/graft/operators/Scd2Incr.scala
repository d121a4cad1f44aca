package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental SCD2 dimension MAINTENANCE — the `d_minhash_incr` posture
  * for dimensions: apply a batch of NEW daily activity to an EXISTING
  * versioned dim (the `q_scd2_build` output shape) without rebuilding
  * history. Closed versions pass through untouched; each affected user's
  * OPEN version either absorbs same-tier new days (n_days/spend_c grow,
  * boundaries keep) or closes at the first day whose tier moved, with
  * the new versions appended — exactly the gaps-and-islands compaction
  * the full build would produce, so incremental ≡ rebuild bit-for-bit
  * (spec-pinned, and `q_scd2_incr`'s oracle IS the full rebuild).
  *
  * Scale shape: cost is one dim-sized semi/anti-join split plus windows
  * keyed on the AFFECTED users only — the seed∪delta tail is
  * O(affected open versions + delta rows), never history-sized. At
  * 100 TB the event history is the thing you cannot re-scan daily; the
  * dim (one row per entity version) and one day of deltas are the things
  * you can.
  *
  * Contract (unchecked, documented — the [[TemporalJoin]] posture):
  *  - `dim` is a valid `q_scd2_build` output: per user, non-overlapping
  *    versions with day-aligned epoch-second boundaries
  *    (`valid_from` = day·86400), adjacent versions differing in `tier`,
  *    exactly one OPEN tail (`valid_to` = `openSentinel`) per user.
  *  - `deltaDaily` is day-aggregated (one row per user × day, columns
  *    `user_id`, `day`, `spend_c`) and STRICTLY after history: every
  *    delta day > the user's open-version start day. Out-of-order
  *    deltas need the rebuild, not the increment.
  *  - `tierExpr` is a SQL expression over the running cumulative-spend
  *    column `cum_c`; callers share the literal string with their build
  *    so the two plans can't drift.
  */
object Scd2Incr {

  def applyDailyDelta(dim: DataFrame, deltaDaily: DataFrame,
                      tierExpr: String,
                      openSentinel: Long = -1L): DataFrame = {
    val affected = deltaDaily.select(col("user_id")).distinct()
    val dimA = dim.join(affected, Seq("user_id"), "left_semi")
    val dimU = dim.join(affected, Seq("user_id"), "left_anti")
    // prior cumulative spend = the dim's own version totals — the reason
    // the increment never re-reads event history
    val cumPrev = dimA.groupBy(col("user_id"))
      .agg(sum(col("spend_c")).as("_prev_c"))
    val open = dimA.filter(col("valid_to") === openSentinel)
    val closed = dimA.filter(col("valid_to") =!= openSentinel)
    val wD = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val deltaT = deltaDaily
      .join(cumPrev, Seq("user_id"), "left") // left: brand-new users
      .withColumn("cum_c",
        coalesce(col("_prev_c"), lit(0L)) + sum(col("spend_c")).over(wD))
      .select(col("user_id"), col("day"), expr(tierExpr).as("tier"),
        lit(1L).as("n_days"), col("spend_c"))
    // the open version seeds the islands pass carrying its accumulated
    // n_days/spend_c, so a same-tier delta day MERGES into it
    val seed = open.select(col("user_id"),
      expr("valid_from div 86400").as("day"),
      col("tier"), col("n_days"), col("spend_c"))
    val wU = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val rebuilt = seed.unionByName(deltaT)
      .withColumn("chg",
        when(lag(col("tier"), 1).over(wU).isNull ||
          lag(col("tier"), 1).over(wU) =!= col("tier"), 1L).otherwise(0L))
      .withColumn("ver", sum(col("chg")).over(wU))
      .groupBy(col("user_id"), col("ver"))
      .agg(min(col("day")).as("from_day"), max(col("tier")).as("tier"),
        sum(col("n_days")).as("n_days"), sum(col("spend_c")).as("spend_c"))
    val wV = Window.partitionBy(col("user_id")).orderBy(col("from_day"))
    val tail = rebuilt
      .withColumn("valid_from", col("from_day") * 86400)
      .withColumn("valid_to",
        coalesce(lead(col("from_day"), 1).over(wV) * 86400, lit(openSentinel)))
      .select(col("user_id"), col("valid_from"), col("valid_to"),
        col("tier"), col("n_days"), col("spend_c"))
    dimU.unionByName(closed).unionByName(tail)
  }
}
