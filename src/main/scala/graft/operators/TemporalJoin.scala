package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SCD2 (slowly-changing-dimension type 2) temporal join: attach to each
  * event the dimension VERSION that was valid at the event's time —
  * `valid_from <= t < valid_to`, half-open, with a NULL `valid_to`
  * meaning the open current version. This is the enrichment form every
  * production events pipeline needs (prices, user tiers, experiment
  * arms all change over time; joining today's dim onto last year's
  * events is silent corruption).
  *
  * Batch shape: the [[AsOfJoin]] union+window recipe — ONE shuffle on
  * the key + one per-key sort attaches the latest version with
  * `valid_from <= t`, then a residual check nulls the attachment when
  * that version had already EXPIRED at t (a gap, or an event after the
  * final closed version). Never a range join: cost is independent of how
  * many versions precede an event, so a dimension with millions of
  * versions per hot key costs the same one window pass.
  *
  * Contract: versions of one key must not overlap (the SCD2 invariant:
  * `valid_to(k) <= valid_from(k+1)`); under it, "latest valid_from ≤ t,
  * still live at t" IS the unique covering version, which is what a
  * naive interval join returns — the spec pins that equivalence,
  * boundary ties (an event exactly at a version boundary belongs to the
  * NEWER version) and gap/expiry semantics included. The invariant is
  * NOT checked at runtime (it would cost a dim-wide window pass per
  * call): duplicate (key, valid_from) rows multiply matched event rows
  * through the payload join-back — a corrupted dim corrupts the output
  * here exactly as it would under a naive interval join.
  *
  * Open-version encoding: NULL `valid_to` natively; dims that encode
  * the open tail with a non-null sentinel instead (e.g. the −1 that
  * `q_scd2_build` emits to keep its output column non-nullable) pass it
  * as `openSentinel` and the join treats that value as open — without
  * it, a −1 valid_to would mark every open version as expired since
  * before the epoch.
  *
  * Stream-static shape ([[scd2Stream]]): the dimension is static per
  * micro-batch, so the join is a plain stream-static LEFT join with the
  * interval predicate — no watermark, no state, the stream never
  * buffers; Spark broadcasts the dim when it fits and shuffle-joins
  * otherwise (the `EventsStream.enriched` posture). Each event matches
  * at most one version under the invariant, so no post-dedup is needed.
  */
object TemporalJoin {

  /** @param events      fact side
    * @param dim         versioned dimension (one row per key × version)
    * @param eventKey    join key column on the events side
    * @param dimKey      join key column on the dim side
    * @param eventTime   event-time column (timestamp or epoch long)
    * @param validFrom   version start (inclusive, epoch long)
    * @param validTo     version end (exclusive, epoch long; null = open)
    * @param payloadCols dim columns carried to the output as `asof_<c>`
    *                    (nulled when no version covers the event)
    * @param openSentinel non-null `validTo` value that ALSO means an open
    *                    version (e.g. −1 from `q_scd2_build`) */
  def scd2(events: DataFrame, dim: DataFrame,
           eventKey: String, dimKey: String, eventTime: String,
           validFrom: String, validTo: String,
           payloadCols: Seq[String],
           openSentinel: Option[Long] = None): DataFrame = {
    // the as-of pass carries ONLY non-null structural columns: an open
    // version's null valid_to (or a legitimately-null payload value)
    // would otherwise be skipped by the window's ignoreNulls carry and
    // BLEED the previous version's value forward. valid_to travels as a
    // MaxValue-sentinel; payloads are attached afterwards by an exact
    // (key, valid_from) equi-join back to the dim — dim-sized, tiny next
    // to the event shuffle the window pass already pays.
    val vtS = "_scd2_vt"
    val dimS = dim.withColumn(vtS,
      coalesce(openNulled(col(validTo), openSentinel).cast("long"),
        lit(Long.MaxValue)))
    val joined = AsOfJoin.backward(events, dimS, eventKey, dimKey,
      eventTime, validFrom, Seq(validFrom, vtS), rightOrder = validFrom)
    // the attached version covers t only while still live at t
    val covered = col(s"asof_$validFrom").isNotNull &&
      col(eventTime).cast("long") < col(s"asof_$vtS")
    val anchored = joined
      .withColumn(s"asof_$validFrom", when(covered, col(s"asof_$validFrom")))
      .drop(s"asof_$vtS")
    val back = (payloadCols :+ validTo).foldLeft(
        dim.withColumnRenamed(dimKey, "_scd2_dk")
          .withColumnRenamed(validFrom, "_scd2_vf"))(
        (df, c) => df.withColumnRenamed(c, s"asof_$c"))
      .select(("_scd2_dk" +: "_scd2_vf" +: (payloadCols :+ validTo).map(c => s"asof_$c")).map(col): _*)
    anchored.join(back,
        col(eventKey) === col("_scd2_dk") &&
          col(s"asof_$validFrom") === col("_scd2_vf"), "left")
      .drop("_scd2_dk", "_scd2_vf")
  }

  /** The per-micro-batch stream-static form: same output columns and
    * null semantics as [[scd2]] for a static `dim`. */
  def scd2Stream(events: DataFrame, dim: DataFrame,
                 eventKey: String, dimKey: String, eventTime: String,
                 validFrom: String, validTo: String,
                 payloadCols: Seq[String],
                 openSentinel: Option[Long] = None): DataFrame = {
    val carried = payloadCols ++ Seq(validFrom, validTo)
    val right = carried.foldLeft(dim.select((dimKey +: carried).map(col): _*))(
      (df, c) => df.withColumnRenamed(c, s"asof_$c"))
    val t = events(eventTime).cast("long")
    val vt = openNulled(col(s"asof_$validTo"), openSentinel)
    events.join(right,
        events(eventKey) === right(dimKey) &&
        t >= col(s"asof_$validFrom") &&
        (vt.isNull || t < vt),
        "left_outer")
      .drop(right(dimKey))
  }

  /** `validTo` with the configured open-version sentinel mapped to NULL
    * (the native open encoding) — identity when no sentinel is set. */
  private def openNulled(c: Column, openSentinel: Option[Long]): Column =
    openSentinel.fold(c)(s => when(c === s, lit(null)).otherwise(c))
}
