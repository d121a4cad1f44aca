package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Structured Streaming surface (SURVEY §2.5): the streaming form of the
  * events analytics. Batch mirror = `q_events_windowed` (same aggregates,
  * so the oracle checks the semantics; the streaming spec checks the
  * incremental execution against the batch result).
  */
object EventsStream {

  /** Tumbling-window counts with a watermark: late events beyond the
    * watermark are dropped, state is bounded — the 100 TB/day posture
    * (state size ∝ windows in flight × event types, not events). */
  def windowedCounts(events: DataFrame,
                     watermark: String = "1 hour",
                     windowLen: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(floor(col("value") * 100).cast("long")).as("sum_value_c"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"), col("sum_value_c"))

  /** Gap-session aggregation via the BUILT-IN `session_window` — the
    * declarative twin of the custom [[sessionize]] processor: Catalyst
    * owns the session merge/expiry state machine (sessions merge when
    * events land within the gap, close when the watermark passes), so
    * this is the plan to prefer whenever per-session output = plain
    * aggregates; the custom GroupState path earns its keep only for
    * semantics aggregates can't express. Window end = last event + gap
    * (the built-in's contract — differs from [[sessionize]]'s end = last
    * event, by exactly the gap). State bounded by open sessions. */
  def sessionWindowAgg(events: DataFrame,
                       gap: String = "30 minutes",
                       watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("start"),
        col("session_window.end").as("end"), col("n_events"))

  /** Running per-user event counters via stateful aggregation — streaming
    * upsert (Update mode) keyed by user; state is one row per user. */
  def userActivity(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           max(col("ts")).as("last_seen"))

  /** Streaming exact dedup: drop re-deliveries of the same event id within
    * the watermark horizon — the streaming face of the batch dedup ops
    * (state = ids seen inside the watermark window, bounded). */
  def dedupedEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Watermarked stream-stream interval join (impression→click
    * attribution shape): each click joins the same user's impressions from
    * the preceding `joinWindowSec`. Both sides carry watermarks and the
    * join condition bounds event time on both ends, so the join state
    * Spark keeps per side is bounded by watermark + window — the 100 TB/day
    * posture (state ∝ in-flight window, not stream history). */
  def intervalJoin(impressions: DataFrame, clicks: DataFrame,
                   watermark: String = "1 hour",
                   joinWindowSec: Long = 1800): DataFrame =
    intervalJoinWith(impressions, clicks, watermark, joinWindowSec, "inner")

  /** LEFT OUTER stream-stream interval join — the attribution
    * COMPLETENESS form: every impression emits, matched rows as they
    * join, UNMATCHED impressions with null click columns once the
    * watermark has passed the end of their join window (only then can
    * Spark prove no click is still coming — the null-emission timing
    * contract the spec pins). State stays bounded exactly as the inner
    * form: both sides watermarked, the time-range condition bounds what
    * each side buffers. This is the standard "which impressions never
    * converted" readout an inner join silently drops. */
  def intervalJoinOuter(impressions: DataFrame, clicks: DataFrame,
                        watermark: String = "1 hour",
                        joinWindowSec: Long = 1800): DataFrame =
    intervalJoinWith(impressions, clicks, watermark, joinWindowSec, "left_outer")

  /** FULL OUTER stream-stream interval join — the rest of the
    * attribution-completeness family after [[intervalJoinOuter]]:
    * unmatched rows on BOTH sides. Unmatched impressions (never
    * converted) emit with null click columns once the watermark passes
    * the end of their join window; unmatched CLICKS — orphan clicks with
    * no impression in the preceding window: lost exposure logs,
    * cross-device journeys, click fraud — emit with null impression
    * columns once the watermark proves no qualifying impression can
    * still arrive (the range condition bounds imp_ts ∈
    * [click_ts − window, click_ts], so the click's expiry is its own
    * timestamp horizon). `user_id` is coalesced across sides so orphan
    * clicks keep their key. State bounded exactly as the inner form;
    * the spec pins the null-emission timing on BOTH sides plus batch
    * full-join equality. */
  def intervalJoinFullOuter(impressions: DataFrame, clicks: DataFrame,
                            watermark: String = "1 hour",
                            joinWindowSec: Long = 1800): DataFrame =
    intervalJoinWith(impressions, clicks, watermark, joinWindowSec, "full_outer")

  /** RIGHT OUTER stream-stream interval join — [[intervalJoinFullOuter]]
    * restricted to the click side: every click emits (matched rows as
    * they join, orphan clicks with null impression columns at watermark
    * expiry) while never-converted impressions are dropped — the
    * click-ledger reconciliation readout ("every click accounted for,
    * attributed or explicitly orphaned") when impression completeness
    * is someone else's report. Same bounded state and key coalesce. */
  def intervalJoinRightOuter(impressions: DataFrame, clicks: DataFrame,
                             watermark: String = "1 hour",
                             joinWindowSec: Long = 1800): DataFrame =
    intervalJoinWith(impressions, clicks, watermark, joinWindowSec, "right_outer")

  private def intervalJoinWith(impressions: DataFrame, clicks: DataFrame,
                               watermark: String, joinWindowSec: Long,
                               joinType: String): DataFrame = {
    val imp = impressions
      .select(col("user_id"), col("ts").as("imp_ts"), col("value").as("imp_value"))
      .withWatermark("imp_ts", watermark)
    val clk = clicks
      .select(col("user_id").as("click_user"), col("ts").as("click_ts"),
        col("value").as("click_value"))
      .withWatermark("click_ts", watermark)
    imp.join(clk,
      col("user_id") === col("click_user") &&
      col("click_ts") >= col("imp_ts") &&
      col("click_ts") <= col("imp_ts") + expr(s"INTERVAL $joinWindowSec SECONDS"),
      joinType)
      // full outer: right-unmatched rows carry their key only on the click
      // side (identity for inner/left, where user_id is always populated)
      .withColumn("user_id", coalesce(col("user_id"), col("click_user")))
      .drop("click_user")
  }

  /** Stream-static enrichment: join the event stream against a static
    * dimension table (user → segment). The static side is planned per
    * micro-batch as an ordinary batch join — Spark broadcasts it when it
    * fits `autoBroadcastJoinThreshold` and shuffle-joins otherwise (no
    * forced hint: a 100 M-user dim must not be collected to the driver) —
    * and needs no watermark or state; the streaming side never buffers. */
  def enriched(events: DataFrame, userDim: DataFrame): DataFrame =
    events.join(userDim, Seq("user_id"), "left")

  /** SCD2 stream-static enrichment: each arriving event joins the dim
    * VERSION valid at its event time (`valid_from <= t < valid_to`,
    * null valid_to = open) — [[graft.operators.TemporalJoin.scd2Stream]]
    * applied to the events stream. Same no-state/no-watermark posture as
    * [[enriched]]: the dim is planned per micro-batch, a version
    * expiring mid-stream simply stops matching newer events (spec:
    * stream ≡ batch incl. the mid-stream expiry). */
  def scd2Enriched(events: DataFrame, versionedDim: DataFrame,
                   payloadCols: Seq[String]): DataFrame =
    graft.operators.TemporalJoin.scd2Stream(events, versionedDim,
      "user_id", "dim_user", "ts", "valid_from", "valid_to", payloadCols)

  /** SCD2 enrichment against a CHANGING dimension — the production shape
    * [[scd2Enriched]] is one variant short of: that form plans the dim
    * ONCE for the query's lifetime, so a version inserted after the
    * stream starts never matches until a restart. Here the dim is
    * re-loaded at the start of EVERY micro-batch (foreachBatch + a
    * caller-supplied loader, typically `() => spark.read.parquet(dimDir)`
    * — a fresh read each batch, so an appended or rewritten dim snapshot
    * is picked up immediately). Inside one micro-batch the dim is
    * static, so the join is the identical no-state/no-watermark interval
    * join ([[graft.operators.TemporalJoin.scd2Stream]]); nothing
    * buffers, and the per-batch premium over [[scd2Enriched]] is exactly
    * one dim re-read + re-plan. At 100 TB the dim loader points at a
    * bucketed/compacted SCD2 table and the re-read is a snapshot listing,
    * not a scan. Exactly-once is the sink's contract, as in any
    * foreachBatch pipeline (`sink` receives each enriched batch with its
    * replay-stable batch id). */
  def scd2EnrichedReloading(events: DataFrame, loadDim: () => DataFrame,
                            payloadCols: Seq[String],
                            trigger: Option[org.apache.spark.sql.streaming.Trigger] = None)
                           (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        sink(graft.operators.TemporalJoin.scd2Stream(batch.toDF(), loadDim(),
          "user_id", "dim_user", "ts", "valid_from", "valid_to", payloadCols),
          batchId)
      }
    trigger.fold(w)(w.trigger).start()
  }

  /** Streaming incremental report maintenance — the edit-log-tailing shape
    * of the §2.2 incremental family: a STREAM of
    * [[graft.operators.Reports.namespaceDiff]] rows (what a namenode
    * edit-log tailer or per-image diff job emits) maintains the running
    * per-owner (d_files, d_size) delta with the IDENTICAL batch plan —
    * [[graft.operators.Reports.summaryDelta]] is pure
    * filter/union/groupBy-sum, so Spark runs it as a streaming
    * aggregation whose state is keyed by the bounded owner domain
    * (update/complete mode; no watermark — deltas only ever accumulate,
    * nothing retracts). Serve time folds the maintained delta into the
    * stored before-summary with
    * [[graft.operators.Reports.applySummaryDelta]] — O(|owners|) per
    * refresh, the after image never re-aggregated. */
  def maintainedSummaryDelta(diffStream: DataFrame): DataFrame =
    graft.operators.Reports.summaryDelta(diffStream)

  /** Stream-vs-corpus Bloom gate — incremental-ingest dedup: flag arriving
    * rows whose fingerprint is (probably) already in a static corpus. The
    * corpus travels as [[graft.operators.Dedup.bloomMask]]'s single-row
    * bitmask (≈8 KiB at the default 2^16 bits), joined per micro-batch on
    * a constant key (broadcast); membership is per-row bit arithmetic —
    * no state, no shuffle, and the corpus itself is never scanned per
    * batch. False positives possible (the classic Bloom trade, tune
    * numBits), false negatives impossible. Rows must carry an `fp` column
    * (e.g. md5 of the dedup key). */
  def bloomGated(stream: DataFrame, mask: DataFrame,
                 numBits: Int = 1 << 16, numHashes: Int = 4): DataFrame =
    stream.withColumn("_one", lit(1))
      .join(mask.withColumn("_one", lit(1)), "_one")
      .withColumn("bloom_dup", graft.operators.Dedup
        .bloomHit(col("fp"), col("mask"), numBits, numHashes).cast("int"))
      .drop("_one", "mask")

  case class LshVerdict(doc_id: Long, dup_of: Long, n_bands: Long, is_dup: Int)
  // not private: the codegen'd row deserializer must instantiate it
  case class BandHit(doc_id: Long, dup_of: Option[Long])

  /** Streaming FUZZY-dedup gate — the banded-MinHash upgrade of
    * [[bloomGated]]'s exact gate: each arriving document computes its
    * LSH band keys PER ROW (12/rowsPerBand of them, conf-driven —
    * higher-order array expressions,
    * `VectorQueries.minhashBandKeys` — no groupBy, stateless), probes the
    * persisted corpus band index with a stream-static left equi-join on
    * (band, bh), and emits one verdict per doc: the corpus doc sharing
    * the most bands (ties → smallest id), exactly the batch
    * `d_minhash_incr` contract (spec-asserted row-for-row across uneven
    * micro-batch splits). The per-doc argmax runs in
    * `flatMapGroupsWithState` with ZERO retained state — a doc's band
    * rows all live in its own micro-batch, so the group closes
    * immediately; total state is bounded at nothing, forever. At scale
    * the index is a (band, bh)-bucketed table the join prunes to probed
    * buckets; a re-delivered doc id re-emits its (identical) verdict. */
  def lshGated(stream: DataFrame, corpusIndex: DataFrame): Dataset[LshVerdict] = {
    val spark = stream.sparkSession
    import spark.implicits._
    // banding is conf-driven (spark.graft.lsh.rowsPerBand) so the probe
    // keys always match the index the batch chain built in THIS session
    val bands = stream.select(col("doc_id"),
        explode_outer(graft.queries.VectorQueries.minhashBandKeys(col("text"),
          graft.queries.VectorQueries.lshRowsPerBand(spark))).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bh").as("bh"))
    val probed = bands.join(
      corpusIndex.select(col("doc_id").as("dup_of"), col("band"), col("bh")),
      Seq("band", "bh"), "left")
    def step(doc: Long, rows: Iterator[BandHit],
             state: GroupState[Int]): Iterator[LshVerdict] = {
      val counts = scala.collection.mutable.Map[Long, Long]()
      rows.foreach(_.dup_of.foreach(c => counts(c) = counts.getOrElse(c, 0L) + 1))
      if (counts.isEmpty) Iterator(LshVerdict(doc, -1L, 0L, 0))
      else {
        val (dupOf, nb) = counts.minBy { case (d, n) => (-n, d) }
        Iterator(LshVerdict(doc, dupOf, nb, 1))
      }
    }
    probed.select(col("doc_id"), col("dup_of")).as[BandHit]
      .groupByKey(_.doc_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(step)
  }

  case class PurchaseEvent(user_id: Long, event_id: Long, ts: Timestamp, v_c: Long)
  case class EwmaState(ewma_c: Long, n: Long)
  case class EwmaAlert(user_id: Long, event_id: Long, v_c: Long,
                       ewma_prev_c: Long, is_anomaly: Int)

  /** Streaming per-user EWMA anomaly gate — the recursive form of the
    * batch `q_ewma_anomaly` smoother: α = 1/2 folds each purchase into
    * O(1) per-user state as ewma′ = (ewma + v) div 2, EXACT dyadic
    * integers (truncating long division, the batch/oracle division
    * contract), and every purchase is judged against the PRE-update
    * smoothed value (> 2× ⇒ anomaly; a user's first purchase has no
    * history and reports the −1 sentinel, never a flag). Append mode:
    * one verdict row per purchase. Within a micro-batch each user's
    * rows fold in (ts, event_id) order, so any batching of an in-order
    * stream produces the identical alert sequence (split-invariance
    * spec). State is two longs per user FOREVER — the per-key synopsis
    * posture that survives unbounded streams. */
  def ewmaGated(events: DataFrame): Dataset[EwmaAlert] = {
    val spark = events.sparkSession
    import spark.implicits._
    def step(user: Long, rows: Iterator[PurchaseEvent],
             state: GroupState[EwmaState]): Iterator[EwmaAlert] = {
      var s = state.getOption.getOrElse(EwmaState(0L, 0L))
      val out = rows.toArray.sortBy(r => (r.ts.getTime, r.event_id)).map { r =>
        val prev = if (s.n == 0) -1L else s.ewma_c
        val flag = if (s.n > 0 && r.v_c > 2 * prev) 1 else 0
        s = EwmaState(if (s.n == 0) r.v_c else (s.ewma_c + r.v_c) / 2, s.n + 1)
        EwmaAlert(user, r.event_id, r.v_c, prev, flag)
      }
      state.update(s)
      out.iterator
    }
    events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"),
        floor(col("value") * 100).cast("long").as("v_c"))
      .as[PurchaseEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(step)
  }

  case class KeyedId(event_type: String, user_id: Long)
  case class KmvState(hs: Array[Long])
  case class KmvRow(event_type: String, n_seen: Long, n_est: Long)

  /** The batch KMV hash recipe (`Analytics.qKmvDistinct`), verbatim:
    * first 12 hex chars of md5("kmv_" + id) = the first 6 digest bytes
    * big-endian as a 48-bit long — computed with byte math (no hex
    * string), and the digest instance is caller-supplied so the
    * streaming hot path pays one allocation per micro-batch group, not
    * one per event row. */
  private[streaming] def kmvHash(md: java.security.MessageDigest, id: Long): Long = {
    md.reset()
    val d = md.digest(s"kmv_$id".getBytes("UTF-8"))
    ((d(0) & 0xFFL) << 40) | ((d(1) & 0xFFL) << 32) | ((d(2) & 0xFFL) << 24) |
      ((d(3) & 0xFFL) << 16) | ((d(4) & 0xFFL) << 8) | (d(5) & 0xFFL)
  }

  private[streaming] def kmvHash(id: Long): Long =
    kmvHash(java.security.MessageDigest.getInstance("MD5"), id)

  /** Streaming distinct-count via a KMV sketch in group state — the
    * unbounded-cardinality counterpart of the exact `userActivity`
    * aggregation: per event type the state holds only the k smallest
    * distinct 48-bit hashes (bounded at k longs FOREVER, however many
    * users stream past — the property that makes streaming distinct
    * viable at all), and each micro-batch folds its new hashes in with
    * the same KMV union algebra `q_kmv_merge_rollup` proves against the
    * batch oracle. Update-mode: one running-estimate row per type per
    * batch. The hash recipe is the batch one verbatim, so the converged
    * estimate equals the batch sketch on the same data exactly. */
  def kmvDistinct(events: DataFrame, k: Int = 64): Dataset[KmvRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    def step(key: String, rows: Iterator[KeyedId],
             state: GroupState[KmvState]): KmvRow = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val cur = state.getOption.map(_.hs).getOrElse(Array.empty[Long])
      val merged = (cur ++ rows.map(r => kmvHash(md, r.user_id)))
        .distinct.sorted.take(k)
      state.update(KmvState(merged))
      val nEst = if (merged.length < k) merged.length.toLong
                 else (k - 1).toLong * (1L << 48) / merged.last
      KmvRow(key, merged.length, nEst)
    }
    events.select(col("event_type"), col("user_id")).as[KeyedId]
      .groupByKey(_.event_type)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(step)
  }

  case class BitmapState(words: Map[Long, Long])
  case class BitmapRow(event_type: String, n_words: Long, n_distinct: Long)

  /** Streaming EXACT distinct via bitmap words in group state — the
    * streaming twin of the batch `q_bitmap_distinct` (ClickHouse/Druid
    * groupBitmap): per event type the state holds word-indexed 63-bit
    * OR-masks (word = id div 63), so the count is bit-exact however the
    * stream is batched or re-delivered (OR is idempotent — the
    * exactly-once-free dedup property). State is O(distinct ids / 63) —
    * the exact counterpart for BOUNDED/dense id domains; for unbounded
    * cardinality use [[kmvDistinct]]'s constant-state sketch instead.
    * Word width 63 matches the batch/oracle contract (see
    * `Analytics.qBitmapDistinct`). */
  def bitmapDistinct(events: DataFrame): Dataset[BitmapRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    def step(key: String, rows: Iterator[KeyedId],
             state: GroupState[BitmapState]): BitmapRow = {
      // mutable accumulator: one map build per micro-batch group, not one
      // immutable copy per event row (the kmvHash digest-reuse posture)
      val m = scala.collection.mutable.HashMap.empty[Long, Long]
      state.getOption.foreach(s => m ++= s.words)
      rows.foreach { r =>
        val w = r.user_id / 63
        val bit = 1L << (r.user_id % 63).toInt
        m.update(w, m.getOrElse(w, 0L) | bit)
      }
      state.update(BitmapState(m.toMap))
      BitmapRow(key, m.size.toLong,
        m.valuesIterator.map(v => java.lang.Long.bitCount(v).toLong).sum)
    }
    events.select(col("event_type"), col("user_id")).as[KeyedId]
      .groupByKey(_.event_type)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(step)
  }

  /** The batch CM hash recipe (`Analytics.qCmSketch`), verbatim: first
    * 12 hex chars of md5("cm" + depth + "_" + id) as a 48-bit big-endian
    * long, mod the counter width — byte math, caller-supplied digest
    * (one allocation per micro-batch group, not per row). */
  private[streaming] def cmHash(md: java.security.MessageDigest,
                                depth: Int, id: Long, width: Int): Int = {
    md.reset()
    val d = md.digest(s"cm${depth}_$id".getBytes("UTF-8"))
    val h = ((d(0) & 0xFFL) << 40) | ((d(1) & 0xFFL) << 32) |
      ((d(2) & 0xFFL) << 24) | ((d(3) & 0xFFL) << 16) |
      ((d(4) & 0xFFL) << 8) | (d(5) & 0xFFL)
    (h % width).toInt
  }

  case class CmState(counters: Array[Long])
  case class CmRow(event_type: String, user_id: Long, n_est: Long)

  /** Streaming Count-Min sketch per event type — the frequency-estimate
    * counterpart of [[kmvDistinct]] (distinct) and [[heavyHitters]]
    * (top-k): group state is the d×w counter grid (4×256 longs = 8 KiB
    * per type, bounded FOREVER whatever the key cardinality). Each
    * micro-batch increments the d addressed counters per row — fold
    * order never matters because the grid is a sum, so ANY batch split
    * of the same rows converges to the identical grid (the mergeability
    * the batch twin `q_cm_sketch` proves against DuckDB). Update-mode:
    * one row per user seen in the batch with its current running
    * estimate (≥ the true running count, the CM guarantee). Unlike the
    * dedup'ing KMV, CM counts deliveries — it sits behind the
    * exactly-once sink/dedup stage, not in front of it. */
  def cmSketch(events: DataFrame, depth: Int = 4, width: Int = 256): Dataset[CmRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    def step(key: String, rows: Iterator[KeyedId],
             state: GroupState[CmState]): Iterator[CmRow] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val c = state.getOption.map(_.counters).getOrElse(new Array[Long](depth * width))
      val seen = scala.collection.mutable.LinkedHashSet.empty[Long]
      rows.foreach { r =>
        seen += r.user_id
        var dd = 0
        while (dd < depth) { c(dd * width + cmHash(md, dd, r.user_id, width)) += 1; dd += 1 }
      }
      state.update(CmState(c))
      seen.iterator.map { id =>
        var est = Long.MaxValue
        var dd = 0
        while (dd < depth) { est = math.min(est, c(dd * width + cmHash(md, dd, id, width))); dd += 1 }
        CmRow(key, id, est)
      }
    }
    events.select(col("event_type"), col("user_id")).as[KeyedId]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.NoTimeout)(step)
  }

  case class HHState(keys: Array[Long], counts: Array[Long])
  case class HHRow(event_type: String, user_id: Long, est_count: Long)

  /** Streaming heavy hitters per event type via a Misra–Gries summary in
    * group state — the frequent-items counterpart of [[kmvDistinct]]'s
    * bounded-state posture: at most `m` (key, count) pairs live per type
    * FOREVER, whatever the key cardinality, and the classic guarantee
    * holds across micro-batches because the state IS the running summary
    * the next batch folds into: any key with true frequency > n/m is
    * guaranteed present, and every emitted estimate undercounts by at
    * most n/m (n = total events seen for the type). Update-mode: each
    * batch emits the current candidate set, largest first. */
  def heavyHitters(events: DataFrame, m: Int = 8): Dataset[HHRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    def step(key: String, rows: Iterator[KeyedId],
             state: GroupState[HHState]): Iterator[HHRow] = {
      val acc = scala.collection.mutable.LongMap.empty[Long]
      state.getOption.foreach(s => s.keys.zip(s.counts).foreach(kv => acc += kv))
      rows.foreach { r =>
        val id = r.user_id
        if (acc.contains(id)) acc(id) += 1
        else if (acc.size < m) acc(id) = 1L
        else {
          // decrement-all: the O(m) step that buys the n/m error bound
          val dead = Array.newBuilder[Long]
          acc.foreachEntry { (k, v) => if (v == 1L) dead += k else acc(k) = v - 1 }
          dead.result().foreach(acc -= _)
        }
      }
      val kept = acc.toArray.sortBy { case (k, v) => (-v, k) }
      state.update(HHState(kept.map(_._1), kept.map(_._2)))
      kept.iterator.map { case (id, c) => HHRow(key, id, c) }
    }
    events.select(col("event_type"), col("user_id")).as[KeyedId]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.NoTimeout)(step)
  }

  case class KeyedVal(event_type: String, value: Double)
  case class QgState(counts: Array[Long])
  case class QgRow(event_type: String, n_rows: Long,
                   p50_up_cents: Long, p95_up_cents: Long, p99_up_cents: Long)

  /** Streaming fixed-grid quantile sketch per event type — the rank-query
    * member of the bounded-state sketch family ([[kmvDistinct]] distinct,
    * [[heavyHitters]] top-k, [[cmSketch]] frequency): group state is a
    * `buckets`-cell histogram over `value` quantized to integer cents
    * (bucket = ⌊cents/widthCents⌋ clamped into the grid — 64 longs =
    * 512 B per type, bounded FOREVER). A histogram is a sum, so any
    * micro-batch split of the same rows folds to the identical grid
    * (batch-split invariance, like the CM grid), and the emitted
    * p50/p95/p99 are deterministic integer readouts: the UPPER EDGE (in
    * cents) of the first bucket whose cumulative count reaches
    * ⌈q·total⌉ — a true upper bound on the exact quantile whenever that
    * quantile lands inside the grid, tight to one bucket width. The
    * last bucket absorbs overflow (the sketch's documented saturation:
    * estimates clamp to the grid ceiling, never silently wrong below
    * it). Update-mode: one row per type per batch with the running
    * readout. */
  def quantileGrid(events: DataFrame, buckets: Int = 64,
                   widthCents: Long = 1000): Dataset[QgRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    def step(key: String, rows: Iterator[KeyedVal],
             state: GroupState[QgState]): QgRow = {
      val c = state.getOption.map(_.counts).getOrElse(new Array[Long](buckets))
      rows.foreach { r =>
        val cents = math.floor(r.value * 100).toLong
        val b = math.min(buckets - 1L, math.max(0L, cents / widthCents)).toInt
        c(b) += 1
      }
      state.update(QgState(c))
      val total = c.sum
      def q(p: Long): Long = {
        val target = (p * total + 99) / 100 // ⌈p%·total⌉, integer-exact
        var cum = 0L
        var i = 0
        while (i < buckets - 1 && cum + c(i) < target) { cum += c(i); i += 1 }
        (i + 1L) * widthCents
      }
      QgRow(key, total, q(50), q(95), q(99))
    }
    events.select(col("event_type"), col("value")).as[KeyedVal]
      .groupByKey(_.event_type)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(step)
  }

  case class SessionEvent(user_id: Long, ts: Timestamp)
  case class OpenSession(start: Long, last: Long, n: Int)
  case class Session(user_id: Long, start: Timestamp, end: Timestamp,
                     n_events: Int, duration_sec: Long)

  /** Gap-based sessionization with custom state
    * (`flatMapGroupsWithState` + event-time timeout): one `OpenSession`
    * per active user — state size ∝ active users, not events. A session
    * closes when a later event arrives past the gap, or when the watermark
    * passes last+gap (timeout path). */
  def sessionize(events: DataFrame,
                 gapSec: Long = 1800,
                 watermark: String = "1 hour"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._

    def close(userId: Long, s: OpenSession): Session =
      Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n,
        (s.last - s.start) / 1000)

    def step(userId: Long, rows: Iterator[SessionEvent],
             state: GroupState[OpenSession]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val out = state.getOption.map(close(userId, _)).iterator
        state.remove()
        return out
      }
      val sorted = rows.map(_.ts.getTime).toArray.sorted
      var open = state.getOption
      val closed = Seq.newBuilder[Session]
      for (t <- sorted) open match {
        case Some(s) if t - s.last > gapSec * 1000 =>
          closed += close(userId, s)
          open = Some(OpenSession(t, t, 1))
        case Some(s) =>
          open = Some(s.copy(last = math.max(s.last, t), n = s.n + 1))
        case None =>
          open = Some(OpenSession(t, t, 1))
      }
      open.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.last + gapSec * 1000)
      }
      closed.result().iterator
    }

    events.select(col("user_id"), col("ts"))
      .withWatermark("ts", watermark)
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(step)
  }

  /** State TTL is processing-time based, and Spark's
    * `StatefulProcessorHandleImpl.validateTTLConfig` rejects any non-NONE
    * TTL unless the query runs in `TimeMode.ProcessingTime` — so the time
    * mode must follow the TTL choice, not be hardcoded. */
  private def timeModeFor(ttl: TTLConfig): TimeMode =
    if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()

  case class ValueEvent(user_id: Long, ts: Timestamp, value: Double)
  case class UserTotals(n_events: Long, sum_value_c: Long,
                        max_value_c: Long, last_ms: Long)
  case class UserTotalsRow(user_id: Long, n_events: Long, sum_value_c: Long,
                           max_value_c: Long, last_seen: Timestamp)

  /** Running per-user totals via `transformWithState` (the Spark 4
    * arbitrary-state v2 API over the RocksDB state store): one
    * [[UserTotals]] value-state row per user, updated per micro-batch,
    * emitted in Update mode. Value cents mirror the batch convention
    * (`sum(floor(value·100))`), so the final emission per user equals the
    * batch groupBy bit-for-bit regardless of how the stream was
    * micro-batched — that invariance is the spec's assertion. An optional
    * TTL bounds state for users gone idle (the 100 TB/day posture: state
    * ∝ active users; expired users simply restart from zero). */
  class UserTotalsProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, ValueEvent, UserTotalsRow] {
    @transient private var st: ValueState[UserTotals] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[UserTotals]("totals",
        Encoders.product[UserTotals], ttl)

    override def handleInputRows(user: Long, rows: Iterator[ValueEvent],
                                 tv: TimerValues): Iterator[UserTotalsRow] = {
      // max/last seed at MinValue, not 0: an all-negative-value (or
      // pre-1970) user must still match the batch max() bit-for-bit
      var s = if (st.exists()) st.get()
              else UserTotals(0L, 0L, Long.MinValue, Long.MinValue)
      rows.foreach { e =>
        val c = math.floor(e.value * 100).toLong
        s = UserTotals(s.n_events + 1, s.sum_value_c + c,
          math.max(s.max_value_c, c), math.max(s.last_ms, e.ts.getTime))
      }
      st.update(s)
      Iterator.single(UserTotalsRow(user, s.n_events, s.sum_value_c,
        s.max_value_c, new Timestamp(s.last_ms)))
    }
  }

  /** [[UserTotalsProcessor]] wired to an event stream. Requires the
    * RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`). */
  def userTotals(events: DataFrame,
                 ttl: TTLConfig = TTLConfig.NONE): Dataset[UserTotalsRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("ts"), col("value"))
      .as[ValueEvent]
      .groupByKey(_.user_id)
      .transformWithState(new UserTotalsProcessor(ttl),
        timeModeFor(ttl), OutputMode.Update())
  }

  case class TypedEvent(user_id: Long, event_type: String)
  case class TypedCountRow(user_id: Long, event_type: String, n_events: Long)

  /** Running per-(user, event-type) counters via `transformWithState`
    * MapState: the state row per user is a MAP keyed by event type, so a
    * batch only reads/writes the types it actually touched — with many
    * types per key, that's the point of MapState over a value-state blob
    * (RocksDB prefix-scans the map entries; a ValueState would
    * deserialize and rewrite the whole map on every event). Emits the
    * updated (user, type) counters per micro-batch in Update mode. */
  class UserTypeCountsProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, TypedEvent, TypedCountRow] {
    @transient private var counts: org.apache.spark.sql.streaming.MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("counts",
        Encoders.STRING, Encoders.scalaLong, ttl)

    override def handleInputRows(user: Long, rows: Iterator[TypedEvent],
                                 tv: TimerValues): Iterator[TypedCountRow] = {
      val batch = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      rows.foreach(e => batch.update(e.event_type,
        batch.getOrElse(e.event_type, 0L) + 1L))
      // state writes happen HERE, eagerly — returning a lazy iterator that
      // updates state as it drains would skip updates if downstream
      // short-circuits, committing the batch with partial counters
      val out = batch.map { case (et, n) =>
        val total = (if (counts.containsKey(et)) counts.getValue(et) else 0L) + n
        counts.updateValue(et, total)
        TypedCountRow(user, et, total)
      }.toVector
      out.iterator
    }
  }

  /** [[UserTypeCountsProcessor]] wired to an event stream (RocksDB state
    * store required, as for [[userTotals]]). */
  def userTypeCounts(events: DataFrame,
                     ttl: TTLConfig = TTLConfig.NONE): Dataset[TypedCountRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("event_type"))
      .as[TypedEvent]
      .groupByKey(_.user_id)
      .transformWithState(new UserTypeCountsProcessor(ttl),
        timeModeFor(ttl), OutputMode.Update())
  }

  case class AlertRow(user_id: Long, streak: Int, last_ts: Timestamp)

  /** Consecutive-failure alerting via `transformWithState` ListState: the
    * state per user is the bounded (`streakLen`-sized) list of its most
    * recent event types. Bounding the buffer means each batch rewrites it
    * (clear + put) rather than appending — with an unbounded buffer
    * ListState's O(1) `appendValue` would apply, but a recency window
    * must trim, and the rewrite is `streakLen` tiny values. An alert row
    * is emitted whenever the last `streakLen` events are all `errType`,
    * then the buffer resets so one incident alerts once. Events are
    * applied in their order within each micro-batch (ts order per user on
    * an ordered feed). */
  class ErrorStreakProcessor(errType: String, streakLen: Int)
      extends StatefulProcessor[Long, TypedTsEvent, AlertRow] {
    @transient private var recent: org.apache.spark.sql.streaming.ListState[String] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      recent = getHandle.getListState[String]("recent",
        Encoders.STRING, TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[TypedTsEvent],
                                 tv: TimerValues): Iterator[AlertRow] = {
      val out = Seq.newBuilder[AlertRow]
      var buf = recent.get().toVector
      rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
        buf = (buf :+ e.event_type).takeRight(streakLen)
        if (buf.length == streakLen && buf.forall(_ == errType)) {
          out += AlertRow(user, streakLen, e.ts)
          buf = Vector.empty // one alert per incident
        }
      }
      recent.clear()
      if (buf.nonEmpty) recent.appendList(buf.toArray)
      out.result().iterator
    }
  }

  case class TypedTsEvent(user_id: Long, ts: Timestamp, event_type: String)

  /** [[ErrorStreakProcessor]] wired to an event stream (RocksDB state
    * store required). */
  def errorStreaks(events: DataFrame, errType: String = "error",
                   streakLen: Int = 3): Dataset[AlertRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("ts"), col("event_type"))
      .as[TypedTsEvent]
      .groupByKey(_.user_id)
      .transformWithState(new ErrorStreakProcessor(errType, streakLen),
        TimeMode.None(), OutputMode.Append())
  }

  /** Gap sessionization on the v2 API — [[sessionize]]'s semantics
    * re-expressed with `transformWithState` event-time TIMERS instead of
    * `GroupStateTimeout`: the open session closes either when a later
    * event arrives past the gap, or when the watermark passes its
    * registered `last + gap` timer (`handleExpiredTimer`). Each batch
    * re-arms the timer — the stale one is deleted, not left to fire — so
    * exactly one live timer guards each open session. */
  class SessionProcessorV2(gapSec: Long)
      extends StatefulProcessor[Long, SessionEvent, Session] {
    @transient private var open: ValueState[OpenSession] = _
    private def gapMs = gapSec * 1000

    private def close(userId: Long, s: OpenSession): Session =
      Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n,
        (s.last - s.start) / 1000)

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenSession]("open",
        Encoders.product[OpenSession], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[SessionEvent],
                                 tv: TimerValues): Iterator[Session] = {
      val sorted = rows.map(_.ts.getTime).toArray.sorted
      var cur = if (open.exists()) Some(open.get()) else None
      cur.foreach(s => getHandle.deleteTimer(s.last + gapMs)) // re-armed below
      val closed = Seq.newBuilder[Session]
      for (t <- sorted) cur match {
        case Some(s) if t - s.last > gapMs =>
          closed += close(userId, s)
          cur = Some(OpenSession(t, t, 1))
        case Some(s) =>
          cur = Some(s.copy(last = math.max(s.last, t), n = s.n + 1))
        case None =>
          cur = Some(OpenSession(t, t, 1))
      }
      cur.foreach { s =>
        open.update(s)
        getHandle.registerTimer(s.last + gapMs)
      }
      closed.result().iterator
    }

    override def handleExpiredTimer(userId: Long, tv: TimerValues,
                                    info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[Session] = {
      // a timer deleted in the same batch can still surface; only the one
      // matching the live session's deadline closes it
      if (open.exists() && open.get().last + gapMs <= info.getExpiryTimeInMs()) {
        val out = close(userId, open.get())
        open.clear()
        Iterator.single(out)
      } else Iterator.empty
    }
  }

  /** [[SessionProcessorV2]] wired to an event stream (RocksDB state store
    * required). Watermarked in event time so timers fire off the
    * watermark, exactly like [[sessionize]]'s event-time timeout. */
  def sessionizeV2(events: DataFrame,
                   gapSec: Long = 1800,
                   watermark: String = "1 hour"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("ts"))
      .withWatermark("ts", watermark)
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessorV2(gapSec),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
