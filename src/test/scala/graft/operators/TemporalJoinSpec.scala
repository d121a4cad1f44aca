package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[TemporalJoin]] SCD2 semantics: version-boundary ties, gaps between
  * versions, expiry after the final closed version, open (null valid_to)
  * versions — batch (union+window) and stream-static (per-micro-batch
  * interval join) must both equal the naive interval join, including a
  * dim row that expires mid-stream. */
class TemporalJoinSpec extends SparkSpecBase {

  // key 1: v0 [100, 200), v1 [200, 300) — contiguous, both closed
  // key 2: v0 [100, 150), GAP, v1 [180, 250) — events in [150,180) uncovered
  // key 3: v0 [100, 200), v1 [200, null) — open current version
  // key 9 events have NO dim rows at all
  private lazy val dim: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, 100L, Option(200L), "v1a"),
      (1L, 200L, Option(300L), "v1b"),
      (2L, 100L, Option(150L), "v2a"),
      (2L, 180L, Option(250L), "v2b"),
      (3L, 100L, Option(200L), "v3a"),
      (3L, 200L, Option.empty[Long], "v3b"))
      .toDF("dim_key", "valid_from", "valid_to", "ver")
  }

  private def events(ts: (Long, Long)*): DataFrame = {
    import spark.implicits._
    ts.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      .toSeq.toDF("event_id", "key", "t")
  }

  /** The semantic reference: a naive interval left join. */
  private def naive(ev: DataFrame): Seq[(Long, Option[String])] =
    ev.join(dim,
        ev("key") === dim("dim_key") && ev("t") >= dim("valid_from") &&
          (dim("valid_to").isNull || ev("t") < dim("valid_to")), "left")
      .select(col("event_id"), col("ver"))
      .collect().toSeq
      .map(r => (r.getLong(0), Option(r.getString(1))))
      .sortBy(_._1)

  private val cases = Seq(
    (1L, 99L),   // before any version → null
    (1L, 100L),  // exactly at v0 start → v1a
    (1L, 199L),  // last covered second of v0 → v1a
    (1L, 200L),  // boundary tie: v0 ends, v1 starts → v1b (newer wins)
    (1L, 299L),  // last of v1 → v1b
    (1L, 300L),  // after the final CLOSED version → null (expiry)
    (1L, 999L),  // far past expiry → null
    (2L, 149L),  // inside v2a → v2a
    (2L, 150L),  // gap start → null
    (2L, 179L),  // gap end → null
    (2L, 180L),  // v2b start → v2b
    (2L, 250L),  // after v2b → null
    (3L, 250L),  // inside the OPEN version → v3b
    (3L, 99999L),// open version never expires → v3b
    (9L, 100L))  // key with no dim rows at all → null

  test("batch scd2 equals the naive interval join on every edge case") {
    val ev = events(cases: _*)
    val got = TemporalJoin.scd2(ev, dim, "key", "dim_key", "t",
        "valid_from", "valid_to", Seq("ver"))
      .select(col("event_id"), col("asof_ver"))
      .collect().toSeq
      .map(r => (r.getLong(0), Option(r.getString(1))))
      .sortBy(_._1)
    assert(got === naive(ev))
    // spot-pin the headline semantics so the reference itself is audited
    val byId = got.toMap
    assert(byId(3L) === Some("v1b"), "boundary tie must go to the newer version")
    assert(byId(5L) === None, "event after the final closed version is uncovered")
    assert(byId(8L) === None, "gap between versions is uncovered")
    assert(byId(13L) === Some("v3b"), "open version covers forever")
  }

  test("openSentinel: a -1-encoded dim joins identically to the null-encoded dim") {
    // the q_scd2_build seam: that dim encodes the open tail as valid_to
    // = -1 (non-nullable output); consumers pass openSentinel = Some(-1)
    val dimS = dim.withColumn("valid_to", coalesce(col("valid_to"), lit(-1L)))
    val ev = events(cases: _*)
    def run(d: DataFrame, os: Option[Long]): Seq[(Long, Option[String])] =
      TemporalJoin.scd2(ev, d, "key", "dim_key", "t",
          "valid_from", "valid_to", Seq("ver"), os)
        .select(col("event_id"), col("asof_ver")).collect().toSeq
        .map(r => (r.getLong(0), Option(r.getString(1)))).sortBy(_._1)
    val reference = run(dim, None)
    assert(run(dimS, Some(-1L)) === reference)
    // WITHOUT the sentinel, -1 reads as "expired before the epoch" and
    // every open-version event silently loses coverage — the exact
    // corruption the parameter exists to prevent
    val wrong = run(dimS, None).toMap
    assert(wrong(12L) === None && wrong(13L) === None)
    assert(reference.toMap.apply(12L) === Some("v3b"))
    // the stream-static form honors the same sentinel (batch application
    // of the identical join expression)
    val gotS = TemporalJoin.scd2Stream(ev, dimS, "key", "dim_key", "t",
        "valid_from", "valid_to", Seq("ver"), Some(-1L))
      .select(col("event_id"), col("asof_ver")).collect().toSeq
      .map(r => (r.getLong(0), Option(r.getString(1)))).sortBy(_._1)
    assert(gotS === reference)
  }

  test("batch scd2 nulls valid_from/valid_to alongside the payload") {
    val ev = events((1L, 300L), (1L, 150L))
    val rows = TemporalJoin.scd2(ev, dim, "key", "dim_key", "t",
        "valid_from", "valid_to", Seq("ver"))
      .orderBy(col("event_id")).collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("asof_valid_from")))
    assert(rows(1).getAs[Long]("asof_valid_from") === 100L)
    assert(rows(1).getAs[Long]("asof_valid_to") === 200L)
  }

  test("stream-static scd2 matches batch, incl. a version expiring mid-stream") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long)]
    val enriched = TemporalJoin.scd2Stream(
      input.toDF().toDF("event_id", "key", "t"),
      dim, "key", "dim_key", "t", "valid_from", "valid_to", Seq("ver"))
    val query = enriched.writeStream.format("memory").queryName("scd2_out")
      .outputMode("append").start()
    try {
      // micro-batch 1: key 1 while v0 is live; micro-batch 2: same key
      // after v0 expired into v1, and after the FINAL version's expiry
      input.addData((0L, 1L, 150L), (1L, 2L, 140L))
      query.processAllAvailable()
      input.addData((2L, 1L, 250L), (3L, 1L, 350L), (4L, 3L, 500L))
      query.processAllAvailable()
      val got = spark.table("scd2_out")
        .select(col("event_id"), col("asof_ver")).collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).sortBy(_._1).toSeq
      assert(got === Seq(
        (0L, Some("v1a")), (1L, Some("v2a")),
        (2L, Some("v1b")), (3L, None), (4L, Some("v3b"))))
      // and the batch operator agrees row-for-row on the same events
      val batch = TemporalJoin.scd2(
          events((1L, 150L), (2L, 140L), (1L, 250L), (1L, 350L), (3L, 500L)),
          dim, "key", "dim_key", "t", "valid_from", "valid_to", Seq("ver"))
        .select(col("event_id"), col("asof_ver")).collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).sortBy(_._1).toSeq
      assert(batch === got)
    } finally query.stop()
  }

  test("scd2EnrichedReloading picks up a dim version INSERTED mid-stream") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dimDir = java.nio.file.Files
      .createTempDirectory("graft_scd2_dim").toFile.getPath
    def writeDim(rows: Seq[(Long, Long, Option[Long], String)]): Unit =
      rows.toDF("dim_user", "valid_from", "valid_to", "tier")
        .repartition(1).write.mode("overwrite").parquet(dimDir)
    // dim snapshot 1: user 7 is bronze on an OPEN version
    writeDim(Seq((7L, 100L, None, "bronze")))

    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Option[String])]
    val input = MemoryStream[(Long, Long, Long)]
    val query = graft.streaming.EventsStream.scd2EnrichedReloading(
        input.toDF().toDF("event_id", "user_id", "ts"),
        () => spark.read.parquet(dimDir), Seq("tier")) { (df, _) =>
      got.synchronized {
        got ++= df.select(col("event_id"), col("asof_tier")).collect()
          .map(r => (r.getLong(0), Option(r.getString(1))))
      }
    }
    try {
      // micro-batch 1 under snapshot 1
      input.addData((0L, 7L, 150L))
      query.processAllAvailable()
      // the SCD2 ingest closes bronze at 200 and inserts gold [200, ∞)
      // BETWEEN micro-batches — no stream restart
      writeDim(Seq((7L, 100L, Some(200L), "bronze"), (7L, 200L, None, "gold")))
      input.addData((1L, 7L, 250L), (2L, 7L, 150L))
      query.processAllAvailable()
      val byId = got.synchronized(got.toMap)
      assert(byId(0L) === Some("bronze"))
      // the inserted version matches events at its validity...
      assert(byId(1L) === Some("gold"))
      // ...and the rewritten history still covers older event times
      assert(byId(2L) === Some("bronze"))
      // the STATIC variant would have missed the insert: under snapshot 1
      // the event at t=250 attaches bronze (open version), not gold
      val staticGot = TemporalJoin.scd2Stream(
          Seq((1L, 7L, 250L)).toDF("event_id", "user_id", "ts"),
          Seq((7L, 100L, Option.empty[Long], "bronze"))
            .toDF("dim_user", "valid_from", "valid_to", "tier"),
          "user_id", "dim_user", "ts", "valid_from", "valid_to", Seq("tier"))
        .select(col("asof_tier")).collect()(0).getString(0)
      assert(staticGot === "bronze")
      // stream ≡ batch on the union: replaying ALL events against the
      // FINAL dim matches what the reloading stream emitted (the insert
      // only touches times after batch 1's events, so per-batch snapshots
      // and the final snapshot agree on every event)
      val batch = TemporalJoin.scd2Stream(
          Seq((0L, 7L, 150L), (1L, 7L, 250L), (2L, 7L, 150L))
            .toDF("event_id", "user_id", "ts"),
          spark.read.parquet(dimDir),
          "user_id", "dim_user", "ts", "valid_from", "valid_to", Seq("tier"))
        .select(col("event_id"), col("asof_tier")).collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).toMap
      assert(byId === batch)
    } finally query.stop()
  }

  test("EventsStream.scd2Enriched binds the events schema (ts as timestamp)") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val userDim = Seq(
      (7L, 1704067200L, Option(1704931200L), "bronze"),
      (7L, 1704931200L, Option.empty[Long], "gold"))
      .toDF("dim_user", "valid_from", "valid_to", "tier")
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val query = graft.streaming.EventsStream.scd2Enriched(
        input.toDF().toDF("user_id", "ts"), userDim, Seq("tier"))
      .writeStream.format("memory").queryName("scd2_ev").outputMode("append")
      .start()
    try {
      input.addData(
        (7L, java.sql.Timestamp.valueOf("2024-01-05 00:00:00")),
        (7L, java.sql.Timestamp.valueOf("2024-02-05 00:00:00")))
      query.processAllAvailable()
      val got = spark.table("scd2_ev")
        .select(col("ts"), col("asof_tier")).collect()
        .map(r => Option(r.getString(1))).toSet
      assert(got === Set(Some("bronze"), Some("gold")))
    } finally query.stop()
  }
}
