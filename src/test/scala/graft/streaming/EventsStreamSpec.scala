package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming semantics = batch semantics: feed events through a
  * MemoryStream, compare the windowed aggregation with the same
  * computation run as a batch plan. */
case class Ev(ts: Timestamp, event_type: String, user_id: Long, value: Double)

// namespaceDiff row shape for the maintained-summary stream spec
case class DiffRow(path: String, change: String,
                   b_ftype: Option[String], a_ftype: Option[String],
                   b_size: Option[Long], a_size: Option[Long],
                   b_owner: Option[String], a_owner: Option[String])

class EventsStreamSpec extends SparkSpecBase {

  private def mkEvents: Seq[Ev] = {
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    (0 until 200).map { i =>
      Ev(new Timestamp(base + i * 3600L * 1000), // hourly → spans ~8 days
         if (i % 3 == 0) "click" else "view", i % 7, i * 1.5)
    }
  }

  test("windowed streaming aggregation matches the batch plan") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Ev]
    val query = EventsStream.windowedCounts(input.toDF())
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    try {
      input.addData(mkEvents)
      query.processAllAvailable()

      val streamed = spark.table("win_counts")
        .orderBy("win_start", "event_type").collect()

      val batch = mkEvents.toDF()
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
             sum(floor(col("value") * 100).cast("long")).as("sum_value_c"))
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n_events"), col("sum_value_c"))
        .orderBy("win_start", "event_type").collect()

      assert(streamed.length > 0)
      assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
    } finally query.stop()
  }

  test("built-in session_window aggregation matches the batch plan") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    // hourly events with a 30-min gap → every event is its own session;
    // plus a burst (3 events 5 min apart) that must merge into one
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val burst = (0 until 3).map(i =>
      Ev(new Timestamp(base + i * 300L * 1000), "click", 99L, 1.0))
    val evs = mkEvents.take(20) ++ burst
    val input = MemoryStream[Ev]
    val query = EventsStream.sessionWindowAgg(input.toDF())
      .writeStream.format("memory").queryName("sess_win")
      .outputMode("complete").start()
    try {
      input.addData(evs.take(10))
      query.processAllAvailable()
      input.addData(evs.drop(10))
      query.processAllAvailable()
      val streamed = spark.table("sess_win")
        .orderBy("user_id", "start").collect()
      val batch = evs.toDF()
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("session_window.start").as("start"),
          col("session_window.end").as("end"), col("n_events"))
        .orderBy("user_id", "start").collect()
      assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
      // the burst merged: user 99 has ONE session of 3 events
      val u99 = streamed.filter(_.getLong(0) == 99L)
      assert(u99.length == 1 && u99.head.getLong(3) == 3L)
    } finally query.stop()
  }

  test("streaming dedup drops re-delivered event ids within the watermark") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    case class E2(event_id: Long, ts: Timestamp, v: Double)
    val input = MemoryStream[(Long, Timestamp, Double)]
    val query = EventsStream.dedupedEvents(
        input.toDF().toDF("event_id", "ts", "v"))
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    try {
      input.addData((1L, new Timestamp(base), 1.0), (2L, new Timestamp(base + 1000), 2.0))
      query.processAllAvailable()
      // re-deliveries of id 1 and 2 plus one new id
      input.addData((1L, new Timestamp(base + 2000), 1.0), (2L, new Timestamp(base + 500), 2.0),
                    (3L, new Timestamp(base + 3000), 3.0))
      query.processAllAvailable()
      val ids = spark.table("deduped").select("event_id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally query.stop()
  }

  test("sessionize closes sessions on gap and on watermark timeout") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = Timestamp.valueOf("2024-01-01 08:00:00").getTime
    def ev(userId: Long, offsetMin: Long) =
      Ev(new Timestamp(base + offsetMin * 60000), "click", userId, 1.0)

    val input = MemoryStream[Ev]
    val query = EventsStream.sessionize(input.toDF(), gapSec = 1800)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: two sessions separated by a 2 h gap, all in one batch
      input.addData(ev(1, 0), ev(1, 10), ev(1, 20), ev(1, 140), ev(1, 150))
      query.processAllAvailable()
      // push the watermark far ahead so the open session times out
      input.addData(ev(2, 600))
      query.processAllAvailable()
      input.addData(ev(2, 1200))
      query.processAllAvailable()

      val sessions = spark.table("sessions")
        .orderBy("user_id", "start").as[EventsStream.Session].collect()
      val u1 = sessions.filter(_.user_id == 1)
      assert(u1.length == 2)
      assert(u1(0).n_events == 3 && u1(0).duration_sec == 20 * 60)
      assert(u1(1).n_events == 2 && u1(1).duration_sec == 10 * 60)
    } finally query.stop()
  }

  test("stream-stream interval join matches the batch join") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ev(userId: Long, offsetMin: Long, v: Double) =
      Ev(new Timestamp(base + offsetMin * 60000), "x", userId, v)

    val imps = MemoryStream[Ev]
    val clks = MemoryStream[Ev]
    val query = EventsStream.intervalJoin(imps.toDF(), clks.toDF(),
        joinWindowSec = 1800)
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      // user 1: impression at t0 — clicks at +10min (join) and +40min (no)
      // user 2: impression at +5min — click at +20min (join)
      imps.addData(ev(1, 0, 100), ev(2, 5, 200))
      clks.addData(ev(1, 10, 1), ev(1, 40, 2), ev(2, 20, 3))
      query.processAllAvailable()
      // advance both watermarks so results flush in append mode
      imps.addData(ev(9, 600, 0)); clks.addData(ev(9, 600, 0))
      query.processAllAvailable()

      val got = spark.table("attrib")
        .select("user_id", "imp_value", "click_value")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
        .toSet
      // batch twin: plain join with the same interval predicate
      assert(got.contains((1L, 100.0, 1.0)))
      assert(got.contains((2L, 200.0, 3.0)))
      assert(!got.exists { case (u, _, c) => u == 1L && c == 2.0 })
      // user-9 watermark-driver events join themselves (same ts) — ignore
      assert(got.filterNot(_._1 == 9L).size == 2)
    } finally query.stop()
  }

  test("LEFT OUTER interval join emits unmatched impressions at watermark expiry, matches batch") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ev(userId: Long, offsetMin: Long, v: Double) =
      Ev(new Timestamp(base + offsetMin * 60000), "x", userId, v)

    val imps = MemoryStream[Ev]
    val clks = MemoryStream[Ev]
    val query = EventsStream.intervalJoinOuter(imps.toDF(), clks.toDF(),
        watermark = "10 minutes", joinWindowSec = 1800)
      .writeStream.format("memory").queryName("attrib_outer")
      .outputMode("append").start()
    try {
      // user 1 converts (+10min); user 2 clicks OUTSIDE the window
      // (+40min from a +5min impression = +35min > 30min); user 3 never
      // clicks at all — 2 and 3 are the completeness rows inner drops
      imps.addData(ev(1, 0, 100), ev(2, 5, 200), ev(3, 6, 300))
      clks.addData(ev(1, 10, 1), ev(2, 40, 2))
      query.processAllAvailable()

      // TIMING contract: with the watermark still at +40min−10min=+30min,
      // user-2/3's join windows (+35/+36min) have NOT expired — no null
      // rows may have been emitted yet
      val early = spark.table("attrib_outer")
        .select("user_id", "click_value")
        .collect().map(r => (r.getLong(0), r.isNullAt(1)))
      assert(early.count(_._2) === 0,
        s"null rows emitted before watermark expiry: ${early.mkString(",")}")

      // push both watermarks far past every window end → nulls flush
      imps.addData(ev(9, 600, 0)); clks.addData(ev(9, 600, 0))
      query.processAllAvailable()
      imps.addData(ev(9, 660, 0)); clks.addData(ev(9, 660, 0))
      query.processAllAvailable()

      val got = spark.table("attrib_outer")
        .select("user_id", "imp_value", "click_value")
        .collect().filter(_.getLong(0) != 9L)
        .map(r => (r.getLong(0), r.getDouble(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
      // batch twin: left join with the same interval predicate
      val impB = Seq((1L, 0L, 100.0), (2L, 5L, 200.0), (3L, 6L, 300.0))
        .toDF("user_id", "imp_min", "imp_value")
      val clkB = Seq((1L, 10L, 1.0), (2L, 40L, 2.0))
        .toDF("cu", "click_min", "click_value")
      val batch = impB.join(clkB,
          col("user_id") === col("cu") &&
          col("click_min") >= col("imp_min") &&
          col("click_min") <= col("imp_min") + 30, "left")
        .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("imp_value"),
          Option(r.getAs[Any]("click_value")).map(_.asInstanceOf[Double]))).toSet
      assert(got === batch)
      assert(got === Set((1L, 100.0, Some(1.0)), (2L, 200.0, None), (3L, 300.0, None)))
    } finally query.stop()
  }

  test("FULL OUTER interval join emits unmatched rows on BOTH sides at watermark expiry, matches batch") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ev(userId: Long, offsetMin: Long, v: Double) =
      Ev(new Timestamp(base + offsetMin * 60000), "x", userId, v)

    val imps = MemoryStream[Ev]
    val clks = MemoryStream[Ev]
    val query = EventsStream.intervalJoinFullOuter(imps.toDF(), clks.toDF(),
        watermark = "10 minutes", joinWindowSec = 1800)
      .writeStream.format("memory").queryName("attrib_full")
      .outputMode("append").start()
    try {
      // user 1 converts (+10min); user 2's click lands OUTSIDE the window
      // (+40min from a +5min impression) → BOTH its rows are unmatched;
      // user 3 never clicks; user 4 clicks with NO impression at all —
      // the orphan-click row only the full form surfaces
      imps.addData(ev(1, 0, 100), ev(2, 5, 200), ev(3, 6, 300))
      clks.addData(ev(1, 10, 1), ev(2, 40, 2), ev(4, 12, 7))
      query.processAllAvailable()

      // TIMING contract, both sides: watermark sits at +40−10=+30min —
      // impression windows (+35/+36min) have not expired and neither has
      // any click's impression horizon — no null may exist on EITHER side
      val early = spark.table("attrib_full")
        .select("user_id", "imp_value", "click_value")
        .collect().map(r => (r.getLong(0), r.isNullAt(1), r.isNullAt(2)))
      assert(!early.exists(e => e._2 || e._3),
        s"null rows emitted before watermark expiry: ${early.mkString(",")}")

      // push both watermarks far past every horizon → nulls flush
      imps.addData(ev(9, 600, 0)); clks.addData(ev(9, 600, 0))
      query.processAllAvailable()
      imps.addData(ev(9, 660, 0)); clks.addData(ev(9, 660, 0))
      query.processAllAvailable()

      val got = spark.table("attrib_full")
        .select("user_id", "imp_value", "click_value")
        .collect().filter(_.getLong(0) != 9L)
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getDouble(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
      // batch twin: full join with the same interval predicate and the
      // same cross-side key coalesce
      val impB = Seq((1L, 0L, 100.0), (2L, 5L, 200.0), (3L, 6L, 300.0))
        .toDF("user_id", "imp_min", "imp_value")
      val clkB = Seq((1L, 10L, 1.0), (2L, 40L, 2.0), (4L, 12L, 7.0))
        .toDF("cu", "click_min", "click_value")
      val batch = impB.join(clkB,
          col("user_id") === col("cu") &&
          col("click_min") >= col("imp_min") &&
          col("click_min") <= col("imp_min") + 30, "full")
        .withColumn("user_id", coalesce(col("user_id"), col("cu")))
        .collect().map(r => (r.getAs[Long]("user_id"),
          Option(r.getAs[Any]("imp_value")).map(_.asInstanceOf[Double]),
          Option(r.getAs[Any]("click_value")).map(_.asInstanceOf[Double]))).toSet
      assert(got === batch)
      assert(got === Set(
        (1L, Some(100.0), Some(1.0)),  // matched
        (2L, Some(200.0), None),       // impression whose click came late
        (2L, None, Some(2.0)),         // …and that late click, orphaned
        (3L, Some(300.0), None),       // never-clicked impression
        (4L, None, Some(7.0))))        // click with no impression at all
    } finally query.stop()
  }

  test("RIGHT OUTER interval join keeps every click, drops unconverted impressions") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ev(userId: Long, offsetMin: Long, v: Double) =
      Ev(new Timestamp(base + offsetMin * 60000), "x", userId, v)

    val imps = MemoryStream[Ev]
    val clks = MemoryStream[Ev]
    val query = EventsStream.intervalJoinRightOuter(imps.toDF(), clks.toDF(),
        watermark = "10 minutes", joinWindowSec = 1800)
      .writeStream.format("memory").queryName("attrib_right")
      .outputMode("append").start()
    try {
      // same scenario as the full-outer spec: the click ledger must show
      // the match, the late (orphaned) click and the no-impression click,
      // and NOT user 3's never-clicked impression
      imps.addData(ev(1, 0, 100), ev(2, 5, 200), ev(3, 6, 300))
      clks.addData(ev(1, 10, 1), ev(2, 40, 2), ev(4, 12, 7))
      query.processAllAvailable()
      imps.addData(ev(9, 600, 0)); clks.addData(ev(9, 600, 0))
      query.processAllAvailable()
      imps.addData(ev(9, 660, 0)); clks.addData(ev(9, 660, 0))
      query.processAllAvailable()

      val got = spark.table("attrib_right")
        .select("user_id", "imp_value", "click_value")
        .collect().filter(_.getLong(0) != 9L)
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getDouble(1)),
          r.getDouble(2))).toSet
      assert(got === Set(
        (1L, Some(100.0), 1.0),  // matched
        (2L, None, 2.0),         // late click, orphaned
        (4L, None, 7.0)))        // click with no impression
      // every click accounted for, never-null click side
      assert(!spark.table("attrib_right").collect().exists(_.isNullAt(
        spark.table("attrib_right").schema.fieldIndex("click_value"))))
    } finally query.stop()
  }

  test("stream-static enrichment matches the batch join") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "segment")
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = Seq(Ev(new Timestamp(base), "x", 1L, 1.0),
      Ev(new Timestamp(base + 1000), "y", 2L, 2.0),
      Ev(new Timestamp(base + 2000), "z", 3L, 3.0)) // 3 has no dim row

    val in = MemoryStream[Ev]
    val query = EventsStream.enriched(in.toDF(), dim)
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      in.addData(rows: _*)
      query.processAllAvailable()
      val got = spark.table("enriched")
        .select("user_id", "segment")
        .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
      assert(got == Set((1L, Some("gold")), (2L, Some("silver")), (3L, None)))
    } finally query.stop()
  }

  test("checkpointed parquet file sink commits exactly-once batches") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toFile.getPath
    val input = MemoryStream[Ev]
    val query = EventsStream.dedupedEvents(
        input.toDF().withColumnRenamed("user_id", "event_id"))
      .writeStream.format("parquet")
      .option("path", s"$dir/data")
      .option("checkpointLocation", s"$dir/chk")
      .outputMode("append").start()
    try {
      input.addData((1 to 50).map(i => Ev(new Timestamp(base + i * 1000), "click", i, i * 1.0)): _*)
      query.processAllAvailable()
      input.addData((40 to 90).map(i => Ev(new Timestamp(base + i * 1000), "view", i, i * 1.0)): _*)
      query.processAllAvailable()
      val out = spark.read.parquet(s"$dir/data")
      assert(out.count() == 90) // 50 + 51 minus 11 duplicate ids (40..50)
      assert(out.select("event_id").distinct().count() == 90)
    } finally query.stop()
  }

  test("stream bloom gate agrees with the batch bloom gate row-for-row") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val corpus = (0 until 300).map(i => s"corpus doc $i").toDF("txt")
      .select(md5(col("txt")).as("fp"))
    val mask = graft.operators.Dedup.bloomMask(corpus)
    // 30 re-deliveries of corpus keys + 70 fresh keys
    val rows = (0 until 30).map(i => (i.toLong, s"corpus doc $i")) ++
      (0 until 70).map(i => (1000L + i, s"fresh doc $i"))

    val input = MemoryStream[(Long, String)]
    val query = EventsStream.bloomGated(
        input.toDF().toDF("id", "txt").withColumn("fp", md5(col("txt"))), mask)
      .writeStream.format("memory").queryName("bloom_gated")
      .outputMode("append").start()
    try {
      input.addData(rows: _*)
      query.processAllAvailable()
      val got = spark.table("bloom_gated").select("id", "bloom_dup")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      assert(got.size == 100)
      // Bloom guarantee: every true member flags
      assert((0 until 30).forall(i => got(i.toLong) == 1))
      // and the mask agrees with the bounded-join batch gate on EVERY row
      // (same hash family → identical false positives)
      val batch = graft.operators.Dedup.bloomGate(corpus,
          rows.toDF("id", "txt").select(col("id"), md5(col("txt")).as("fp")))
        .collect().map(r => (r.getLong(0), r.getAs[Int]("bloom_dup"))).toMap
      assert(got == batch)
    } finally query.stop()
  }

  test("streaming LSH gate agrees with batch d_minhash_incr row-for-row across uneven splits") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val Sf = "/root/testdata/sf0.001"

    // same split as the batch query: corpus = doc_id % 5 != 0, batch
    // (arriving) docs = doc_id % 5 == 0
    val docs = graft.core.Tables.documents(spark, Sf)
      .select(col("doc_id"), col("text"))
    val corpusIndex = graft.queries.VectorQueries
      .minhashBandIndex(docs.filter(col("doc_id") % 5 =!= 0))
      .localCheckpoint()
    val arriving = docs.filter(col("doc_id") % 5 === 0)
      .as[(Long, String)].collect().sortBy(_._1)
    assert(arriving.length > 10)

    val input = MemoryStream[(Long, String)]
    val query = EventsStream.lshGated(
        input.toDF().toDF("doc_id", "text"), corpusIndex)
      .writeStream.format("memory").queryName("lsh_gated")
      .outputMode("append").start()
    try {
      // uneven micro-batches: 1, then 7, then the rest
      input.addData(arriving.take(1): _*)
      query.processAllAvailable()
      input.addData(arriving.slice(1, 8): _*)
      query.processAllAvailable()
      input.addData(arriving.drop(8): _*)
      query.processAllAvailable()

      val got = spark.table("lsh_gated")
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("dup_of"), r.getAs[Long]("n_bands"), r.getAs[Int]("is_dup"))))
        .toMap
      val batch = graft.queries.VectorQueries.minhashIncr(spark, Sf)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("dup_of"), r.getAs[Long]("n_bands"), r.getAs[Int]("is_dup"))))
        .toMap
      assert(got.keySet === batch.keySet)
      assert(got === batch) // identical best-match, band count and verdict
      assert(got.values.exists(_._3 == 1), "no duplicate detected — gate untested")
    } finally query.stop()
  }

  test("streaming KMV distinct converges to the batch sketch across batch splits") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    // 200 users in type a (> k=64, sketch saturates), 30 in type b
    // (< k, estimate must be EXACT); re-deliveries must not move it
    val a = (0 until 200).map(u => ("a", u.toLong))
    val b = (0 until 30).map(u => ("b", 1000L + u))
    val input = MemoryStream[(String, Long)]
    val query = EventsStream.kmvDistinct(
        input.toDF().toDF("event_type", "user_id"))
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode("update").start()
    try {
      input.addData(a.take(100) ++ b.take(10): _*)
      query.processAllAvailable()
      input.addData(a.drop(100) ++ b.drop(10) ++ a.take(50): _*) // re-deliveries
      query.processAllAvailable()
      // last update per type is the converged estimate
      val got = spark.table("kmv_stream").collect()
        .groupBy(_.getString(0)).map { case (t, rs) => t -> rs.last }
      // type b: under k distinct -> exact
      assert(got("b").getLong(1) == 30L && got("b").getLong(2) == 30L)
      // type a: equals the batch KMV recipe on the same 200 ids
      val hs = (0 until 200).map(u => EventsStream.kmvHash(u.toLong))
        .distinct.sorted.take(64)
      val expect = 63L * (1L << 48) / hs.last
      assert(got("a").getLong(1) == 64L && got("a").getLong(2) == expect)
    } finally query.stop()
  }

  test("streaming bitmap distinct is exact across batch splits and re-deliveries") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    // ids straddle word boundaries (0..199 spans words 0..3); type b ids
    // land in a sparse far word (id div 63 ≈ 15); re-deliveries must not
    // move the counts (OR idempotence)
    val a = (0 until 200).map(u => ("a", u.toLong))
    val b = (0 until 30).map(u => ("b", 970L + u))
    val input = MemoryStream[(String, Long)]
    val query = EventsStream.bitmapDistinct(
        input.toDF().toDF("event_type", "user_id"))
      .writeStream.format("memory").queryName("bitmap_stream")
      .outputMode("update").start()
    try {
      input.addData(a.take(77) ++ b.take(10): _*)
      query.processAllAvailable()
      input.addData(a.drop(77) ++ b.drop(10) ++ a.take(50) ++ b: _*) // re-deliveries
      query.processAllAvailable()
      // counts are MONOTONE (bitmap only gains bits), so the converged
      // value is the per-type max — order-independent, no collect-order
      // assumption (the StreamingCmSpec lesson)
      val got = spark.table("bitmap_stream").collect()
        .groupBy(_.getString(0))
        .map { case (t, rs) => t -> rs.map(_.getLong(2)).max }
      assert(got("a") == 200L, s"type a: ${got("a")}")
      assert(got("b") == 30L, s"type b: ${got("b")}")
    } finally query.stop()
  }

  test("streaming heavy hitters keep the Misra-Gries guarantee across batches") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    // user 7 dominates (300 of 680 events); 19 background users ≤ 20 each.
    // MG with m=8 guarantees: any key with true count > n/m = 85 is
    // PRESENT, and estimates undercount by at most n/m.
    val heavy = Seq.fill(300)(("a", 7L))
    val rest = (0 until 19).filter(_ != 7).flatMap(u => Seq.fill(20)(("a", u.toLong)))
    // arrival order is arbitrary for the MG guarantee; fixed seed anyway
    val all = new scala.util.Random(42).shuffle(heavy ++ rest)
    val input = MemoryStream[(String, Long)]
    val query = EventsStream.heavyHitters(
        input.toDF().toDF("event_type", "user_id"), m = 8)
      .writeStream.format("memory").queryName("hh_stream")
      .outputMode("update").start()
    try {
      input.addData(all.take(400): _*)
      query.processAllAvailable()
      val nFirst = spark.table("hh_stream").count().toInt
      input.addData(all.drop(400): _*)
      query.processAllAvailable()
      // the final batch's emission is the live candidate set
      val last = spark.table("hh_stream").collect().drop(nFirst)
        .map(r => (r.getLong(1), r.getLong(2))).toMap
      val n = all.size
      assert(last.contains(7L), s"true heavy hitter absent: $last")
      val est = last(7L)
      assert(est <= 300, s"MG must undercount, got $est")
      assert(est >= 300 - n / 8, s"error bound violated: $est < ${300 - n / 8}")
      assert(last.size <= 8, s"state exceeded m: ${last.size} candidates")
    } finally query.stop()
  }

  test("late events beyond the watermark are dropped in append mode") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Ev]
    val query = EventsStream.windowedCounts(input.toDF(), watermark = "1 hour")
      .writeStream.format("memory").queryName("win_append")
      .outputMode("append").start()
    try {
      val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
      input.addData(Ev(new Timestamp(base), "click", 1, 1.0))
      query.processAllAvailable()
      // advance watermark far past day 1 → day-1 window closes
      input.addData(Ev(new Timestamp(base + 5L * 86400 * 1000), "click", 1, 1.0))
      query.processAllAvailable()
      // this event is days late → must be dropped, not re-open the window
      input.addData(Ev(new Timestamp(base + 3600 * 1000), "click", 1, 1.0))
      query.processAllAvailable()

      val closed = spark.table("win_append")
        .filter(col("win_start") === new Timestamp(base)).collect()
      assert(closed.length == 1 && closed(0).getAs[Long]("n_events") == 1L)
    } finally query.stop()
  }

  test("transformWithState running totals match the batch aggregate across batch splits") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    // transformWithState requires the RocksDB state store provider
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // user 99 only ever has negative values: its running max must match
    // the batch max (a zero-seeded max would report 0)
    val base99 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val events = mkEvents ++ Seq(
      Ev(new Timestamp(base99), "view", 99L, -5.0),
      Ev(new Timestamp(base99 + 1000), "view", 99L, -2.5))
    val input = MemoryStream[Ev]
    val query = EventsStream.userTotals(input.toDF())
      .writeStream.format("memory").queryName("user_totals")
      .outputMode("update").start()
    try {
      // deliberately uneven micro-batches: totals must not depend on the split
      input.addData(events.take(7)); query.processAllAvailable()
      input.addData(events.slice(7, 120)); query.processAllAvailable()
      input.addData(events.drop(120)); query.processAllAvailable()

      // Update mode re-emits a user on every batch it appears in —
      // the LAST emission per user is the running total
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("n_events").desc)
      val got = spark.table("user_totals")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
        .orderBy("user_id").collect().map(_.toString).toSeq

      val batch = events.toDF()
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(floor(col("value") * 100).cast("long")).as("sum_value_c"),
          max(floor(col("value") * 100).cast("long")).as("max_value_c"),
          max(col("ts")).as("last_seen"))
        .orderBy("user_id").collect().map(_.toString).toSeq

      assert(got.nonEmpty && got == batch)
    } finally {
      query.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState with a non-NONE TTL starts and emits (ProcessingTime mode)") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Ev]
    // a TTL used to throw StatefulProcessorCannotAssignTTLInTimeMode at
    // query start because the time mode was hardcoded to None — this pins
    // the TimeMode-follows-TTL fix (a generous TTL so nothing expires here)
    val query = EventsStream.userTotals(input.toDF(),
        ttl = org.apache.spark.sql.streaming.TTLConfig(
          java.time.Duration.ofHours(24)))
      .writeStream.format("memory").queryName("user_totals_ttl")
      .outputMode("update").start()
    try {
      val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
      input.addData(Ev(new Timestamp(base), "view", 7L, 2.0),
        Ev(new Timestamp(base + 1000), "view", 7L, 3.5))
      // ProcessingTime mode keeps scheduling micro-batches (TTL eviction
      // advances on processing time), so processAllAvailable never sees an
      // idle queue — poll the sink for the expected emission instead
      val deadline = System.currentTimeMillis() + 120000
      def emitted() = spark.table("user_totals_ttl")
        .filter(col("n_events") === 2L).collect()
      var rows = emitted()
      while (rows.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(250); rows = emitted()
      }
      assert(rows.nonEmpty, "no 2-event emission within 120s")
      assert(rows.head.getAs[Long]("sum_value_c") == 550L)
    } finally {
      query.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("timer-driven v2 sessionization matches the flatMapGroupsWithState sessions") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val base = Timestamp.valueOf("2024-01-01 08:00:00").getTime
    def ev(userId: Long, offsetMin: Long) =
      Ev(new Timestamp(base + offsetMin * 60000), "click", userId, 1.0)

    val input = MemoryStream[Ev]
    val query = EventsStream.sessionizeV2(input.toDF(), gapSec = 1800)
      .writeStream.format("memory").queryName("sessions_v2")
      .outputMode("append").start()
    try {
      // user 1: two sessions separated by a 2 h gap, all in one batch
      input.addData(ev(1, 0), ev(1, 10), ev(1, 20), ev(1, 140), ev(1, 150))
      query.processAllAvailable()
      // push the watermark far ahead so the open session's timer fires
      input.addData(ev(2, 600))
      query.processAllAvailable()
      input.addData(ev(2, 1200))
      query.processAllAvailable()

      val sessions = spark.table("sessions_v2")
        .orderBy("user_id", "start").as[EventsStream.Session].collect()
      val u1 = sessions.filter(_.user_id == 1)
      assert(u1.length == 2)
      assert(u1(0).n_events == 3 && u1(0).duration_sec == 20 * 60)
      assert(u1(1).n_events == 2 && u1(1).duration_sec == 10 * 60)
      // the timer path closed user 2's first session exactly like the
      // GroupStateTimeout path does in the sessionize test above
      val u2 = sessions.filter(_.user_id == 2)
      assert(u2.length >= 1 && u2(0).n_events == 1)
    } finally {
      query.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("ListState error-streak alerts fire across micro-batch boundaries, once per incident") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ev(userId: Long, offsetSec: Long, typ: String) =
      Ev(new Timestamp(base + offsetSec * 1000), typ, userId, 1.0)

    val input = MemoryStream[Ev]
    val query = EventsStream.errorStreaks(input.toDF())
      .writeStream.format("memory").queryName("streaks")
      .outputMode("append").start()
    try {
      // user 1: streak of 2 in batch 1, completed in batch 2 (state carries)
      // user 2: errors interleaved with a view — never 3 consecutive
      input.addData(ev(1, 0, "error"), ev(1, 1, "error"),
                    ev(2, 0, "error"), ev(2, 1, "error"))
      query.processAllAvailable()
      input.addData(ev(1, 2, "error"),
                    ev(2, 2, "view"), ev(2, 3, "error"))
      query.processAllAvailable()
      // user 1 again: 4 straight errors → exactly ONE more alert (buffer
      // reset after the first incident, so rows 3+4 only reach streak 2)
      input.addData(ev(1, 10, "error"), ev(1, 11, "error"),
                    ev(1, 12, "error"), ev(1, 13, "error"))
      query.processAllAvailable()

      val alerts = spark.table("streaks").orderBy("last_ts")
        .collect().map(r => (r.getLong(0), r.getTimestamp(2).getTime - base))
      assert(alerts.toSeq == Seq((1L, 2000L), (1L, 12000L)))
    } finally {
      query.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("MapState per-(user,type) counters match the batch aggregate across batch splits") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val events = mkEvents
    val input = MemoryStream[Ev]
    val query = EventsStream.userTypeCounts(input.toDF())
      .writeStream.format("memory").queryName("user_type_counts")
      .outputMode("update").start()
    try {
      input.addData(events.take(31)); query.processAllAvailable()
      input.addData(events.drop(31)); query.processAllAvailable()

      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("event_type")).orderBy(col("n_events").desc)
      val got = spark.table("user_type_counts")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
        .orderBy("user_id", "event_type").collect().map(_.toString).toSeq

      val batch = events.toDF()
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .orderBy("user_id", "event_type").collect().map(_.toString).toSeq

      assert(got.nonEmpty && got == batch)
    } finally {
      query.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("maintained summary over a diff stream ≡ batch recompute, across micro-batch splits") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Reports

    def ns(rows: (String, String, Long, String, Long)*) =
      rows.toSeq.toDF("path", "ftype", "size", "owner", "mtime_sec")
    // before → after: add for u1, remove u2's last file (drop-out), chown
    // u1 → brand-new u3, grow a file, plus dir noise the summary ignores
    val before = ns(
      ("/a/f1", "F", 100L, "u1", 10L), ("/a/f2", "F", 50L, "u1", 10L),
      ("/b/f3", "F", 30L, "u2", 10L), ("/a", "D", 0L, "u1", 5L))
    val after = ns(
      ("/a/f1", "F", 100L, "u3", 11L), ("/a/f2", "F", 57L, "u1", 11L),
      ("/a/f4", "F", 9L, "u1", 12L), ("/a", "D", 0L, "u1", 6L))
    val diffRows = Reports.namespaceDiff(before, after).collect().map(r => DiffRow(
      r.getString(0), r.getString(1),
      Option(r.getString(2)), Option(r.getString(3)),
      if (r.isNullAt(4)) None else Some(r.getLong(4)),
      if (r.isNullAt(5)) None else Some(r.getLong(5)),
      Option(r.getString(6)), Option(r.getString(7))))
    assert(diffRows.length >= 4)

    val input = MemoryStream[DiffRow]
    val query = EventsStream.maintainedSummaryDelta(input.toDF())
      .writeStream.format("memory").queryName("maint_delta")
      .outputMode("complete").start()
    try {
      // the split exercises cross-batch state: the chown's debit and the
      // drop-out land in batch 1, the credits in batch 2
      val (b1, b2) = diffRows.sortBy(_.path).splitAt(2)
      input.addData(b1); query.processAllAvailable()
      input.addData(b2); query.processAllAvailable()
      val folded = Reports.applySummaryDelta(
          Reports.filesSummary(before), spark.table("maint_delta"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val direct = Reports.filesSummary(after)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(folded === direct)
      assert(!folded.exists(_._1 == "u2"), "dropped owner must not survive")
    } finally query.stop()
  }
}
