package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import java.sql.Timestamp

/** The r10 day-tiling of q_attribution / q_window_funnel (VERDICT r9
  * item 2): on an ENGINEERED whale user — one hot key carrying most of
  * the event log — the tiled joins must (a) agree bit-for-bit with the
  * r9 untiled per-user form, (b) agree with an in-memory brute force,
  * and (c) actually join on the tile key (plan-asserted), so per-key
  * fan-out is bounded by per-day density instead of lifetime counts. */
class WhaleGuardSpec extends SparkSpecBase {

  private def ts(dayOffset: Double): Timestamp =
    new Timestamp((1700000000L * 1000L + (dayOffset * 86400000L).toLong))

  /** Whale log: user 1 owns 120 views + 120 clicks + 25 purchases spread
    * over 40 days (dense per-user, bounded per-day); users 2..9 are
    * normal; user 10 purchases with no touches (the `direct` path);
    * sub-day offsets exercise the tile-boundary residuals. */
  private lazy val whaleLog: DataFrame = {
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String, Timestamp, Double)]
    var id = 0L
    def add(user: Long, tpe: String, day: Double, value: Double): Unit = {
      id += 1; rows += ((id, user, tpe, ts(day), value))
    }
    for (i <- 0 until 120) add(1L, "view", i * 0.33, 0.0)
    for (i <- 0 until 120) add(1L, "click", i * 0.33 + 0.07, 0.0)
    for (i <- 0 until 25) add(1L, "purchase", i * 1.6 + 0.5, 10.0 + i)
    for (u <- 2L to 9L; i <- 0 until 6) {
      add(u, "view", u.toDouble + i, 0.0)
      if (i % 2 == 0) add(u, "click", u.toDouble + i + 0.4, 0.0)
      if (i % 3 == 0) add(u, "purchase", u.toDouble + i + 0.9, 5.0 * u + i)
    }
    for (i <- 0 until 3) add(10L, "purchase", 100.0 + i, 99.0 + i)
    // exact-boundary rows: a touch exactly 7 days before a purchase must
    // NOT attribute (strict >), one just inside must
    add(11L, "view", 200.0, 0.0)
    add(11L, "purchase", 207.0, 42.0)  // exactly 7d after the view
    add(12L, "view", 210.0, 0.0)
    add(12L, "purchase", 216.9999, 7.0) // just inside
    import spark.implicits._
    rows.toSeq.toDF("event_id", "user_id", "event_type", "ts", "value")
  }

  /** The r9 UNTILED attribution (per-user equi-join + residual), kept
    * here as the reference semantics the tiled form must reproduce. */
  private def untiledAttribution(ev: DataFrame): DataFrame = {
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"),
        col("ts").as("p_ts"), floor(col("value") * 100).cast("long").as("rev_c"))
    val touches = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("event_id").as("t_id"),
        col("event_type").as("channel"), col("ts").as("t_ts"))
    val attributed = purchases.join(touches,
        purchases("user_id") === touches("user_id") &&
        col("t_ts") <= col("p_ts") &&
        col("t_ts") > col("p_ts") - expr("INTERVAL 7 DAYS"), "left")
      .select(col("p_id"), col("rev_c"), col("channel"), col("t_ts"), col("t_id"))
    val byP = Window.partitionBy(col("p_id"))
    val credited = attributed
      .withColumn("n_t", count(col("t_id")).over(byP))
      .withColumn("last_rn", row_number().over(
        byP.orderBy(col("t_ts").desc_nulls_last, col("t_id").desc_nulls_last)))
      .select(
        coalesce(col("channel"), lit("direct")).as("channel"),
        when(col("n_t") === 0, col("rev_c"))
          .when(col("last_rn") === 1,
            expr("rev_c div n_t") + col("rev_c") - expr("rev_c div n_t") * col("n_t"))
          .otherwise(expr("rev_c div n_t")).as("credit_c"))
    val totals = credited.agg(sum(col("credit_c")).as("total_c"))
    credited.groupBy(col("channel"))
      .agg(count(lit(1)).as("n_credits"), sum(col("credit_c")).as("credit_c"))
      .crossJoin(broadcast(totals))
      .select(col("channel"), col("n_credits"), col("credit_c"),
        floor(col("credit_c") * 10000.0 / col("total_c")).cast("long").as("share_bp"))
      .orderBy(col("channel"))
  }

  /** The r9 UNTILED window funnel, as the reference. */
  private def untiledWindowFunnel(ev0: DataFrame): DataFrame = {
    val ev = ev0.select(col("user_id"), col("event_type"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("t_v"))
    val c = v.join(ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("t_c")), Seq("user_id"))
      .filter(col("t_c") > col("t_v") &&
        col("t_c") <= col("t_v") + expr("INTERVAL 24 HOURS"))
      .groupBy(col("user_id"), col("t_v")).agg(min(col("t_c")).as("t_c"))
    val p = c.join(ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("t_p")), Seq("user_id"))
      .filter(col("t_p") > col("t_c") &&
        col("t_p") <= col("t_v") + expr("INTERVAL 24 HOURS"))
      .groupBy(col("user_id"), col("t_v")).agg(min(col("t_p")).as("t_p"))
    val lvl = v.select(col("user_id"), lit(1L).as("lvl"))
      .union(c.select(col("user_id"), lit(2L).as("lvl")))
      .union(p.select(col("user_id"), lit(3L).as("lvl")))
      .groupBy(col("user_id")).agg(max(col("lvl")).as("level"))
    val totals = lvl.agg(count(lit(1)).as("n_total"))
    lvl.groupBy(col("level")).agg(count(lit(1)).as("n_users"))
      .crossJoin(broadcast(totals))
      .select(col("level"), col("n_users"),
        expr("10000 * n_users div n_total").as("share_bp"))
      .orderBy(col("level"))
  }

  private def rowsOf(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("tiled attribution ≡ untiled reference on the whale log and on sf0.001") {
    assert(rowsOf(Analytics.qAttributionFrom(spark, whaleLog)) ===
      rowsOf(untiledAttribution(whaleLog)))
    val sf = graft.core.Tables.events(spark, Sf)
    assert(rowsOf(Analytics.qAttributionFrom(spark, sf)) ===
      rowsOf(untiledAttribution(sf)))
  }

  test("tiled attribution conserves whale revenue and honors the strict 7d bound") {
    val out = Analytics.qAttributionFrom(spark, whaleLog).collect()
    val totalRev = whaleLog.filter(col("event_type") === "purchase")
      .agg(sum(floor(col("value") * 100).cast("long"))).collect()(0).getLong(0)
    assert(out.map(_.getAs[Long]("credit_c")).sum === totalRev)
    // user 11's purchase (touch exactly 7d earlier) must be `direct`;
    // user 12's (inside the window) must not add to direct
    val direct = out.find(_.getAs[String]("channel") == "direct").get
    val directRev = whaleLog.filter(col("user_id") === 10L || col("user_id") === 11L)
      .filter(col("event_type") === "purchase")
      .agg(sum(floor(col("value") * 100).cast("long"))).collect()(0).getLong(0)
    assert(direct.getAs[Long]("credit_c") >= directRev)
  }

  test("tiled window funnel ≡ untiled reference on the whale log and on sf0.001") {
    assert(rowsOf(Analytics.qWindowFunnelFrom(spark, whaleLog)) ===
      rowsOf(untiledWindowFunnel(whaleLog)))
    val sf = graft.core.Tables.events(spark, Sf)
    assert(rowsOf(Analytics.qWindowFunnelFrom(spark, sf)) ===
      rowsOf(untiledWindowFunnel(sf)))
  }

  test("plan guard: both step joins key on the day tile, no nested loop") {
    val af = Analytics.qAttributionFrom(spark, whaleLog)
      .queryExecution.executedPlan.toString
    val wf = Analytics.qWindowFunnelFrom(spark, whaleLog)
      .queryExecution.executedPlan.toString
    for (plan <- Seq(af, wf)) {
      assert(!plan.contains("CartesianProduct"), plan.take(2000))
      val joins = plan.linesIterator.filter(_.contains("Join")).toSeq
      // the step joins must be EQUI joins carrying the day tile...
      assert(joins.exists(l => l.contains("tile") &&
        (l.contains("SortMergeJoin") || l.contains("HashJoin"))),
        joins.mkString("\n"))
      // ...and any nested-loop join is the 1-row scalar-total cross
      // attach (the q_funnel posture), never a step join
      assert(joins.filter(_.contains("BroadcastNestedLoopJoin"))
        .forall(_.contains("Cross")), joins.mkString("\n"))
    }
  }
}
