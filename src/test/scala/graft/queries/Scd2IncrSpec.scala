package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Incremental SCD2 maintenance ≡ full rebuild — the operator's whole
  * contract ([[graft.operators.Scd2Incr]]): applying a delta to an
  * existing dim must be indistinguishable from rebuilding the dim over
  * all history. `q_scd2_incr`'s DuckDB oracle is the rebuild SQL; these
  * pin the equivalence in-engine plus the branch semantics (absorb /
  * close+append / new user) on engineered frames. */
class Scd2IncrSpec extends SparkSpecBase {

  private def dimOf(rows: Seq[(Long, Long, Long)]) = {
    val s = spark
    import s.implicits._
    Analytics.scd2BuildFromDaily(rows.toDF("user_id", "day", "spend_c"))
  }

  test("same-tier delta day is absorbed into the open version") {
    val s = spark
    import s.implicits._
    val dim = Seq(
      (1L, 100L * 86400, 105L * 86400, 1L, 5L, 30000L),
      (1L, 105L * 86400, -1L, 2L, 1L, 14483L)
    ).toDF("user_id", "valid_from", "valid_to", "tier", "n_days", "spend_c")
    val delta = Seq((1L, 110L, 1627L)).toDF("user_id", "day", "spend_c")
    val out = graft.operators.Scd2Incr
      .applyDailyDelta(dim, delta, Analytics.Scd2TierExpr)
      .orderBy("valid_from").collect()
    assert(out.length == 2)
    assert(out(1).getAs[Long]("valid_to") == -1L)
    assert(out(1).getAs[Long]("n_days") == 2L)     // 1 existing + 1 absorbed
    assert(out(1).getAs[Long]("spend_c") == 16110L)
    assert(out(1).getAs[Long]("valid_from") == 105L * 86400) // boundary kept
  }

  test("multi-day delta with tier changes and a new user ≡ full rebuild") {
    // user 1 crosses a tier boundary mid-delta; user 2 stays flat;
    // user 3 never existed before the delta
    val hist = Seq(
      (1L, 100L, 15000L), (1L, 103L, 3000L),
      (2L, 101L, 50000L))
    val delta = Seq(
      (1L, 110L, 1500L), (1L, 111L, 9000L), (1L, 113L, 200L),
      (2L, 110L, 100L),
      (3L, 112L, 45000L), (3L, 113L, 1L))
    val incr = graft.operators.Scd2Incr.applyDailyDelta(
        dimOf(hist),
        { val s = spark; import s.implicits._
          delta.toDF("user_id", "day", "spend_c") },
        Analytics.Scd2TierExpr)
      .collect().map(_.toString).sorted
    val full = dimOf(hist ++ delta).collect().map(_.toString).sorted
    assert(incr.nonEmpty && incr.sameElements(full),
      s"incr:\n${incr.mkString("\n")}\nfull:\n${full.mkString("\n")}")
  }

  test("q_scd2_incr ≡ q_scd2_build on sf0.001 events") {
    val incr = Analytics.qScd2Incr(spark, Sf).collect().map(_.toString)
    val full = Analytics.qScd2Build(spark, Sf).collect().map(_.toString)
    assert(incr.length == full.length && incr.toSet == full.toSet)
    // the delta day is genuinely populated — the increment isn't a no-op
    val delta = graft.core.Tables.events(spark, Sf)
      .filter(col("event_type") === "purchase" &&
        expr("unix_timestamp(ts) div 86400") >= 19752L).count()
    assert(delta > 0, "cutoff day must carry purchases at sf0.001")
  }
}
