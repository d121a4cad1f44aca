package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Semantic invariants for the r9 additions q_attribution /
  * q_ewma_anomaly / q_link_predict (values are oracle-checked by the
  * driver's DuckDB gate; these pin the CONTRACTS). */
class AttributionEwmaLinkSpec extends SparkSpecBase {

  test("attribution conserves revenue exactly and covers every purchase") {
    val purchases = graft.core.Tables.events(spark, Sf)
      .filter(col("event_type") === "purchase")
      .select(floor(col("value") * 100).cast("long").as("c"))
    val totalRev = purchases.agg(sum(col("c"))).collect()(0).getLong(0)
    val out = Analytics.qAttribution(spark, Sf).collect()
    val credited = out.map(_.getAs[Long]("credit_c")).sum
    // linear split + remainder-to-last-touch means per-purchase credit is
    // exactly rev_c, so the channel totals must sum back to total revenue
    assert(credited == totalRev, s"credited $credited != revenue $totalRev")
    val shares = out.map(_.getAs[Long]("share_bp"))
    assert(shares.sum >= 9998 && shares.sum <= 10000) // floor rounding only
    val channels = out.map(_.getAs[String]("channel")).toSet
    assert(channels.subsetOf(Set("click", "view", "direct")))
  }

  test("ewma matches an independent fold of the daily series") {
    val rows = Analytics.qEwmaAnomaly(spark, Sf).collect()
    val rev = rows.map(_.getAs[Long]("rev_c"))
    // re-derive each day's partial-memory EWMA by direct summation
    for (i <- rows.indices) {
      val lags = (1 to 14).filter(j => i - j >= 0)
      val expected =
        if (lags.isEmpty) -1L
        else {
          val num = lags.map(j => rev(i - j) * (1L << (14 - j))).sum
          val den = lags.map(j => 1L << (14 - j)).sum
          num / den
        }
      assert(rows(i).getAs[Long]("ewma_c") == expected, s"day index $i")
      val flag = rows(i).getAs[Int]("is_anomaly")
      assert(flag == (if (expected >= 0 && rev(i) > 2 * expected) 1 else 0))
    }
  }

  test("window funnel partitions entrants; cohort revenue conserves cents") {
    val wf = Analytics.qWindowFunnel(spark, Sf).collect()
    val levels = wf.map(_.getAs[Long]("level"))
    assert(levels.toSet.subsetOf(Set(1L, 2L, 3L)))
    // peak levels partition the entrant set: user totals must sum back
    val entrants = graft.core.Tables.events(spark, Sf)
      .filter(col("event_type") === "view")
      .select(col("user_id")).distinct().count()
    assert(wf.map(_.getAs[Long]("n_users")).sum == entrants)
    val shares = wf.map(_.getAs[Long]("share_bp")).sum
    assert(shares >= 10000 - wf.length && shares <= 10000)

    val cr = Analytics.qCohortRevenue(spark, Sf).collect()
    val totalRev = graft.core.Tables.events(spark, Sf)
      .filter(col("event_type") === "purchase")
      .agg(sum(floor(col("value") * 100).cast("long"))).collect()(0).getLong(0)
    assert(cr.map(_.getAs[Long]("rev_c")).sum == totalRev)
    assert(cr.forall(_.getAs[Long]("age_weeks") >= 0))
  }

  test("link prediction: candidates are non-adjacent two-hop nodes, ranked") {
    val out = Analytics.qLinkPredict(spark, Sf).collect()
    assert(out.nonEmpty)
    // rebuild the co-order adjacency to check the anti-join contract
    val und = graft.core.Tables.lineitem(spark, Sf)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(col("ps")).as("u"), col("ps"))
      .select(col("u"), explode(col("ps")).as("v"))
      .filter(col("u") =!= col("v"))
      .select(col("u"), col("v")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (r <- out) {
      val (seed, cand) = (r.getAs[Long]("seed"), r.getAs[Long]("candidate"))
      assert(!und.contains((seed, cand)), s"$seed -> $cand already an edge")
      assert(r.getAs[Long]("n_common") >= 1)
      assert(r.getAs[Long]("aa_score_ppm") >= r.getAs[Long]("n_common"))
      assert(r.getAs[Long]("rnk") >= 1 && r.getAs[Long]("rnk") <= 5)
    }
    // per-seed ranks are dense from 1 and scores non-increasing in rank
    out.groupBy(_.getAs[Long]("seed")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq == (1L to sorted.length).toSeq)
      val scores = sorted.map(_.getAs[Long]("aa_score_ppm")).toSeq
      assert(scores == scores.sorted.reverse)
    }
  }
}
