package graft.queries

import graft.SparkSpecBase

/** SCD2 invariants of the built dimension (values are oracle-checked by
  * the DuckDB gate; these pin the structural contract a consumer like
  * [[graft.operators.TemporalJoin.scd2]] relies on). */
class Scd2BuildSpec extends SparkSpecBase {

  test("built dim: contiguous non-overlapping versions, one open tail, compacted") {
    val rows = Analytics.qScd2Build(spark, Sf).collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (u, vs0) =>
      val vs = vs0.sortBy(_.getAs[Long]("valid_from"))
      // exactly one open version, and it is the LAST one
      assert(vs.count(_.getAs[Long]("valid_to") == -1L) === 1, s"user $u")
      assert(vs.last.getAs[Long]("valid_to") === -1L, s"user $u")
      vs.sliding(2).foreach {
        case Array(a, b) =>
          // contiguous: each version ends exactly where the next starts
          assert(a.getAs[Long]("valid_to") === b.getAs[Long]("valid_from"), s"user $u")
          // compacted: adjacent versions must differ in tier (else they
          // would have merged into one island)
          assert(a.getAs[Long]("tier") !== b.getAs[Long]("tier"), s"user $u")
        case _ =>
      }
      // cumulative spend can only grow → tiers are non-decreasing
      val tiers = vs.map(_.getAs[Long]("tier"))
      assert(tiers.zip(tiers.tail).forall { case (a, b) => a <= b }, s"user $u")
    }
    // compaction is REAL on this corpus: some user has fewer versions
    // than purchase days
    assert(rows.map(_.getAs[Long]("n_days")).max > 1L)
  }

  test("built dim feeds TemporalJoin.scd2 via openSentinel = -1") {
    import org.apache.spark.sql.functions._
    val session = spark
    import session.implicits._
    val dim = Analytics.qScd2Build(spark, Sf)
    // one probe event per user, AFTER every version boundary: under the
    // open-tail contract each must attach the LAST version's tier; with
    // the sentinel unmapped, valid_to = -1 would read as expired and
    // every probe would come back null
    val probes = dim.groupBy(col("user_id"))
      .agg((max(col("valid_from")) + 1).as("t"),
        max_by(col("tier"), col("valid_from")).as("want_tier"))
    val got = graft.operators.TemporalJoin.scd2(
        probes.select(col("user_id"), col("t")),
        dim.withColumnRenamed("user_id", "dim_user"),
        "user_id", "dim_user", "t", "valid_from", "valid_to",
        Seq("tier"), openSentinel = Some(-1L))
      .join(probes.select(col("user_id"), col("want_tier")), "user_id")
    assert(got.count() > 0)
    assert(got.filter(col("asof_tier").isNull ||
      col("asof_tier") =!= col("want_tier")).count() === 0)
  }
}
