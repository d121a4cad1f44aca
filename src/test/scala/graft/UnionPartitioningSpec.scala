package graft.queries

import graft.SparkSpecBase

import org.apache.spark.sql.functions._

/** Pin for the Spark 4.1.2 window-over-union soundness hole that
  * `q_scd2_incr`'s rebuild-equivalence oracle caught: with
  * `spark.sql.unionOutputPartitioning=true` (the engine default), a
  * union whose children end in broadcast joins above same-key
  * hash-partitioned window chains claims its children's partitioning,
  * EnsureRequirements elides the post-union exchange — but UnionExec
  * CONCATENATES child partitions, so one key's rows land in different
  * partitions and windows above compute per-fragment results (observed:
  * every SCD2 user kept TWO "open" versions because lag/lead never saw
  * across the union seam). GraftSession and Verify set the conf false.
  *
  * Two teeth: (1) the guard must stay off in our sessions; (2) the
  * misbehavior is re-demonstrated with the conf forced ON — if a Spark
  * upgrade makes that leg produce CORRECT results, this spec fails
  * loudly as "engine fixed, guard removable", so the workaround can't
  * silently outlive its reason.
  */
class UnionPartitioningSpec extends SparkSpecBase {

  /** The real q_scd2_incr at sf0.001 vs its rebuild — the exact plan
    * that exposed the hole (a synthetic 48-row frame did NOT trigger the
    * elision; the trigger needs the full shape's positional partitioning
    * alignment, so the watchdog runs the genuine article). */
  private def incrVsRebuild(): (Array[String], Array[String]) = {
    val incr = Analytics.qScd2Incr(spark, Sf).collect().map(_.toString).sorted
    val full = Analytics.qScd2Build(spark, Sf).collect().map(_.toString).sorted
    (incr, full)
  }

  test("session keeps the union-partitioning guard off, and it suffices") {
    assert(spark.conf.get("spark.sql.unionOutputPartitioning") == "false",
      "GraftSession must keep spark.sql.unionOutputPartitioning=false")
    val (incr, full) = incrVsRebuild()
    assert(incr.sameElements(full),
      s"guarded session still split keys:\n${incr.mkString("\n")}\nvs\n${full.mkString("\n")}")
  }

  test("conf ON still misbehaves (fails here == engine fixed, drop the guard)") {
    spark.conf.set("spark.sql.unionOutputPartitioning", "true")
    try {
      val (incr, full) = incrVsRebuild()
      assert(!incr.sameElements(full),
        "spark.sql.unionOutputPartitioning=true now yields correct " +
          "window-over-union results — the engine bug this guard works " +
          "around appears FIXED; re-evaluate removing the guard from " +
          "GraftSession/Verify and retire this leg.")
    } finally spark.conf.set("spark.sql.unionOutputPartitioning", "false")
  }
}
