package graft.streaming

import graft.SparkSpecBase

/** The streaming bench harness must drive every operator end-to-end and
  * account for every input row (its internal require). */
class StreamBenchSpec extends SparkSpecBase {

  test("StreamBench.run processes the full stream through every operator") {
    val results = graft.StreamBench.run(spark, "/root/testdata/sf0.001", chunks = 3)
    assert(results.keySet == Set(
      "windowed_counts", "user_activity", "dedup", "sessionize", "enriched",
      "bloom_gate", "kmv_distinct", "heavy_hitters", "cm_sketch",
      "session_window", "user_totals", "user_type_counts", "sessionize_v2"))
    assert(results.values.forall { case (sec, n) => sec > 0 && n > 0 })
    // all ops saw the same stream
    assert(results.values.map(_._2).toSet.size == 1)
  }
}
