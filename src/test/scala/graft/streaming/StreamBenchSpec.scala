package graft.streaming

import graft.SparkSpecBase

/** The streaming bench harness must drive every operator end-to-end and
  * account for every input row (its internal require). */
class StreamBenchSpec extends SparkSpecBase {

  test("StreamBench.run processes the full stream through every operator") {
    val results = graft.StreamBench.run(spark, "/root/testdata/sf0.001", chunks = 3)
    assert(results.keySet == Set(
      "windowed_counts", "user_activity", "dedup", "sessionize", "enriched",
      "bloom_gate", "lsh_gate", "kmv_distinct", "bitmap_distinct", "heavy_hitters",
      "cm_sketch", "quantile_grid", "session_window", "user_totals",
      "user_type_counts", "sessionize_v2", "ewma_gate", "scd2_reload"))
    assert(results.values.forall(s => s.sec > 0 && s.rows > 0))
    // all ops saw the same stream
    assert(results.values.map(_.rows).toSet.size == 1)
    // stateful ops surface a state footprint; sketch-family state stays
    // FAR below the input row count (the boundedness contract)
    for (op <- Seq("kmv_distinct", "heavy_hitters", "cm_sketch", "quantile_grid")) {
      assert(results(op).stateRows > 0, s"$op reported no state rows")
      assert(results(op).stateRows < results(op).rows / 10,
        s"$op state ${results(op).stateRows} not bounded vs ${results(op).rows} inputs")
    }
  }
}
