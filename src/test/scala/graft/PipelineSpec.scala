package graft

/** The composed curation chain holds its invariants: each gate only ever
  * shrinks the corpus, packing covers the surviving tokens, and the single
  * k-means fit yields all three cluster views. */
class PipelineSpec extends SparkSpecBase {
  test("pipeline stages shrink monotonically and the shared fit feeds all views") {
    val stages = Pipeline.run(spark, Sf)
      .map { case (k, v, _) => k -> v }.toMap
    assert(stages("docs") > 0)
    assert(stages("after_exact_dedup") <= stages("docs"))
    assert(stages("after_neardup_keep") <= stages("after_exact_dedup"))
    assert(stages("after_quality_gate") <= stages("after_neardup_keep"))
    assert(stages("after_quality_gate") > 0)
    // the p25 gate keeps at least ~75 % of every language, so globally too
    assert(stages("after_quality_gate") * 4L >= stages("after_neardup_keep") * 3L - 4)
    assert(stages("packed_sequences") > 0)
    assert(stages("kmeans_clusters") == stages("cluster_medoids"))
    assert(stages("medoid_argmin_violations") == 0L)
    assert(stages("fit_wcss_nonzero") == 1L)
  }
}
