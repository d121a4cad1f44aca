package graft.queries

import graft.SparkSpecBase

/** Contracts for the d_lsh_curve banding sweep. */
class LshCurveSpec extends SparkSpecBase {

  test("r=2 sweep row reproduces d_minhash_recall_sampled exactly") {
    // banding is per-doc, so banding the SAMPLE == restricting full-corpus
    // candidates to both-ends-sampled: the sweep's r=2 config and the
    // sampled recall eval must therefore agree on every count — this also
    // pins the sigs/bandSigs refactor to the original band recipe
    val row = VectorQueries.lshCurve(spark, Sf).collect()
      .find(_.getAs[Long]("rows_per_band") == 2L).get
    val eval = VectorQueries.minhashRecallSampled(spark, Sf).collect()(0)
    for (c <- Seq("n_exact", "n_cand", "n_hit", "recall_bp", "precision_bp"))
      assert(row.getAs[Long](c) == eval.getAs[Long](c), s"column $c diverged")
  }

  test("candidate counts shrink and theory tracks as bands coarsen") {
    val rows = VectorQueries.lshCurve(spark, Sf).collect()
      .sortBy(_.getAs[Long]("rows_per_band"))
    assert(rows.map(_.getAs[Long]("rows_per_band")).toSeq == Seq(1L, 2L, 3L, 4L))
    val cands = rows.map(_.getAs[Long]("n_cand")).toSeq
    assert(cands == cands.sorted.reverse, s"n_cand not non-increasing: $cands")
    val theory = rows.map(_.getAs[Long]("theory50_bp")).toSeq
    assert(theory == theory.sorted.reverse && theory.head > theory.last)
    // hits can never exceed either side
    for (r <- rows) {
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_exact"))
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_cand"))
    }
  }
}
