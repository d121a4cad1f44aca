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

  test("banding is conf-driven, validated, and oracle-equal at the second config") {
    import org.apache.spark.sql.functions.col
    val docs = graft.core.Tables.documents(spark, Sf)
      .select(col("doc_id"), col("text"))
    val key = VectorQueries.LshRowsPerBandKey
    // default: 6 bands of 2
    assert(VectorQueries.minhashBandIndex(docs)
      .select("band").distinct().count() === 6L)
    // conf flips the WHOLE chain: index banding, the pair query, and the
    // streaming probe keys all follow
    spark.conf.set(key, "3")
    val viaConf =
      try {
        assert(VectorQueries.minhashBandIndex(docs)
          .select("band").distinct().count() === 4L)
        // streaming probe keys follow the same conf-driven width
        val nk = docs.limit(5).select(
            org.apache.spark.sql.functions.size(
              VectorQueries.minhashBandKeys(col("text"),
                VectorQueries.lshRowsPerBand(spark))).as("n"))
          .collect().map(_.getInt(0)).toSet
        assert(nk === Set(4))
        VectorQueries.dedupMinhash(spark, Sf).collect().toSeq
      } finally spark.conf.unset(key)
    // the pinned-config query (the oracle-checked d_dedup_minhash_b3 row)
    // is exactly the conf-driven path at rowsPerBand = 3
    assert(viaConf === VectorQueries.dedupMinhashB3(spark, Sf).collect().toSeq)
    // and d_dedup_minhash_b3 restores the session conf after itself
    assert(spark.conf.getOption(key).isEmpty)
    // a non-divisor fails loud, naming the key
    spark.conf.set(key, "5")
    try {
      val e = intercept[IllegalArgumentException] {
        VectorQueries.minhashBandIndex(docs).count()
      }
      assert(e.getMessage.contains(key))
    } finally spark.conf.unset(key)
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
