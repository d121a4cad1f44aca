package graft.queries

import graft.SparkSpecBase

/** DOULION estimator contract (values are oracle-checked by the DuckDB
  * gate — the md5 edge gate draws the bit-identical sample in both
  * engines; these pin the estimator's algebra and its exact-degenerate
  * case). */
class TrianglesApproxSpec extends SparkSpecBase {

  test("p = 1 degenerates to the exact count with zero variance") {
    val approx = Analytics.qTrianglesApprox(spark, Sf, 1L).head()
    val exact = Analytics.qGraphTriangles(spark, Sf).head()
    assert(approx.getAs[Long]("n_edges_sampled") ===
      approx.getAs[Long]("n_edges_full"))
    assert(approx.getAs[Long]("t_est") === exact.getAs[Long]("n_triangles"))
    assert(approx.getAs[Long]("var_est") === 0L)
    assert(approx.getAs[Long]("err2s_bp") === 0L)
  }

  test("p = 1/4 estimator algebra and sampling bounds") {
    val r = Analytics.qTrianglesApprox(spark, Sf, 4L).head()
    val (full, samp) = (r.getAs[Long]("n_edges_full"),
      r.getAs[Long]("n_edges_sampled"))
    assert(samp > 0 && samp < full, s"gate kept $samp of $full edges")
    // ~25% of edges survive a uniform 48-bit hash gate; allow wide slack
    // on the tiny sf0.001 graph
    assert(samp > full / 8 && samp < full / 2, s"$samp of $full")
    val t = r.getAs[Long]("t_sampled")
    assert(r.getAs[Long]("t_est") === t * 64)
    assert(r.getAs[Long]("var_est") === t * 4032)
    if (t > 0) {
      val bp = r.getAs[Long]("err2s_bp")
      assert(bp === math.floor(
        2.0 * math.sqrt(t * 4032.0) * 10000.0 / (t * 64)).toLong)
    }
  }
}
