package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Lloyd's iterations must actually converge on separable data — seeds are
  * the k smallest vec_ids, so the fixture puts one early id in each true
  * cluster and the rest anywhere. */
class KMeansSpec extends SparkSpecBase {

  private def cluster(center: Float, ids: Seq[Long]) =
    ids.map(i => (i, Array(center + (i % 5) * 0.01f, center - (i % 3) * 0.01f)))

  test("recovers three separable clusters in two iterations") {
    import spark.implicits._
    // ids 0,1,2 seed one true cluster each; later ids are shuffled across
    val rows = cluster(0.0f, Seq(0L, 10, 13, 16)) ++
      cluster(5.0f, Seq(1L, 11, 14, 17)) ++
      cluster(-5.0f, Seq(2L, 12, 15, 18))
    val df = rows.toDF("vec_id", "embedding")
    val out = KMeans.fit(df, k = 3, iters = 2).collect()
    val byCluster = out.groupBy(_.getAs[Long]("cluster"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    assert(byCluster == Map(
      0L -> Set(0L, 10, 13, 16),
      1L -> Set(1L, 11, 14, 17),
      2L -> Set(2L, 12, 15, 18)))
    // members sit near their centroid: all distances far below the
    // inter-cluster gap (5 units = 5e6 quantized → gap² = 2.5e13)
    assert(out.forall(_.getAs[Long]("dist") < 1e10))
  }

  test("identical vectors all land on the smallest seed id") {
    import spark.implicits._
    val df = (0L until 20L).map(i => (i, Array(1.0f, 2.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val out = KMeans.fit(df, k = 4, iters = 1).collect()
    assert(out.forall(_.getAs[Long]("cluster") == 0L))
    assert(out.forall(_.getAs[Long]("dist") == 0L))
  }

  test("fitTop rnk=1 IS fit, over the same trajectory, with ranked runners-up") {
    import spark.implicits._
    val rows = cluster(0.0f, Seq(0L, 10, 13, 16)) ++
      cluster(5.0f, Seq(1L, 11, 14, 17)) ++
      cluster(-5.0f, Seq(2L, 12, 15, 18))
    val df = rows.toDF("vec_id", "embedding")
    val fit = KMeans.fit(df, k = 3, iters = 2).collect()
      .map(r => r.getAs[Long]("vec_id") -> (r.getAs[Long]("cluster"), r.getAs[Long]("dist")))
      .toMap
    val top = KMeans.fitTop(df, k = 3, iters = 2, p = 2).collect()
    // rank-1 rows reproduce the argmin assignment exactly (same
    // centroids, same tie rule) — the invariant multi-probe SemDeDup
    // and incremental-IVF assignment rest on
    val r1 = top.filter(_.getAs[Int]("rnk") == 1)
      .map(r => r.getAs[Long]("vec_id") -> (r.getAs[Long]("cluster"), r.getAs[Long]("dist")))
      .toMap
    assert(r1 == fit)
    // every vector carries exactly p probes, rank-2 strictly no closer
    val byVec = top.groupBy(_.getAs[Long]("vec_id"))
    assert(byVec.values.forall(_.length == 2))
    byVec.values.foreach { probes =>
      val Array(a, b) = probes.sortBy(_.getAs[Int]("rnk"))
      assert(a.getAs[Long]("dist") <= b.getAs[Long]("dist"))
    }
  }
}
