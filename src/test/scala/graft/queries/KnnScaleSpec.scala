package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions.col

/** The [[VectorQueries.knnGraph]] scale knobs (the r8-verdict cutover
  * lesson applied to the coarse quantizer): ncells ∝ √n with only a
  * broadcast-size ceiling, and an AUTOMATIC sampled→KMeans centroid
  * switch at a measured corpus size — forced to 1 vector here so the
  * tiny spec corpus exercises the at-scale path, GraphScale-style. */
class KnnScaleSpec extends SparkSpecBase {

  private val CutoverKey = VectorQueries.KnnKmeansMinVectorsKey
  private val MaxCellsKey = VectorQueries.KnnMaxCellsKey

  /** Exact cosine bp between two corpus vectors, with the engines'
    * sequential-fold dot order. */
  private def exactCosBp(emb: Map[Long, Array[Double]])(a: Long, b: Long): Long = {
    def dot(x: Array[Double], y: Array[Double]): Double =
      x.indices.foldLeft(0.0)((acc, i) => acc + x(i) * y(i))
    val (va, vb) = (emb(a), emb(b))
    math.floor(dot(va, vb) * 10000.0 /
      (math.sqrt(dot(va, va)) * math.sqrt(dot(vb, vb)))).toLong
  }

  test("ncells is unclamped sqrt(n), conf-capped only by the broadcast ceiling") {
    assert(VectorQueries.knnNumCells(spark, 100L) === 16L)        // floor
    assert(VectorQueries.knnNumCells(spark, 500L) === 22L)        // ⌊√500⌋
    assert(VectorQueries.knnNumCells(spark, 1000000L) === 1000L)  // past r8's 256 clamp
    assert(VectorQueries.knnNumCells(spark, 10000000000L) === 65536L) // ceiling
    spark.conf.set(MaxCellsKey, "32")
    try assert(VectorQueries.knnNumCells(spark, 1000000L) === 32L)
    finally spark.conf.unset(MaxCellsKey)
  }

  test("malformed knob fails with the key named, not a bare NumberFormatException") {
    spark.conf.set(MaxCellsKey, "lots")
    try {
      val ex = intercept[IllegalArgumentException] {
        VectorQueries.knnNumCells(spark, 1000L)
      }
      assert(ex.getMessage.contains(MaxCellsKey))
    } finally spark.conf.unset(MaxCellsKey)
  }

  test("centroid source switches automatically at the measured corpus size") {
    val n = graft.core.Tables.embeddings(spark, Sf).count()
    assert(VectorQueries.knnCentroidMode(spark, n) === "sampled")
    spark.conf.set(CutoverKey, "1")
    try {
      assert(VectorQueries.knnCentroidMode(spark, n) === "kmeans")
      val e = VectorQueries.embs(spark, Sf)
      val ncells = VectorQueries.knnNumCells(spark, n)
      val km = VectorQueries.knnCentroids(spark, Sf, e, n, ncells).collect()
      spark.conf.unset(CutoverKey)
      val sampled = VectorQueries.knnCentroids(spark, Sf, e, n, ncells).collect()
      // same contract (one unit-rankable centroid per cell key, ≤ ncells
      // cells), different SOURCE: Lloyd means are not the raw id-sampled
      // vectors
      assert(km.nonEmpty && km.length <= ncells && sampled.length === ncells.toInt)
      assert(km.forall(_.getAs[Double]("cn") > 0.0))
      val sampledCv = sampled
        .map(r => r.getAs[scala.collection.Seq[Double]]("cv").toVector).toSet
      assert(km.count(r =>
        sampledCv.contains(r.getAs[scala.collection.Seq[Double]]("cv").toVector))
        < km.length, "KMeans path returned the sampled centroids verbatim")
    } finally spark.conf.unset(CutoverKey)
  }

  test("forced-kmeans knnGraph keeps the contract: ranked exact cosines, bounded degree") {
    spark.conf.set(CutoverKey, "1")
    try {
      val rows = VectorQueries.knnGraph(spark, Sf).collect()
      assert(rows.nonEmpty)
      val emb = graft.core.Tables.embeddings(spark, Sf).collect()
        .map(r => r.getAs[Long]("vec_id") ->
          r.getAs[scala.collection.Seq[Float]]("embedding")
            .map(_.toDouble).toArray).toMap
      val cos = exactCosBp(emb) _
      rows.groupBy(_.getAs[Long]("src_id")).foreach { case (src, es) =>
        val sorted = es.sortBy(_.getAs[Long]("rnk"))
        assert(sorted.length <= VectorQueries.KnnK)
        assert(sorted.map(_.getAs[Long]("rnk")).toSeq ===
          (1L to sorted.length).toSeq, s"src $src rnk gap")
        // emitted similarity is the EXACT cosine for every kept edge, and
        // rnk order is cos order (ties → smaller nbr id)
        sorted.foreach(r => assert(
          r.getAs[Long]("cos_bp") === cos(src, r.getAs[Long]("nbr_id")),
          s"src $src nbr ${r.getAs[Long]("nbr_id")}"))
        sorted.sliding(2).foreach {
          case Array(hi, lo) =>
            val (ch, cl) = (hi.getAs[Long]("cos_bp"), lo.getAs[Long]("cos_bp"))
            assert(ch > cl || (ch === cl &&
              hi.getAs[Long]("nbr_id") < lo.getAs[Long]("nbr_id")))
          case _ =>
        }
      }
    } finally spark.conf.unset(CutoverKey)
  }
}
