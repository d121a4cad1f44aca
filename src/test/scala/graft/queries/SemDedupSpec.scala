package graft.queries

import graft.SparkSpecBase

/** SemDeDup decision-table invariants (the value check is the DuckDB
  * oracle, which replays the fit + in-cluster pair scan exactly). */
class SemDedupSpec extends SparkSpecBase {

  test("knnMutual clusters are mutual-edge components and a subset of exact near-dup pairs") {
    import org.apache.spark.sql.functions.col
    val g = VectorQueries.knnGraph(spark, Sf)
      .filter(col("cos_bp") >= VectorQueries.MutualCosBp)
      .collect().map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("nbr_id"))).toSet
    val mutual = g.filter { case (a, b) => a < b && g.contains((b, a)) }
    val clusters = VectorQueries.knnMutual(spark, Sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster_id"),
        r.getAs[Long]("cluster_size")))
    assert(mutual.nonEmpty && clusters.nonEmpty, "mutual structure must exist at sf0.001")
    // membership consistent: sizes match, cluster_id = min member,
    // every mutual pair lands in one cluster, no singleton rows
    val byC = clusters.groupBy(_._2)
    byC.foreach { case (cid, ms) =>
      assert(ms.forall(_._3 == ms.length) && ms.length >= 2)
      assert(ms.map(_._1).min == cid, s"cluster_id $cid must be its min member")
    }
    val labelOf = clusters.map(c => c._1 -> c._2).toMap
    mutual.foreach { case (a, b) =>
      assert(labelOf(a) == labelOf(b), s"mutual pair ($a,$b) split across clusters")
    }
    // every clustered vector reaches its cluster through some mutual edge
    val touched = mutual.flatMap(p => Seq(p._1, p._2))
    assert(clusters.forall(c => touched.contains(c._1)))
    // mutual pairs are a SUBSET of the exact >= threshold pair list: the
    // graph's cos_bp is exact for the pairs it emits, so mutuality can
    // only prune, never invent similarity
    val exact = VectorQueries.dedupEmbedding(spark, Sf).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(mutual.subsetOf(exact), (mutual -- exact).take(3).toString)
  }

  test("semdedup emits one decision per vector and keeps a representative per cluster") {
    val rows = VectorQueries.semDedup(spark, Sf).collect()
    val n = graft.core.Tables.embeddings(spark, Sf).count()
    assert(rows.length == n, "one row per corpus vector")
    assert(rows.forall(r => r.getInt(2) == 0 || r.getInt(2) == 1))
    // the lowest id in a cluster can have no lower-id neighbor → always kept,
    // so every cluster retains at least one representative
    val byCluster = rows.groupBy(_.getLong(1))
    assert(byCluster.values.forall(_.exists(_.getInt(2) == 1)))
    byCluster.values.foreach { members =>
      val minId = members.map(_.getLong(0)).min
      assert(members.find(_.getLong(0) == minId).get.getInt(2) == 1,
        s"cluster min id $minId must be kept")
    }
  }
}
