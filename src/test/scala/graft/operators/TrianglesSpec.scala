package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame

/** [[Triangles]]: the heavy/light adjacency split must be invisible in
  * the answer — all-light, all-broadcast, and interior-τ plans count the
  * same triangles as an in-memory brute force, on an ENGINEERED skewed
  * graph where the split actually activates (the VERDICT r9 demand). */
class TrianglesSpec extends SparkSpecBase {
  import scala.collection.mutable

  private def bruteTriangles(edges: Seq[(Long, Long)]): Long = {
    val adj = mutable.Map.empty[Long, mutable.Set[Long]]
    edges.foreach { case (u, v) =>
      adj.getOrElseUpdate(u, mutable.Set.empty) += v
      adj.getOrElseUpdate(v, mutable.Set.empty) += u
    }
    // each triangle is seen once per edge (as a common neighbor of the
    // edge's endpoints) → the per-edge sum is exactly 3T
    val s = edges.map { case (u, v) => (adj(u) intersect adj(v)).size.toLong }.sum
    assert(s % 3 == 0, s"per-edge common-neighbor sum $s not divisible by 3")
    s / 3
  }

  private def edgesDf(edges: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    edges.toDF("u", "v")
  }

  private def runWithCap(edges: Seq[(Long, Long)], cap: Long)
      : (Map[String, Long], Triangles.SplitStats) = {
    var stats: Triangles.SplitStats = null
    spark.conf.set(Triangles.HeavyBroadcastMaxKey, cap.toString)
    try {
      val row = Triangles.summary(spark, edgesDf(edges), s => stats = s).collect()(0)
      (Map(
        "n_nodes" -> row.getAs[Long]("n_nodes"),
        "n_edges" -> row.getAs[Long]("n_edges"),
        "n_wedges" -> row.getAs[Long]("n_wedges"),
        "n_triangles" -> row.getAs[Long]("n_triangles")), stats)
    } finally spark.conf.unset(Triangles.HeavyBroadcastMaxKey)
  }

  /** Clique(12) on ids 100..111 (every member's oriented out-list is fat)
    * ∪ 30-node path ∪ 20-leaf star — the skew the co-order graph doesn't
    * have. Expected triangles: C(12,3) = 220 (path and star are
    * triangle-free). */
  private val skewed: Seq[(Long, Long)] = {
    val clique = for {
      i <- 100L to 111L; j <- (i + 1) to 111L
    } yield (i, j)
    val path = (0L until 29L).map(i => (i, i + 1))
    val star = (1L to 20L).map(i => (500L, 500L + i))
    (clique ++ path ++ star).toSeq
  }

  test("brute force agrees with the closed form on the skewed graph") {
    assert(bruteTriangles(skewed) === 220L)
  }

  test("all-light (cap 0), interior split, and all-broadcast plans count identically") {
    val expected = bruteTriangles(skewed)
    val (light, sLight) = runWithCap(skewed, 0L)
    val (split, sSplit) = runWithCap(skewed, 30L)
    val (bcast, sBcast) = runWithCap(skewed, 1000000L)
    assert(light("n_triangles") === expected)
    assert(split("n_triangles") === expected)
    assert(bcast("n_triangles") === expected)
    assert(light === split); assert(split === bcast)
    // the split genuinely activated: cap 0 → no heavy side; cap 30 → an
    // interior τ with a non-empty bounded broadcast; big cap → everything
    // broadcasts (τ = 0)
    assert(sLight.broadcastEntries === 0L)
    assert(sSplit.tau > 0L && sSplit.broadcastEntries > 0L &&
      sSplit.broadcastEntries <= 30L &&
      sSplit.broadcastEntries < sSplit.totalEntries)
    assert(sBcast.tau === 0L &&
      sBcast.broadcastEntries === sBcast.totalEntries)
  }

  test("seeded random graph matches brute force under all three plans") {
    val rng = new scala.util.Random(42)
    val edges = (for {
      u <- 0L until 40L; v <- (u + 1) until 40L if rng.nextDouble() < 0.3
    } yield (u, v)).toSeq
    val expected = bruteTriangles(edges)
    assert(expected > 0L)
    assert(runWithCap(edges, 0L)._1("n_triangles") === expected)
    assert(runWithCap(edges, 40L)._1("n_triangles") === expected)
    assert(runWithCap(edges, 1000000L)._1("n_triangles") === expected)
  }

  test("chooseTau: tail fits under the cap, blocked tail leaves heavy empty") {
    // od=100 group (2 nodes, 200 entries) fits cap 250, od=5 group adds 50
    // → exactly at cap → everything heavy, τ = 4
    assert(Triangles.chooseTau(Seq((5L, 10L), (100L, 2L)), 250L) === ((4L, 250L)))
    // cap 100 blocks the biggest group immediately → τ = max od, no heavy
    assert(Triangles.chooseTau(Seq((5L, 10L), (100L, 2L)), 100L) === ((100L, 0L)))
    // blocking is ORDERED: once a group doesn't fit, smaller-od groups
    // must not leapfrog it (heavy is a degree SUFFIX, not a knapsack)
    assert(Triangles.chooseTau(Seq((1L, 3L), (100L, 2L)), 150L) === ((100L, 0L)))
    assert(Triangles.chooseTau(Seq.empty, 10L) === ((0L, 0L)))
  }

  test("empty and triangle-free graphs report zero") {
    val (none, _) = runWithCap((0L until 5L).map(i => (i, i + 1)), 0L)
    assert(none("n_triangles") === 0L)
  }

  test("degenerate graphs report ZEROS, not nulls") {
    // truly empty edge list: every total must be 0 (nulls would poison
    // any downstream arithmetic over the summary row)
    val empty = Triangles.summary(spark, edgesDf(Seq.empty)).collect()(0)
    Seq("n_nodes", "n_edges", "n_wedges", "n_triangles", "global_cc_bp")
      .foreach { c =>
        assert(!empty.isNullAt(empty.fieldIndex(c)), s"$c null on empty")
        assert(empty.getAs[Long](c) === 0L, c)
      }
    // wedge-free graph (disjoint edges, all degrees 1): 0/0 in the
    // clustering coefficient must read 0, not NaN/null
    val m = Triangles.summary(spark,
      edgesDf(Seq((0L, 1L), (2L, 3L), (4L, 5L)))).collect()(0)
    assert(m.getAs[Long]("n_wedges") === 0L)
    assert(!m.isNullAt(m.fieldIndex("global_cc_bp")))
    assert(m.getAs[Long]("global_cc_bp") === 0L)
  }

  test("id-range contract is enforced, not just documented") {
    val neg = intercept[IllegalArgumentException] {
      Triangles.summary(spark, edgesDf(Seq((-1L, 2L), (2L, 3L)))).collect()
    }
    assert(neg.getMessage.contains("2^31"))
    val wide = intercept[IllegalArgumentException] {
      Triangles.summary(spark, edgesDf(Seq((1L, 1L << 31), (2L, 3L)))).collect()
    }
    assert(wide.getMessage.contains("2^31"))
  }
}
