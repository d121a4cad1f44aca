package graft

import org.apache.spark.sql.functions._

/** Graph-family scale soak (the [[PipelineBench]] treatment for the
  * iterative-graph side): synthesizes a `mult`× co-order graph FROM the
  * harness lineitem table — per-replica order ids are fresh and part keys
  * are deterministically remapped, so distinct EDGES grow ~mult× (new
  * edge identities, same degree structure) instead of collapsing in the
  * distinct — then runs the full `q_pagerank` (5 integer power
  * iterations), `q_graph_triangles`, `q_kcore` and `q_lpa_communities`
  * plans over it under whatever -Xmx cap SPARK_DRIVER_MEM imposes. A capped run that COMPLETES is the
  * proof the family holds its shape at scale: per-iteration state is the
  * checkpointed edge table + the |nodes|-row rank broadcast (never a
  * driver materialization), and the triangle count stays a
  * degree-oriented equi-join (never all-pairs).
  *
  * `runMain graft.GraphBench [mult] [shufflePartitions]` (defaults 10 /
  * max(32, 3·mult); env SPARK_GRAFT_SF_DIR = base, default sf0.1;
  * SPARK_GRAFT_CPUS; SPARK_DRIVER_MEM). One JSON line on stdout.
  */
object GraphBench {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val parts = args.drop(1).headOption.map(_.toInt)
      .getOrElse(math.max(32, mult * 3))
    val spark = graft.core.GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = parts).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_GRAPH_CUTOVER overrides the broadcast→shuffled node-count
    // cutover (set 1 to soak the forced-shuffled kcore/pagerank plans — the
    // plan a >10⁷-node graph takes automatically)
    sys.env.get("SPARK_GRAFT_GRAPH_CUTOVER").foreach(v =>
      spark.conf.set(graft.operators.GraphScale.BroadcastMaxNodesKey, v))
    import SoakUtil.{time, ms3}

    val dir = java.nio.file.Files.createTempDirectory("graft_gsoak").toString
    // mult× orders: fresh order ids per replica; part keys remapped by a
    // per-replica affine map over a 200k-part universe, so replica r's
    // baskets pair DIFFERENT parts (new distinct edges) with the same
    // basket-size distribution. The multiplier must be COPRIME to
    // 200000 = 2⁶·5⁵ or the remap collapses the part universe (2r+1 with
    // r = 2, 7, … is divisible by 5): take the r-th odd non-multiple of
    // 5 — period-10 pattern {1, 3, 7, 9} — which is always a bijection.
    // Distributed synthesis, nothing collected.
    val (tSynth, nRows) = time {
      graft.core.Tables.lineitem(spark, base)
        .select(col("l_orderkey"), col("l_partkey"))
        .crossJoin(spark.range(mult).toDF("r"))
        .withColumn("m", expr(
          "10 * (r div 4) + element_at(array(1, 3, 7, 9), cast(r % 4 as int) + 1)"))
        .select((col("l_orderkey") + col("r") * 100000000L).as("l_orderkey"),
          (pmod(col("l_partkey") * col("m") + col("r") * 7919,
            lit(200000L)) + 1).as("l_partkey"))
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      spark.read.parquet(s"$dir/lineitem.parquet").count()
    }
    // Bench-style cleanup between stages: each query checkpoints edge/rank
    // tables for its own reuse; leaving them persisted would charge stage 2
    // for stage 1's blocks (and under a tight cap, starve its broadcasts).
    def dropCaches(): Unit = {
      spark.sparkContext.getPersistentRDDs.foreach { case (_, rdd) => rdd.unpersist(false) }
      System.gc()
    }
    var pagerankMode = ""
    var kcoreMode = ""
    val (tPr, topRank) = time {
      graft.queries.Analytics.qPagerank(spark, dir, pagerankMode = _).collect()
    }
    dropCaches()
    val (tTri, tri) = time {
      graft.queries.Analytics.qGraphTriangles(spark, dir).collect()
    }
    dropCaches()
    val (tCore, core) = time {
      graft.queries.Analytics.qKcore(spark, dir, kcoreMode = _).collect()
    }
    dropCaches()
    val (tLpa, lpa) = time {
      graft.queries.Analytics.qLpaCommunities(spark, dir).collect()
    }
    val t = tri.head
    val c = core.head
    val nComms = lpa.map(_.getAs[Long]("n_comms")).sum
    println(s"""{"soak":"graph","mult":$mult,"parts":$parts,"rows":$nRows,""" +
      s""""n_nodes":${t.getAs[Long]("n_nodes")},"n_edges":${t.getAs[Long]("n_edges")},""" +
      s""""n_triangles":${t.getAs[Long]("n_triangles")},"top_rank":${topRank.head.getLong(1)},""" +
      s""""n_core_nodes":${c.getAs[Long]("n_core_nodes")},"core_stable":${c.getAs[Boolean]("stable")},""" +
      s""""synth_s":${ms3(tSynth)},"pagerank_s":${ms3(tPr)},"triangles_s":${ms3(tTri)},""" +
      s""""kcore_s":${ms3(tCore)},"lpa_s":${ms3(tLpa)},"n_communities":$nComms,""" +
      s""""kcore_mode":"$kcoreMode","pagerank_mode":"$pagerankMode",""" +
      s""""peak_heap_mb":${SoakUtil.peakHeapMb},"xmx_mb":${Runtime.getRuntime.maxMemory / (1024 * 1024)}}""")
    spark.stop()
  }
}
