package graft

/** Plan-artifact dumper for the optimization rounds: writes
  * `<outDir>/<query>_<suffix>.txt` with `explain("formatted")` output for
  * each named query, from ONE warmed session (the per-query
  * `graft.Explain` pays a JVM+warmup per plan, which makes a 25-query
  * before/after sweep impractical).
  *
  * Usage: `runMain graft.ExplainBatch <outDir> <suffix> <sfDir> <q1,q2,…>`
  *
  * r13 (VERDICT r12 item 3): for ChainMemo'd rows the declared query's
  * plan is a memo-hit scan, which proves sharing but not the work a miss
  * executes — the names below additionally resolve to the BUILD
  * functions, so `<family>_build_{before,after}.txt` artifacts carry the
  * plan that actually runs on every cold build.
  */
object ExplainBatch {
  import org.apache.spark.sql.{DataFrame, SparkSession}

  val builds: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_graph_build" ->
      ((s: SparkSession, d: String) => graft.queries.VectorQueries.knnGraphBuild(s, d)),
    "knn_search_visited_build" ->
      ((s: SparkSession, d: String) => graft.queries.VectorQueries.knnSearchVisitedBuild(s, d)),
    "winnow_build" ->
      ((s: SparkSession, d: String) => graft.queries.TextQueries.winnowBuild(s, d)),
    "ngram_pair_stats_build" ->
      ((s: SparkSession, d: String) => graft.operators.Dedup.pairStats(
        graft.core.Tables.documents(s, d))))

  def main(args: Array[String]): Unit = {
    val Array(outDir, suffix, sfDir, qlist) = args.take(4)
    val spark = graft.core.GraftSession.builder(
      master = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Tables.lineitem(spark, sfDir).count()
    graft.core.Tables.documents(spark, sfDir).count()
    graft.core.Namespace.inodes(spark, sfDir).count()
    new java.io.File(outDir).mkdirs()
    qlist.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      val t0 = System.nanoTime()
      try {
        val df = builds.getOrElse(name, SparkEntry.queries(name))(spark, sfDir)
        val plan = org.apache.spark.sql.graftshim.formattedPlan(df)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
        System.err.println(f"[explain] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.1f s")
      } catch { case e: Throwable =>
        System.err.println(s"[explain] $name FAILED: $e")
      }
    }
    spark.stop()
  }
}
