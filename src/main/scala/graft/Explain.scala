package graft

/** Prints the formatted physical plan (and optionally times) for one named
  * query: `runMain graft.Explain <queryName> [sfDir] [time] [warm]`.
  * `warm` replicates Bench's warmup (fact-table counts + materialized
  * namespace cache) so timings match the per-round bench conditions. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = graft.core.GraftSession.builder(
      master = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.contains("warm")) {
      graft.core.Tables.lineitem(spark, sfDir).count()
      graft.core.Tables.documents(spark, sfDir).count()
      graft.core.Namespace.inodes(spark, sfDir).count()
    }
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    if (args.contains("time")) {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = df.count()
        println(f"TIMING run=$i rows=$n elapsed=${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
