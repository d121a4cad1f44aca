package graft

import org.apache.spark.sql.functions._

/** ANN-family scale soak (the [[PipelineBench]] treatment for the vector
  * side): synthesizes a `mult`× embedding table from the harness corpus —
  * the same deterministic per-(vec_id, replica, dim) perturbation
  * PipelineBench uses, so the scaled table has `mult`× DISTINCT points,
  * not duplicates — and runs every compressed/bucketed index family over
  * it under whatever -Xmx cap SPARK_DRIVER_MEM imposes: IVF (cells),
  * PQ (codes), IVF-PQ (composed), IVF-SQ8 (scalar codes) and the
  * IVF-PQ + exact-rerank refine. A capped run that completes is the
  * structural proof none of these paths hides a quadratic scan or a
  * driver-side materialization: at 50× (250k vectors) an all-pairs join
  * would be 6.25·10¹⁰ pairs, far past any 4 GiB heap.
  *
  * The original vec_ids 0-9 stay the probe queries at every mult (replica
  * ids are offset by 10⁶), so per-family costs are comparable across
  * scales: candidate-generation cost grows with the corpus, per-query
  * exact work stays bounded (nprobe cells / top-50 refine).
  *
  * `runMain graft.AnnBench [mult] [shufflePartitions]` (defaults 50 /
  * max(32, 1.28·mult); env SPARK_GRAFT_SF_DIR = base corpus, default
  * sf0.1; SPARK_GRAFT_CPUS; SPARK_DRIVER_MEM). One JSON line on stdout.
  */
object AnnBench {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(50)
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val parts = args.drop(1).headOption.map(_.toInt)
      .getOrElse(math.max(32, (mult * 1.28).toInt))
    val spark = graft.core.GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = parts).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("graft_annsoak").toString
    import SoakUtil.{time, ms3}
    val (tGen, nEmbs) = time(SoakUtil.synthEmbeddings(spark, base, mult, dir))

    val families = Seq(
      "e_ann_ivf", "e_ann_pq", "e_ann_ivfpq", "e_ann_ivfsq",
      "e_ann_ivfpq_rerank")
    val timed = families.map { name =>
      val (sec, rows) = time(SparkEntry.queries(name)(spark, dir).count())
      System.err.println(f"[annbench] $name%-20s $sec%7.2f s  rows=$rows")
      // drop per-query checkpoints (codebooks etc.) before the next family
      spark.sparkContext.getPersistentRDDs.foreach(_._2.unpersist(false))
      System.gc()
      (name, sec, rows)
    }

    val peakHeapMb = SoakUtil.peakHeapMb
    val secs = timed.map { case (k, s, _) => s""""$k":${ms3(s)}""" }.mkString("{", ",", "}")
    val rows = timed.map { case (k, _, n) => s""""$k":$n""" }.mkString("{", ",", "}")
    println(s"""{"metric":"ann_soak","mult":$mult,"shuffle_partitions":$parts,""" +
      s""""vectors":$nEmbs,"gen_sec":${ms3(tGen)},"family_sec":$secs,"family_rows":$rows,""" +
      s""""peak_heap_mb":$peakHeapMb,"xmx":"${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}","base":"$base"}""")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.stop()
  }
}
