package graft

import org.apache.spark.sql.functions._

/** Text/dedup-family scale soak (the ImageBench treatment for the pipeline
  * side, r5 VERDICT item 5): synthesizes a `mult`× corpus FROM the harness
  * documents/embeddings tables — deterministic per-replica mutations so the
  * scaled corpus has realistic duplicate structure — then runs the composed
  * [[Pipeline]] (exact dedup → jaccard pairs → connected components →
  * keep-best → quality gate → packing → k-means) plus the standalone
  * MinHash-LSH banding chain over it, recording per-stage wall time and
  * peak heap under whatever -Xmx cap SPARK_DRIVER_MEM imposes. A capped
  * run that COMPLETES is the proof the chain is bucketed, never quadratic:
  * an all-pairs join or a driver-side materialization at 20× the sf0.1
  * corpus would blow a 4 GiB heap long before finishing.
  *
  * Replica structure, mode = (doc_id·31 + r) mod 10 (r = replica, r=0 keeps
  * the original): 3/10 byte-exact copies (exact-dedup load), 4/10 near-dups
  * (one appended replica-unique token → Jaccard ≈ 0.87, well above the 0.2
  * pair threshold, so families CLUSTER), 3/10 reversed-text rewrites (a
  * second near-dup family per doc, lexically disjoint from the first).
  * Embeddings get a per-(vec_id, r, dim) deterministic perturbation so
  * k-means sees `mult`× distinct points, not duplicates.
  *
  * `runMain graft.PipelineBench [mult] [shufflePartitions]` (defaults 20 /
  * max(32, 2.56·mult); env SPARK_GRAFT_SF_DIR = base corpus, default sf0.1;
  * SPARK_GRAFT_CPUS; SPARK_DRIVER_MEM). One JSON line on stdout.
  */
object PipelineBench {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(20)
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    // Partition count is THE memory knob under a fixed heap: in local mode
    // one JVM holds every concurrent task's shuffle working set, and the
    // pair-join working set per partition grows with the corpus — a real
    // cluster scales out executors/partitions, so the soak scales the
    // partition count with mult instead of asking for more heap
    // (2nd arg, default 32 at mult≤20 → 128 at mult=50).
    val parts = args.drop(1).headOption.map(_.toInt)
      .getOrElse(math.max(32, (mult * 2.56).toInt))
    val spark = graft.core.GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = parts).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("graft_plsoak").toString
    import SoakUtil.{time, ms3}

    // --- corpus synthesis (distributed: a crossJoin against the replica
    // range plus codegen'd string ops; nothing is collected driver-side)
    val reps = spark.range(mult).toDF("r")
    val mode = pmod(col("doc_id") * 31 + col("r"), lit(10))
    val mutated = when(col("r") === 0 || mode < 3, col("text"))
      .when(mode < 7, concat(col("text"), lit(" nd"), col("r"), lit("x"), col("doc_id")))
      .otherwise(concat(lit("rv"), col("r"), lit(" "), reverse(col("text"))))
    val (tGenDocs, nDocs) = time {
      graft.core.Tables.documents(spark, base)
        .crossJoin(reps)
        .select((col("doc_id") + col("r") * 1000000L).as("doc_id"),
          mutated.as("text"), col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      spark.read.parquet(s"$dir/documents.parquet").count()
    }
    val (tGenEmbs, nEmbs) = time(SoakUtil.synthEmbeddings(spark, base, mult, dir))
    require(nDocs == mult.toLong * graft.core.Tables.documents(spark, base).count(),
      s"scaled corpus row count $nDocs != mult x base")

    // --- the composed pipeline, per-stage timed
    val (tPipe, stages) = time(Pipeline.run(spark, dir))

    // --- the MinHash-LSH banding chain standalone (the jaccard chain runs
    // inside Pipeline; this is the OTHER sketch family's candidate join)
    val (tMinhash, nMinhashPairs) = time(
      graft.queries.VectorQueries.dedupMinhash(spark, dir).count())

    val peakHeapMb = SoakUtil.peakHeapMb
    val rows = stages.map { case (k, v, _) => s""""$k":$v""" }.mkString("{", ",", "}")
    val secs = stages.map { case (k, _, s) => s""""$k":${ms3(s)}""" }.mkString("{", ",", "}")
    println(s"""{"metric":"pipeline_soak","mult":$mult,"shuffle_partitions":$parts,"docs":$nDocs,"embeddings":$nEmbs,""" +
      s""""gen_docs_sec":${ms3(tGenDocs)},"gen_embs_sec":${ms3(tGenEmbs)},""" +
      s""""pipeline_sec":${ms3(tPipe)},"stage_rows":$rows,"stage_sec":$secs,""" +
      s""""minhash_pairs":$nMinhashPairs,"minhash_sec":${ms3(tMinhash)},""" +
      s""""peak_heap_mb":$peakHeapMb,"xmx":"${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}","base":"$base"}""")
    // best-effort cleanup of the synthesized corpus
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.stop()
  }
}
