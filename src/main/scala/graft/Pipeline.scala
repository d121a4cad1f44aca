package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Dedup, KMeans, PrefixSum}

/** End-to-end curation pipeline — the operators composed the way a
  * production run chains them, with shared artifacts computed ONCE:
  * the surviving corpus is `localCheckpoint`'d between stages (each stage
  * reads the previous stage's materialization, not a re-derivation), and
  * one k-means fit feeds cluster sizes, quality metrics AND medoids.
  * [[Bench]] measures every query standalone by design; this main is the
  * reuse counterpoint — the library surface a pipeline author actually
  * holds.
  *
  * Stages: exact dedup → near-dup keep-best → per-language quality gate
  * (bottom quartile dropped) → context-window packing; embeddings: one
  * Lloyd fit → three cluster views. Prints ONE JSON line of stage counts.
  *
  * `runMain graft.Pipeline [sfDir]` (env: SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_CPUS).
  */
object Pipeline {

  // private[graft]: the driver oracle (PipelineQueries.pipelineCountsSql)
  // interpolates these same values — one definition site, so a tuning
  // change can't silently desync the Spark chain from its DuckDB replay
  private[graft] val SeqTokens = 2048L // packed context-window length
  private[graft] val MinJaccardBp = 2000 // near-dup pair threshold
  private[graft] val QualityQuantile = 0.25 // per-language gate cut

  /** Runs the chain; returns (stage → rows) in stage order. */
  def run(spark: SparkSession, sfDir: String): Seq[(String, Long)] = {
    val out = Seq.newBuilder[(String, Long)]
    val docs = Tables.documents(spark, sfDir)
    out += "docs" -> docs.count()

    // 1. exact dedup: keep the smallest doc_id of each distinct text
    val exactKeep = docs
      .groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val afterExact = docs.join(exactKeep, "doc_id").localCheckpoint()
    out += "after_exact_dedup" -> afterExact.count()

    // 2. near-dup: shingle-Jaccard pairs → components → best (longest,
    //    then smallest-id) survivor per cluster — over the EXACT-dedup'd
    //    corpus, so the pair join never re-finds byte-identical copies
    val pairs = Dedup
      .ngramJaccardPairs(afterExact, minJaccardBp = MinJaccardBp, sorted = false)
      .select(col("doc_a"), col("doc_b"))
    val labels = Dedup.connectedComponents(pairs, afterExact.select(col("doc_id")))
    val nearKeep = Dedup
      .keepBest(labels, afterExact.select(col("doc_id"), col("n_chars").as("score")))
      .select(col("doc_id"))
    val afterNear = afterExact.join(nearKeep, "doc_id").localCheckpoint()
    out += "after_neardup_keep" -> afterNear.count()

    // 3. quality gate: drop each language's bottom quartile — the SAME
    //    rank-ceil threshold definition as t_quality_filter, via the
    //    shared groupPercentile helper
    val scored = afterNear.withColumn("q_bp",
      graft.queries.TextQueries.qualityBp(col("text")))
    val gated = graft.queries.TextQueries
      .groupPercentile(scored, "lang", "q_bp", QualityQuantile)
      .filter(col("q_bp") >= col("thr_bp"))
      .select(col("doc_id"), col("text"))
      .localCheckpoint()
    out += "after_quality_gate" -> gated.count()

    // 4. context-window packing: exclusive prefix sum of token counts in
    //    doc_id order assigns each token stream its window; the sequence
    //    COUNT is the highest window any token lands in, +1 — counting
    //    distinct doc-START windows would skip windows interior to a
    //    longer-than-window document
    val packed = PrefixSum.exclusive(
        gated.select(col("doc_id"),
          size(split(col("text"), "\\s+")).cast("long").as("n_tokens")),
        keyCol = "doc_id", valueCol = "n_tokens")
    // coalesce(-1): an empty surviving corpus has a NULL max → 0 sequences
    val nSeq = packed
      .agg(coalesce(
        max(expr(s"(prefix_excl + n_tokens - 1) DIV $SeqTokens")), lit(-1L))
        .as("m"))
      .head().getLong(0) + 1
    out += "packed_sequences" -> nSeq

    // 5. embeddings: ONE fit, three views (what Bench measures standalone)
    val fit = KMeans.fit(Tables.embeddings(spark, sfDir),
        k = graft.queries.VectorQueries.KmeansK,
        iters = graft.queries.VectorQueries.KmeansIters)
      .localCheckpoint()
    out += "kmeans_clusters" -> fit.select(col("cluster")).distinct().count()
    val medoids = fit.groupBy(col("cluster"))
      .agg(min(struct(col("dist"), col("vec_id"))).as("m"))
      .select(col("cluster"), col("m.dist").as("mdist"))
    // the medoid dist must BE the cluster's min dist — a broken argmin
    // (e.g. wrong struct field order) shows up as a violation here
    val violations = medoids
      .join(fit.groupBy(col("cluster")).agg(min(col("dist")).as("lo")), "cluster")
      .filter(col("mdist") =!= col("lo")).count()
    out += "cluster_medoids" -> medoids.count()
    out += "medoid_argmin_violations" -> violations
    val wcss = fit.agg(sum(col("dist")).as("w")).head().getLong(0)
    out += "fit_wcss_nonzero" -> (if (wcss > 0) 1L else 0L)
    out.result()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .getOrElse(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.core.GraftSession.builder(master = s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val stages = run(spark, sfDir)
    val sec = (math.round((System.nanoTime() - t0) / 1e6) / 1000.0).toString
    val body = stages.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(s"""{"metric":"pipeline","sec":$sec,"stages":$body,"sf":"$sfDir"}""")
    spark.stop()
  }
}
