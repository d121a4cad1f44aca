package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.ReportSink

/** CLI for the training-data pipeline surface — the [[Tool]] counterpart
  * for a document corpus instead of an fsimage: run the dedup / quality /
  * sampling / packing operators against a parquet corpus directory from
  * the command line, no Scala required. Every command delegates to the
  * same oracle-checked query functions `SparkEntry.queries` exposes (or
  * the underlying operator when a threshold is parameterized), so the CLI
  * adds zero new semantics to test — only dispatch, which CorpusToolSpec
  * drives end-to-end.
  *
  * usage: `runMain graft.CorpusTool <command> <corpusDir> [options]`
  *
  * commands: stats dedup minhash minhashkeep jaccard containment clusters
  * keep semdedup semdedupeval semdedupeval09 substrscrub semdecon ivfincr
  * quality gopher dsir spandup curriculum langid keywords
  * sample pack pii winnow winnoweval bpe wsample lenquantile rproject
  * ccnet sourcecap fertility bpeloop spanislands spanhist knngraph
  * knnrecall knndedup knnsearch knnsearcheval ivfrebalance
  * ivfrebalanceeval lshcurve pca pcavar bpeapply pcatopk pcatopkvar
  * pqrotateeval hnswsearch hnswrecall hnswsweep minhashb3 matryoshka
  * unigramseg unigramem hnswinsert zordereval
  * options: `-j bp` jaccard cut (default 2000), `-c bp` containment cut
  * (default 8000), `-l topN` txt row cap (default 20), `-o txt|csv|json`
  * (default txt), `--out path` for csv/json.
  */
object CorpusTool {

  /** Commands that are pure aliases of a `SparkEntry.queries` key. */
  private val Aliases = Map(
    "stats"       -> "t_token_budget",
    "dedup"       -> "d_dedup_exact",
    "minhash"     -> "d_dedup_minhash",
    "clusters"    -> "d_dedup_clusters",
    "keep"        -> "d_dedup_keep",
    "minhashkeep" -> "d_minhash_keep",
    "keywords"    -> "t_tfidf_keywords",
    "semdedup"    -> "d_semdedup",
    "semdedupeval" -> "d_semdedup_eval",
    "semdedupeval09" -> "d_semdedup_eval09",
    "substrscrub" -> "t_substr_scrub",
    "semdecon"    -> "e_decontaminate",
    "ivfincr"     -> "e_ann_ivf_incr",
    "quality"     -> "t_quality_score",
    "gopher"      -> "t_gopher_rules",
    "dsir"        -> "t_dsir_weight",
    "spandup"     -> "t_span_dup_rate",
    "curriculum"  -> "t_curriculum",
    "langid"      -> "t_lang_id",
    "sample"      -> "t_quality_sample",
    "pack"        -> "t_pack_sequences",
    "pii"         -> "t_pii_scrub",
    "winnow"      -> "d_winnow",
    "winnoweval"  -> "d_winnow_eval",
    "bpe"         -> "t_bpe_merges",
    "wsample"     -> "t_priority_sample",
    "lenquantile" -> "t_len_quantile_rollup",
    "rproject"    -> "e_rp_project",
    "ccnet"       -> "t_ccnet_bucket",
    "sourcecap"   -> "t_source_cap",
    "fertility"   -> "t_fertility",
    "bpeloop"     -> "t_bpe_loop",
    "spanislands" -> "t_span_islands",
    "spanhist"    -> "t_span_length_hist",
    "knngraph"    -> "e_knn_graph",
    "knnrecall"   -> "e_knn_recall",
    "knndedup"    -> "e_knn_mutual",
    "knnsearch"   -> "e_knn_search",
    "knnsearcheval" -> "e_knn_search_recall",
    "ivfrebalance" -> "e_ivf_rebalance",
    "ivfrebalanceeval" -> "e_ivf_rebalance_eval",
    "lshcurve"    -> "d_lsh_curve",
    "pca"         -> "e_pca_power",
    "pcavar"      -> "e_pca_var",
    "bpeapply"    -> "t_bpe_apply",
    "pcatopk"     -> "e_pca_topk",
    "pcatopkvar"  -> "e_pca_topk_var",
    "pqrotateeval" -> "e_pq_rotate_eval",
    "hnswsearch"  -> "e_hnsw_search",
    "hnswrecall"  -> "e_hnsw_recall",
    "hnswsweep"   -> "e_hnsw_sweep",
    "minhashb3"   -> "d_dedup_minhash_b3",
    "matryoshka"  -> "e_matryoshka_eval",
    "unigramseg"  -> "t_unigram_segment",
    "unigramem"   -> "t_unigram_em",
    "hnswinsert"  -> "e_hnsw_insert",
    "zordereval"  -> "q_zorder_prune_eval")

  def run(spark: SparkSession, cmd: String, dir: String,
          opts: Map[String, String]): DataFrame = cmd match {
    case "jaccard" =>
      graft.operators.Dedup.ngramJaccardPairs(
        graft.core.Tables.documents(spark, dir),
        minJaccardBp = opts.get("-j").map(_.toLong).getOrElse(2000L))
    case "containment" =>
      graft.operators.Dedup.shingleContainmentPairs(
        graft.core.Tables.documents(spark, dir),
        minContainBp = opts.get("-c").map(_.toLong).getOrElse(8000L))
    case c if Aliases.contains(c) => SparkEntry.queries(Aliases(c))(spark, dir)
    case other => throw new IllegalArgumentException(s"unknown command: $other " +
      s"(expected one of: ${("jaccard" :: "containment" :: Aliases.keys.toList).sorted.mkString(" ")})")
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: CorpusTool <command> <corpusDir> [options]")
    val cmd = args(0)
    val dir = args(1)
    val (opts, _, _) = Tool.parseArgs(args.drop(2).toSeq)
    val spark = graft.core.GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val df = run(spark, cmd, dir, opts)
      // -l is honored as given (unlike Tool's reference-parity 50-row
      // floor): `-l 10` prints 10 rows
      val topN = opts.get("-l").map(_.toInt).getOrElse(20)
      ReportSink.emit(df, opts, "/tmp/graft_corpus_out", maxRows = topN)
    } finally spark.stop()
  }
}
