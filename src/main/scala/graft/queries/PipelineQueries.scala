package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Dedup

/** Driver-oracle coverage for the composed curation chain
  * ([[graft.Pipeline]]): the pipeline's stage counts as a query, with the
  * whole chain re-derived in DuckDB from the SAME CTE definitions its
  * component queries already use (exact-dedup key, jaccard pairs +
  * connected components + keep-best, per-language rank-ceil quality gate,
  * prefix-sum packing, replayed k-means trajectory). This checks the
  * COMPOSITION — each stage feeding the next — not just the pieces.
  */
object PipelineQueries extends QueryModule {

  /** Stage keys checked against the oracle, in stage order. The two
    * spec-style invariants Pipeline also prints (argmin violations, wcss
    * non-zero) are assertions, not data, and stay spec-covered. */
  private val Stages = Seq("docs", "after_exact_dedup", "after_neardup_keep",
    "after_quality_gate", "packed_sequences", "kmeans_clusters",
    "cluster_medoids")

  def pipelineCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val m = graft.Pipeline.run(spark, sfDir)
      .map { case (k, v, _) => k -> v }.toMap
    import spark.implicits._
    Stages.zipWithIndex
      .map { case (s, i) => (i + 1L, s, m(s)) }
      .toDF("stage_id", "stage", "n")
  }

  /** The full chain in one DuckDB statement. CTE sources: corpus mirrors
    * Pipeline stage 1 (min doc_id per raw-md5 text); the shingle → pairs →
    * recursive-reach → keep-best chain is TextQueries.clusterLabCtes
    * re-rooted at `corpus` (Pipeline.MinJaccardBp, same df cap); the gate
    * is qualityFilterSql's rank-ceil cut at Pipeline.QualityQuantile per
    * language; packing is packSequencesSql's exclusive prefix sum at
    * Pipeline.SeqTokens; the k-means tail is VectorQueries.kmeansCtes
    * verbatim (WITH stripped — one merged WITH RECURSIVE list). All
    * tuning constants interpolate from their Pipeline/VectorQueries
    * definition sites, so the two sides cannot drift. */
  val pipelineCountsSql: String = {
    val kmeans = VectorQueries.kmeansCtes.trim.stripPrefix("WITH")
    s"""
    WITH RECURSIVE corpus AS (
      SELECT d.doc_id, d.text, d.lang, d.n_chars
      FROM documents d
      WHERE d.doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text))
    ), sh0 AS (
      SELECT doc_id, unnest(${TextQueries.shingleKeysSql("text")}) AS sh
      FROM (SELECT doc_id, text, string_split_regex(text, '\\s+') AS w FROM corpus)
    ), counts AS (
      SELECT doc_id, count(*) AS n_sh FROM sh0 GROUP BY doc_id
    ), shk AS (
      SELECT doc_id, sh FROM (
        SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS df FROM sh0
      ) WHERE df <= ${Dedup.DefaultMaxShingleDf}
    ), prs AS (
      SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS n_common
      FROM shk x JOIN shk y ON x.sh = y.sh AND x.doc_id < y.doc_id
      GROUP BY x.doc_id, y.doc_id
    ), edges0 AS (
      SELECT doc_a, doc_b FROM prs
      JOIN counts ca ON doc_a = ca.doc_id
      JOIN counts cb ON doc_b = cb.doc_id
      WHERE floor(n_common * 10000.0 / (ca.n_sh + cb.n_sh - n_common))
              >= ${graft.Pipeline.MinJaccardBp}
    ), edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM edges0
      UNION ALL SELECT doc_b, doc_a FROM edges0
    ), reach(id, r) AS (
      SELECT doc_id, doc_id FROM corpus
      UNION
      SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id
    ), lab AS (
      SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id
    ), survivors AS (
      SELECT c.doc_id, c.text, c.lang
      FROM corpus c
      WHERE c.doc_id IN (
        SELECT (min({'s': -x.n_chars, 'd': x.doc_id})).d
        FROM lab l JOIN corpus x ON l.doc_id = x.doc_id
        GROUP BY l.cluster_id
      )
    ), scored AS (
      SELECT doc_id, lang, text, ${TextQueries.qualityBpSql} AS q_bp
      FROM survivors
    ), thr AS (
      SELECT doc_id, text, q_bp,
             max(CASE WHEN rn = CAST(ceil(${graft.Pipeline.QualityQuantile} * n) AS bigint)
                      THEN q_bp END)
               OVER (PARTITION BY lang) AS thr_bp
      FROM (
        SELECT doc_id, lang, text, q_bp,
               row_number() OVER (PARTITION BY lang ORDER BY q_bp) AS rn,
               count(*) OVER (PARTITION BY lang) AS n
        FROM scored
      )
    ), gated AS (
      SELECT doc_id, text FROM thr WHERE q_bp >= thr_bp
    ), packed AS (
      SELECT doc_id,
             CAST(len(string_split_regex(text, '\\s+')) AS bigint) AS n_tokens,
             CAST(coalesce(sum(len(string_split_regex(text, '\\s+')))
               OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS bigint) AS prefix_excl
      FROM gated
    ), $kmeans
    SELECT CAST(stage_id AS bigint) AS stage_id, stage, CAST(n AS bigint) AS n
    FROM (
      SELECT 1 AS stage_id, 'docs' AS stage,
             (SELECT count(*) FROM documents) AS n
      UNION ALL SELECT 2, 'after_exact_dedup', (SELECT count(*) FROM corpus)
      UNION ALL SELECT 3, 'after_neardup_keep', (SELECT count(*) FROM survivors)
      UNION ALL SELECT 4, 'after_quality_gate', (SELECT count(*) FROM gated)
      UNION ALL SELECT 5, 'packed_sequences',
        (SELECT coalesce(max((prefix_excl + n_tokens - 1) // ${graft.Pipeline.SeqTokens}), -1) + 1
         FROM packed)
      UNION ALL SELECT 6, 'kmeans_clusters', (SELECT count(DISTINCT k) FROM fin)
      UNION ALL SELECT 7, 'cluster_medoids', (SELECT count(DISTINCT k) FROM fin)
    )
    ORDER BY stage_id"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p_pipeline_counts" -> (pipelineCounts _))

  val oracles: Map[String, String] = Map(
    "p_pipeline_counts" -> pipelineCountsSql)
}
