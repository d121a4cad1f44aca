package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{Namespace, NamespaceSql}
import graft.functions.{size_bucket, bucket_upper, SizeBucketSql}

/** HFSA report surface re-expressed as Spark plans over the derived inode
  * namespace (SURVEY §2.1/§2.2). Each query cites the reference command it
  * mirrors. Oracles re-derive the namespace via [[NamespaceSql.cte]].
  *
  * Scale posture: the namespace view is fact⋈broadcast-dims with no shuffle;
  * every report below aggregates it with partial (map-side) combine on a
  * small key domain, so the only shuffles are on final group keys. The
  * parent-path rollup is an explode(≤6 ancestors)→groupBy — the distributed
  * form of HFSA's in-memory aggregatePaths
  * (tool/.../SmallFilesReportCommand.java:216-229).
  */
object NamespaceQueries extends QueryModule {

  private val SmallLimit = 2L * 1024 * 1024 // HFSA default small-file limit (2 MiB)

  private def inodes(spark: SparkSession, sfDir: String): DataFrame =
    Namespace.inodes(spark, sfDir)

  private def files(spark: SparkSession, sfDir: String): DataFrame =
    Namespace.files(spark, sfDir)

  private def typeCount(t: String): Column =
    sum(when(col("ftype") === t, 1L).otherwise(0L))

  /** Ancestor directory prefixes of a file path at depth 5:
    * "/", "/r", "/r/n", "/r/n/user", "/r/n/user/order". The distributed
    * parent-path rollup key (explode is map-side; partial agg collapses
    * before the shuffle). */
  private def ancestors(path: Column): Column = {
    val p = split(path, "/") // ["", r, n, u, o, file]
    array(
      lit("/"),
      concat(lit("/"), p.getItem(1)),
      concat(lit("/"), p.getItem(1), lit("/"), p.getItem(2)),
      concat(lit("/"), p.getItem(1), lit("/"), p.getItem(2), lit("/"), p.getItem(3)),
      concat(lit("/"), p.getItem(1), lit("/"), p.getItem(2), lit("/"), p.getItem(3),
             lit("/"), p.getItem(4)))
  }

  /** DuckDB twin of [[ancestors]]. */
  private val ancestorsSql =
    """list_value('/',
        '/' || sp[2],
        '/' || sp[2] || '/' || sp[3],
        '/' || sp[2] || '/' || sp[3] || '/' || sp[4],
        '/' || sp[2] || '/' || sp[3] || '/' || sp[4] || '/' || sp[5])"""

  // ---------------------------------------------------------------- summary

  /** SummaryReportCommand overall block: #groups/#users/#dirs/#symlinks/
    * #files/Σsize/Σcsize/#blocks (reference tool/.../SummaryReportCommand
    * .java:229-246). */
  def summaryOverall(spark: SparkSession, sfDir: String): DataFrame =
    inodes(spark, sfDir).agg(
      countDistinct(col("grp")).as("n_groups"),
      countDistinct(col("owner")).as("n_users"),
      typeCount("D").as("n_dirs"),
      typeCount("S").as("n_symlinks"),
      typeCount("F").as("n_files"),
      sum(col("size")).as("sum_size"),
      sum(col("csize")).as("sum_csize"),
      sum(col("blocks")).as("sum_blocks"))

  val summaryOverallSql: String = NamespaceSql.cte + """
    SELECT CAST(count(DISTINCT grp) AS bigint) AS n_groups,
           CAST(count(DISTINCT owner) AS bigint) AS n_users,
           CAST(sum(CASE WHEN ftype='D' THEN 1 ELSE 0 END) AS bigint) AS n_dirs,
           CAST(sum(CASE WHEN ftype='S' THEN 1 ELSE 0 END) AS bigint) AS n_symlinks,
           CAST(sum(CASE WHEN ftype='F' THEN 1 ELSE 0 END) AS bigint) AS n_files,
           CAST(sum(size) AS bigint) AS sum_size,
           CAST(sum(csize) AS bigint) AS sum_csize,
           CAST(sum(blocks) AS bigint) AS sum_blocks
    FROM inodes"""

  /** SummaryReportCommand per-user block, sorted by file size (sort option
    * `fs`, SummaryReportCommand.java:103-117). */
  def summaryByUser(spark: SparkSession, sfDir: String): DataFrame =
    inodes(spark, sfDir)
      .groupBy(col("owner"))
      .agg(
        typeCount("D").as("n_dirs"),
        typeCount("S").as("n_symlinks"),
        typeCount("F").as("n_files"),
        sum(col("size")).as("sum_size"),
        sum(col("csize")).as("sum_csize"),
        sum(col("blocks")).as("sum_blocks"))
      .orderBy(col("sum_size").desc, col("owner"))

  val summaryByUserSql: String = NamespaceSql.cte + """
    SELECT owner,
           CAST(sum(CASE WHEN ftype='D' THEN 1 ELSE 0 END) AS bigint) AS n_dirs,
           CAST(sum(CASE WHEN ftype='S' THEN 1 ELSE 0 END) AS bigint) AS n_symlinks,
           CAST(sum(CASE WHEN ftype='F' THEN 1 ELSE 0 END) AS bigint) AS n_files,
           CAST(sum(size) AS bigint) AS sum_size,
           CAST(sum(csize) AS bigint) AS sum_csize,
           CAST(sum(blocks) AS bigint) AS sum_blocks
    FROM inodes
    GROUP BY owner
    ORDER BY sum_size DESC, owner"""

  /** SummaryReportCommand per-group block, sorted by file count (`fc`). */
  def summaryByGroup(spark: SparkSession, sfDir: String): DataFrame =
    inodes(spark, sfDir)
      .groupBy(col("grp"))
      .agg(
        typeCount("D").as("n_dirs"),
        typeCount("S").as("n_symlinks"),
        typeCount("F").as("n_files"),
        sum(col("size")).as("sum_size"),
        sum(col("csize")).as("sum_csize"),
        sum(col("blocks")).as("sum_blocks"))
      .orderBy(col("n_files").desc, col("grp"))

  val summaryByGroupSql: String = NamespaceSql.cte + """
    SELECT grp,
           CAST(sum(CASE WHEN ftype='D' THEN 1 ELSE 0 END) AS bigint) AS n_dirs,
           CAST(sum(CASE WHEN ftype='S' THEN 1 ELSE 0 END) AS bigint) AS n_symlinks,
           CAST(sum(CASE WHEN ftype='F' THEN 1 ELSE 0 END) AS bigint) AS n_files,
           CAST(sum(size) AS bigint) AS sum_size,
           CAST(sum(csize) AS bigint) AS sum_csize,
           CAST(sum(blocks) AS bigint) AS sum_blocks
    FROM inodes
    GROUP BY grp
    ORDER BY n_files DESC, grp"""

  /** File-size histogram with the reference's exponential bucket model,
    * via the codegen'd [[graft.functions.SizeBucketExpr]]. Bucket domain is
    * tiny → partial agg collapses each partition before the shuffle. */
  def sizeHistogram(spark: SparkSession, sfDir: String): DataFrame =
    files(spark, sfDir)
      .select(size_bucket(col("size")).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_files"))
      .select(col("bucket"), bucket_upper(col("bucket")).as("upper_bytes"), col("n_files"))
      .orderBy(col("bucket"))

  val sizeHistogramSql: String = NamespaceSql.cte + s"""
    SELECT bucket, ${SizeBucketSql.upperBorderSql("bucket")} AS upper_bytes,
           count(*) AS n_files
    FROM (SELECT ${SizeBucketSql.caseSql("size")} AS bucket FROM inodes WHERE ftype='F')
    GROUP BY bucket
    ORDER BY bucket"""

  // ------------------------------------------------------------ small files

  /** SmallFilesReportCommand per-user block: count + share of all small
    * files in basis points (reference .java:278-295 + printUsersReport). */
  def smallFilesByUser(spark: SparkSession, sfDir: String): DataFrame =
    files(spark, sfDir)
      .filter(col("size") < SmallLimit)
      .groupBy(col("owner"))
      .agg(count(lit(1)).as("n_small"))
      .withColumn("pct_bp",
        floor(col("n_small") * 10000.0 / sum(col("n_small")).over(Window.partitionBy())).cast("long"))
      .orderBy(col("n_small").desc, col("owner"))

  val smallFilesByUserSql: String = NamespaceSql.cte + s"""
    SELECT owner, n_small,
           CAST(floor(n_small * 10000.0 / sum(n_small) OVER ()) AS bigint) AS pct_bp
    FROM (
      SELECT owner, count(*) AS n_small
      FROM inodes WHERE ftype='F' AND size < $SmallLimit
      GROUP BY owner
    )
    ORDER BY n_small DESC, owner"""

  /** SmallFilesReportCommand directory hotspots: small-file counts rolled
    * up every ancestor directory, top 20. */
  def smallFilesHotspots(spark: SparkSession, sfDir: String): DataFrame =
    files(spark, sfDir)
      .filter(col("size") < SmallLimit)
      .select(explode(ancestors(col("path"))).as("dir"))
      .groupBy(col("dir"))
      .agg(count(lit(1)).as("n_small"))
      .orderBy(col("n_small").desc, col("dir"))
      .limit(20)

  val smallFilesHotspotsSql: String = NamespaceSql.cte + s"""
    SELECT dir, count(*) AS n_small
    FROM (
      SELECT unnest($ancestorsSql) AS dir
      FROM (SELECT string_split(path, '/') AS sp FROM inodes
            WHERE ftype='F' AND size < $SmallLimit)
    )
    GROUP BY dir
    ORDER BY n_small DESC, dir
    LIMIT 20"""

  // ------------------------------------------------------------- user usage

  /** UserUsageReportCommand: Σ file size per directory (ancestor rollup)
    * for one user, files older than the age cutoff
    * (reference .java:185-214), top 20 locations. */
  def userUsage(spark: SparkSession, sfDir: String): DataFrame =
    files(spark, sfDir)
      .filter(col("owner") === "user_7" && col("mtime_sec") < lit(962409600L)) // < 2000-07-01
      .select(explode(ancestors(col("path"))).as("dir"), col("size"))
      .groupBy(col("dir"))
      .agg(sum(col("size")).as("sum_size"), count(lit(1)).as("n_files"))
      .orderBy(col("sum_size").desc, col("dir"))
      .limit(20)

  val userUsageSql: String = NamespaceSql.cte + s"""
    SELECT dir, CAST(sum(size) AS bigint) AS sum_size, count(*) AS n_files
    FROM (
      SELECT unnest($ancestorsSql) AS dir, size
      FROM (SELECT string_split(path, '/') AS sp, size FROM inodes
            WHERE ftype='F' AND owner = 'user_7' AND mtime_sec < 962409600)
    )
    GROUP BY dir
    ORDER BY sum_size DESC, dir
    LIMIT 20"""

  // ------------------------------------------------------------ path report

  /** PathReportCommand: inode listing filtered by user regex
    * (reference .java:223-240), ls-style columns, ordered by path. */
  def pathReport(spark: SparkSession, sfDir: String): DataFrame =
    inodes(spark, sfDir)
      .filter(col("owner").rlike("^user_1[0-9]$"))
      .select(col("path"), col("ftype"), col("owner"), col("grp"), col("perm"))
      .orderBy(col("path"))
      .limit(5000)

  val pathReportSql: String = NamespaceSql.cte + """
    SELECT path, ftype, owner, grp, perm
    FROM inodes
    WHERE regexp_matches(owner, '^user_1[0-9]$')
    ORDER BY path
    LIMIT 5000"""

  /** InodeInfoCommand: point lookup by absolute path (reference
    * .java:71-88; id lookup maps to the path key in our model). At scale
    * this is a pushed-down IN filter over a path-sorted table. */
  def inodeLookup(spark: SparkSession, sfDir: String): DataFrame =
    inodes(spark, sfDir)
      .filter(col("path").isin("/", "/africa", "/asia"))
      .orderBy(col("path"))

  val inodeLookupSql: String = NamespaceSql.cte + """
    SELECT * FROM inodes
    WHERE path IN ('/', '/africa', '/asia')
    ORDER BY path"""

  // ----------------------------------------------------- replication / age

  /** Consumed-size accounting by replication factor (FsUtil
    * .getConsumedFileSize, reference lib/.../util/FsUtil.java:131-148). */
  def replicationStats(spark: SparkSession, sfDir: String): DataFrame =
    files(spark, sfDir)
      .groupBy(col("repl"))
      .agg(count(lit(1)).as("n_files"),
           sum(col("size")).as("sum_size"),
           sum(col("csize")).as("sum_csize"))
      .orderBy(col("repl"))

  val replicationStatsSql: String = NamespaceSql.cte + """
    SELECT repl, count(*) AS n_files,
           CAST(sum(size) AS bigint) AS sum_size,
           CAST(sum(csize) AS bigint) AS sum_csize
    FROM inodes WHERE ftype='F'
    GROUP BY repl
    ORDER BY repl"""

  /** Age profile: files and bytes by modification year (generalizes the
    * UserUsage age filter into a full distribution). */
  def ageProfile(spark: SparkSession, sfDir: String): DataFrame =
    files(spark, sfDir)
      .groupBy(year(timestamp_seconds(col("mtime_sec"))).as("mtime_year"))
      .agg(count(lit(1)).as("n_files"), sum(col("size")).as("sum_size"))
      .orderBy(col("mtime_year"))

  val ageProfileSql: String = NamespaceSql.cte + """
    SELECT year(make_timestamp(mtime_sec * 1000000)) AS mtime_year,
           count(*) AS n_files,
           CAST(sum(size) AS bigint) AS sum_size
    FROM inodes WHERE ftype='F'
    GROUP BY 1
    ORDER BY mtime_year"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ns_summary_overall"    -> (summaryOverall _),
    "q_ns_summary_by_user"    -> (summaryByUser _),
    "q_ns_summary_by_group"   -> (summaryByGroup _),
    "q_ns_size_histogram"     -> (sizeHistogram _),
    "q_ns_small_files_by_user"  -> (smallFilesByUser _),
    "q_ns_small_files_hotspots" -> (smallFilesHotspots _),
    "q_ns_user_usage"         -> (userUsage _),
    "q_ns_path_report"        -> (pathReport _),
    "q_ns_inode_lookup"       -> (inodeLookup _),
    "q_ns_replication"        -> (replicationStats _),
    "q_ns_age_profile"        -> (ageProfile _))

  val oracles: Map[String, String] = Map(
    "q_ns_summary_overall"    -> summaryOverallSql,
    "q_ns_summary_by_user"    -> summaryByUserSql,
    "q_ns_summary_by_group"   -> summaryByGroupSql,
    "q_ns_size_histogram"     -> sizeHistogramSql,
    "q_ns_small_files_by_user"  -> smallFilesByUserSql,
    "q_ns_small_files_hotspots" -> smallFilesHotspotsSql,
    "q_ns_user_usage"         -> userUsageSql,
    "q_ns_path_report"        -> pathReportSql,
    "q_ns_inode_lookup"       -> inodeLookupSql,
    "q_ns_replication"        -> replicationStatsSql,
    "q_ns_age_profile"        -> ageProfileSql)
}
