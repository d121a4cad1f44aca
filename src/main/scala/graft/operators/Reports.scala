package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{size_bucket, bucket_upper}

/** HFSA report operators over any inode table with the graft namespace
  * schema (path, name, ftype, owner, grp, perm, size, csize, repl, blocks,
  * mtime_sec, depth) — both [[graft.core.Namespace]]'s derived table and
  * [[graft.sources.FsImageSource]]'s real fsimage load.
  *
  * Each operator cites the reference command it re-expresses; all are
  * single-shuffle aggregations with map-side partial combine.
  */
object Reports {

  /** Ancestor directory prefixes of an inode path at any depth, root
    * included — the distributed form of HFSA's in-memory parent rollup
    * (tool/.../SmallFilesReportCommand.java:216-229). Map-side explode;
    * the follow-up groupBy partially aggregates before shuffling. */
  def ancestors(path: Column): Column = {
    val p = split(path, "/") // ["", c1, c2, ...]
    val depth = size(p) - 1
    val up = transform(sequence(lit(1), depth - 1),
      i => concat(lit("/"), array_join(slice(p, lit(2), i), "/")))
    when(depth > 1, concat(array(lit("/")), up)).otherwise(array(lit("/")))
  }

  private def typeCount(t: String): Column =
    sum(when(col("ftype") === t, 1L).otherwise(0L))

  private def typeAggs: Seq[Column] = Seq(
    typeCount("D").as("n_dirs"),
    typeCount("S").as("n_symlinks"),
    typeCount("F").as("n_files"),
    sum(col("size")).as("sum_size"),
    sum(col("csize")).as("sum_csize"),
    sum(col("blocks")).as("sum_blocks"))

  /** SummaryReportCommand overall block. */
  def summaryOverall(inodes: DataFrame): DataFrame = {
    val aggs = countDistinct(col("grp")).as("n_groups") +:
      countDistinct(col("owner")).as("n_users") +: typeAggs
    inodes.agg(aggs.head, aggs.tail: _*)
  }

  /** SummaryReportCommand per-user block (sort option `fs`). */
  def summaryByUser(inodes: DataFrame): DataFrame =
    inodes.groupBy(col("owner")).agg(typeAggs.head, typeAggs.tail: _*)
      .orderBy(col("sum_size").desc, col("owner"))

  /** SummaryReportCommand per-group block (sort option `fc`). */
  def summaryByGroup(inodes: DataFrame): DataFrame =
    inodes.groupBy(col("grp")).agg(typeAggs.head, typeAggs.tail: _*)
      .orderBy(col("n_files").desc, col("grp"))

  /** Exponential file-size histogram (SizeBucket.Bucket2nModel). */
  def sizeHistogram(inodes: DataFrame): DataFrame =
    inodes.filter(col("ftype") === "F")
      .select(size_bucket(col("size")).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_files"))
      .select(col("bucket"), bucket_upper(col("bucket")).as("upper_bytes"), col("n_files"))
      .orderBy(col("bucket"))

  /** SmallFilesReportCommand per-user block: count + share (basis pts). */
  def smallFilesByUser(inodes: DataFrame, limitBytes: Long): DataFrame =
    inodes.filter(col("ftype") === "F" && col("size") < limitBytes)
      .groupBy(col("owner"))
      .agg(count(lit(1)).as("n_small"))
      .withColumn("pct_bp",
        floor(col("n_small") * 10000.0 / sum(col("n_small")).over(Window.partitionBy())).cast("long"))
      .orderBy(col("n_small").desc, col("owner"))

  /** SmallFilesReportCommand directory hotspots: ancestor rollup, top-N. */
  def smallFilesHotspots(inodes: DataFrame, limitBytes: Long, topN: Int): DataFrame =
    inodes.filter(col("ftype") === "F" && col("size") < limitBytes)
      .select(explode(ancestors(col("path"))).as("dir"))
      .groupBy(col("dir"))
      .agg(count(lit(1)).as("n_small"))
      .orderBy(col("n_small").desc, col("dir"))
      .limit(topN)

  /** UserUsageReportCommand: Σ size per ancestor dir for one user with an
    * age cutoff (mtime older than cutoffSec), top-N locations. */
  def userUsage(inodes: DataFrame, user: String, cutoffSec: Long, topN: Int): DataFrame =
    inodes.filter(col("ftype") === "F" && col("owner") === user &&
        col("mtime_sec") < cutoffSec)
      .select(explode(ancestors(col("path"))).as("dir"), col("size"))
      .groupBy(col("dir"))
      .agg(sum(col("size")).as("sum_size"), count(lit(1)).as("n_files"))
      .orderBy(col("sum_size").desc, col("dir"))
      .limit(topN)

  /** PathReportCommand: ls-style listing filtered by owner regex. */
  def pathReport(inodes: DataFrame, ownerRegex: String, maxRows: Int): DataFrame =
    inodes.filter(col("owner").rlike(ownerRegex))
      .select(col("path"), col("ftype"), col("owner"), col("grp"), col("perm"))
      .orderBy(col("path"))
      .limit(maxRows)

  /** InodeInfoCommand: point lookup by absolute paths. */
  def inodeLookup(inodes: DataFrame, paths: Seq[String]): DataFrame =
    inodes.filter(col("path").isin(paths: _*)).orderBy(col("path"))

  /** Consumed-size accounting by replication factor (FsUtil semantics). */
  def replicationStats(inodes: DataFrame): DataFrame =
    inodes.filter(col("ftype") === "F")
      .groupBy(col("repl"))
      .agg(count(lit(1)).as("n_files"),
           sum(col("size")).as("sum_size"),
           sum(col("csize")).as("sum_csize"))
      .orderBy(col("repl"))

  /** Age profile: files/bytes by modification year. */
  def ageProfile(inodes: DataFrame): DataFrame =
    inodes.filter(col("ftype") === "F")
      .groupBy(year(timestamp_seconds(col("mtime_sec"))).as("mtime_year"))
      .agg(count(lit(1)).as("n_files"), sum(col("size")).as("sum_size"))
      .orderBy(col("mtime_year"))
}
