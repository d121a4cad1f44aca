package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derives a deterministic HDFS-like inode namespace from the TPC-H-ish
  * test tables, so HFSA-style reports (see SURVEY §2.2) have a namespace to
  * run on and the DuckDB oracle can re-derive the exact same rows
  * ([[NamespaceSql.cte]]).
  *
  * Layout (SURVEY §3):
  * {{{
  * /<region>/<nation>/user_<c_custkey%20>/order_<o_orderkey>/part_<l_partkey>_<l_linenumber>
  * }}}
  *
  * Scale posture: files come from `lineitem` (the 100 TB fact table) joined
  * to dimension tables that Spark broadcasts at test scale (AQE decides at
  * real scale); everything below is a pure map-side projection, so the
  * namespace view adds no shuffle of its own. Directory rows are distinct
  * prefixes — aggregations over strictly smaller inputs.
  *
  * Determinism: only integer/string/floor/ceil arithmetic (bit-identical in
  * Spark and DuckDB); sizes are integer bytes derived via
  * `floor(l_extendedprice*100)`, never order-dependent double sums.
  *
  * Schema: path, name, ftype ('F'ile/'D'ir/'S'ymlink), user, grp, perm,
  * size, csize (size × replication, FsUtil.getConsumedFileSize semantics,
  * reference lib/.../util/FsUtil.java:131), repl, blocks, mtime_sec, depth.
  */
object Namespace {

  val BlockSize = 65536L // 64 KiB synthetic block size

  // The namespace is the shared input of every q_ns_* report: materialize
  // it once per (session, sfDir) — exactly what a production deployment
  // does with a materialized inode table — instead of re-running the dim
  // joins per report. Cache is lazy; first report pays the build.
  // LRU-bounded so long-lived sessions cycling through many sfDirs don't
  // accumulate cached plans: the evicted entry is unpersisted.
  private val MaxMemo = 8
  private val memo =
    new java.util.LinkedHashMap[(String, String), DataFrame](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String), DataFrame]): Boolean =
        size > MaxMemo && {
          try e.getValue.unpersist(false) catch { case _: Throwable => () }
          true
        }
    }

  /** Full inode table: files ∪ directories ∪ symlinks (memoized+cached). */
  def inodes(spark: SparkSession, sfDir: String): DataFrame = memo.synchronized {
    memo.computeIfAbsent((sessionKey(spark), sfDir),
      _ => build(spark, sfDir).cache())
  }

  private def sessionKey(spark: SparkSession): String =
    org.apache.spark.sql.graftshim.sessionKey(spark)

  private def build(spark: SparkSession, sfDir: String): DataFrame = {
    val region   = Tables.region(spark, sfDir)
    val nation   = Tables.nation(spark, sfDir)
    val customer = Tables.customer(spark, sfDir)
    val orders   = Tables.orders(spark, sfDir)
    val lineitem = Tables.lineitem(spark, sfDir)

    // Customer joined up the dim chain once; reused by all levels.
    val cust = customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(
        col("c_custkey"),
        lower(col("r_name")).as("rdir"),
        lower(col("n_name")).as("ndir"),
        concat(lit("user_"), (col("c_custkey") % 20).cast("string")).as("owner"),
        concat(lit("grp_"), lower(col("n_name"))).as("grp"))
      .cache() // tiny (|customer| rows); feeds 5 of the 7 union branches

    val ordCust = orders.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("rdir"), col("ndir"), col("owner"), col("grp"))
      .cache() // |orders| rows; reused by the files join and the d4 distinct

    val files = lineitem
      .join(ordCust, col("l_orderkey") === col("o_orderkey"))
      .select(
        concat(lit("/"), col("rdir"), lit("/"), col("ndir"), lit("/"), col("owner"),
               lit("/order_"), col("o_orderkey").cast("string")).as("dir"),
        concat(lit("part_"), col("l_partkey").cast("string"), lit("_"),
               col("l_linenumber").cast("string")).as("name"),
        col("owner"), col("grp"),
        floor(col("l_extendedprice") * 100).cast("long").as("size"),
        (lit(1) + col("l_linenumber") % 3).as("repl"),
        unix_timestamp(col("l_shipdate")).as("mtime_sec"))
      .select(
        concat(col("dir"), lit("/"), col("name")).as("path"),
        col("name"), lit("F").as("ftype"), col("owner"), col("grp"),
        lit("0644").as("perm"), col("size"),
        (col("size") * col("repl")).as("csize"), col("repl"),
        ceil(col("size") / lit(BlockSize.toDouble)).as("blocks"),
        col("mtime_sec"), lit(5).as("depth"))

    def dirRow(pathCol: org.apache.spark.sql.Column, nameCol: org.apache.spark.sql.Column,
               userCol: org.apache.spark.sql.Column, grpCol: org.apache.spark.sql.Column,
               depth: Int)(src: DataFrame): DataFrame =
      src.select(pathCol.as("path"), nameCol.as("name"), userCol.as("owner"), grpCol.as("grp"), lit(depth).as("depth"))
        .distinct()
        .select(col("path"), col("name"), lit("D").as("ftype"), col("owner"), col("grp"),
          lit("0755").as("perm"), lit(0L).as("size"), lit(0L).as("csize"),
          lit(0).as("repl"), lit(0L).as("blocks"), lit(0L).as("mtime_sec"), col("depth"))

    val d4 = dirRow(
      concat(lit("/"), col("rdir"), lit("/"), col("ndir"), lit("/"), col("owner"),
             lit("/order_"), col("o_orderkey").cast("string")),
      concat(lit("order_"), col("o_orderkey").cast("string")),
      col("owner"), col("grp"), 4)(ordCust)

    val d3 = dirRow(
      concat(lit("/"), col("rdir"), lit("/"), col("ndir"), lit("/"), col("owner")),
      col("owner"), col("owner"), col("grp"), 3)(cust)

    val d2 = dirRow(
      concat(lit("/"), col("rdir"), lit("/"), col("ndir")),
      col("ndir"), lit("hdfs"), lit("hadoop"), 2)(cust)

    val d1 = dirRow(concat(lit("/"), col("rdir")), col("rdir"),
      lit("hdfs"), lit("hadoop"), 1)(cust)

    val root = dirRow(lit("/"), lit(""), lit("hdfs"), lit("hadoop"), 0)(
      cust.limit(1))

    val symlinks = cust.filter(col("c_custkey") % 50 === 0)
      .select(
        concat(lit("/"), col("rdir"), lit("/"), col("ndir"), lit("/"), col("owner"),
               lit("/link_"), col("c_custkey").cast("string")).as("path"),
        concat(lit("link_"), col("c_custkey").cast("string")).as("name"),
        lit("S").as("ftype"), col("owner"), col("grp"), lit("0777").as("perm"),
        lit(0L).as("size"), lit(0L).as("csize"), lit(0).as("repl"),
        lit(0L).as("blocks"), lit(0L).as("mtime_sec"), lit(4).as("depth"))

    files.unionByName(d4).unionByName(d3).unionByName(d2).unionByName(d1)
      .unionByName(root).unionByName(symlinks)
  }

  /** File inodes only — the common input of most reports. */
  def files(spark: SparkSession, sfDir: String): DataFrame =
    inodes(spark, sfDir).filter(col("ftype") === "F")
}
