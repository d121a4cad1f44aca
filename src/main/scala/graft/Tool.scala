package graft

import org.apache.spark.sql.DataFrame
import graft.operators.Reports
import graft.sources.{FsImageSource, ReportSink}
import graft.functions.IECBinaryImpl

/** CLI counterpart of the reference's `hfsa-tool`
  * (tool/.../HdfsFSImageTool.java): runs HFSA reports against an fsimage.
  *
  * {{{
  * runMain graft.Tool <command> <fsimage> [options]
  *   commands: summary | smallfiles | userusage | path | inode | acl |
  *             xattr | quotas | growth | dupnames | du | compaction |
  *             ext | sections | snapshots | refs | diffs
  *   -o txt|csv|json   output format (csv/json write to --out dir)
  *   -p <path>         subtree to analyze (default /)
  *   -fun <regex>      filter by user name (summary/path commands)
  *   -s fs|fc|dc|bc    summary sort: size, file/dir/block count
  *   --fsl <iec>       small-file limit, e.g. 2MiB (smallfiles/compaction)
  *   --target <iec>    compaction archive target size, default 8MiB
  *   -d <depth>        du depth cap (default 2)
  *   -l <n>            top-N limit (default 20)
  *   -a <age>          age filter like 60d / 12h / 1y (userusage)
  *   -u <user>         user (userusage)
  *   --out <dir>       output dir for csv/json
  *   --distributed     use the ranged-parallel fsimage loader
  * }}}
  */
object Tool {

  private val AgePattern = """(\d+)([yYdDhH])""".r

  /** "60d" → ms, mirroring UserUsageReportCommand.AgeConverter. */
  def parseAge(s: String): Long = s match {
    case AgePattern(n, u) =>
      val factor = u.toLowerCase match {
        case "y" => 365L * 24 * 60 * 60 * 1000
        case "d" => 24L * 60 * 60 * 1000
        case "h" => 60L * 60 * 1000
      }
      n.toLong * factor
    case _ => throw new IllegalArgumentException(s"bad age: $s (want e.g. 60d, 12h, 1y)")
  }

  /** Command dispatch (separated from main so specs can drive every
    * command end-to-end against a generated image without stopping the
    * shared session). */
  def run(spark: org.apache.spark.sql.SparkSession, cmd: String, image: String,
          opts: Map[String, String], flags: Set[String]): DataFrame = {
    // summary-only commands — never parse the inode sections
    cmd match {
      case "sections"  => return FsImageSource.sections(spark, image)
      case "snapshots" => return FsImageSource.snapshots(spark, image)
      case "refs"      => return FsImageSource.inodeReferences(spark, image)
      case "diffs"     => return FsImageSource.snapshotDiffs(spark, image)
      case _           => ()
    }
    val all =
      if (flags.contains("--distributed")) FsImageSource.inodesDistributed(spark, image)
      else FsImageSource.inodes(spark, image)
    import org.apache.spark.sql.functions.col
    val dirs = opts.getOrElse("-p", "/").split(",").toSeq
    val inodes =
      if (dirs == Seq("/")) all
      else all.filter(dirs.map(d => col("path").startsWith(d) || col("path") === d)
        .reduce(_ || _))
    val topN = opts.get("-l").map(_.toInt).getOrElse(20)

    cmd match {
      case "summary" =>
        Reports.summaryByUser(inodes, sortBy = opts.getOrElse("-s", "fs"),
          ownerRegex = opts.get("-fun"))
      case "smallfiles" =>
        val limit = opts.get("--fsl").map(IECBinaryImpl.parse).getOrElse(2L << 20)
        Reports.smallFilesHotspots(inodes, limit, topN)
      case "userusage" =>
        val user = opts.getOrElse("-u",
          throw new IllegalArgumentException("userusage needs -u <user>"))
        val cutoff = opts.get("-a")
          .map(a => (System.currentTimeMillis() - parseAge(a)) / 1000)
          .getOrElse(Long.MaxValue)
        Reports.userUsage(inodes, user, cutoff, topN)
      case "path" =>
        Reports.pathReport(inodes, opts.getOrElse("-fun", ".*"), maxRows = 10000)
      case "inode" =>
        val key = opts.getOrElse("-i", "/")
        key.toLongOption match {
          case Some(id) => Reports.inodeLookupById(inodes, Seq(id))
          case None     => Reports.inodeLookup(inodes, Seq(key))
        }
      case "acl" =>
        Reports.aclStatus(inodes, opts.getOrElse("-i", "/").split(",").toSeq)
      case "xattr" =>
        Reports.xattrStatus(inodes, opts.getOrElse("-i", "/").split(",").toSeq)
      case "quotas" =>
        Reports.quotaReport(inodes)
      case "growth" =>
        Reports.growthProfile(inodes)
      case "dupnames" =>
        Reports.dupNames(inodes, topN)
      case "du" =>
        Reports.duReport(inodes,
          maxDepth = opts.get("-d").map(_.toInt).getOrElse(2), topN = topN)
      case "compaction" =>
        val limit = opts.get("--fsl").map(IECBinaryImpl.parse).getOrElse(2L << 20)
        val target = opts.get("--target").map(IECBinaryImpl.parse).getOrElse(8L << 20)
        Reports.compactionPlan(inodes, limit, target, topN)
      case "ext" =>
        Reports.extensionReport(inodes, topN)
      case other =>
        throw new IllegalArgumentException(s"unknown command: $other " +
          "(expected one of: summary smallfiles userusage path inode acl " +
          "xattr quotas growth dupnames du compaction ext sections " +
          "snapshots refs diffs)")
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Tool <command> <fsimage> [options]")
    val cmd = args(0)
    val image = args(1)
    val opts = args.drop(2).sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val flags = args.drop(2).toSet

    val spark = graft.core.GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val df = run(spark, cmd, image, opts, flags)
      val topN = opts.get("-l").map(_.toInt).getOrElse(20)

      opts.getOrElse("-o", "txt") match {
        case "txt" => println(ReportSink.text(df, maxRows = math.max(topN, 50)))
        case "csv" => ReportSink.csv(df, opts.getOrElse("--out", "/tmp/graft_tool_out"))
        case "json" => ReportSink.json(df, opts.getOrElse("--out", "/tmp/graft_tool_out"))
        case f => throw new IllegalArgumentException(s"unknown format: $f")
      }
    } finally spark.stop()
  }
}
