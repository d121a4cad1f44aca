package graft.sources

import java.io.RandomAccessFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.sources.fsimage.FsImageFormat
import graft.sources.fsimage.FsImageFormat._

/** HDFS fsimage → DataFrame source (SURVEY §2.1). Produces the same inode
  * schema as [[graft.core.Namespace]] (plus fsimage-only columns: id,
  * atime_sec, storage_policy, ec_policy, symlink_target, n_acl, acl), so
  * every report in [[graft.operators.Reports]] runs unchanged on real
  * namenode metadata.
  *
  * Two loaders:
  *  - [[inodes]]: driver-side parse (the reference's posture — its
  *    FsImageLoader is fully in-memory, lib/.../core/FsImageLoader.java:286).
  *    Right for ad-hoc images up to a few million inodes.
  *  - [[inodesDistributed]]: the scale path. The driver never materializes
  *    a section: it streams the INODE/INODE_DIR sections once to find
  *    message-aligned chunk boundaries (O(buffer) memory,
  *    [[FsImageFormat.scanRanges]]), then ships only (start,end) offset
  *    pairs; each executor reads its own byte range of the image via the
  *    Hadoop FileSystem API ([[FsImageFormat.readRange]] — works for both
  *    file:// and DFS paths). Only the directory tree (~1% of inodes) and
  *    the string table are collected/broadcast. Zlib images are not
  *    splittable, so their sections are inflated once, streaming, to a
  *    side file that the ranged reads then target — on a cluster, point
  *    the side file at shared storage (or store scale images uncompressed,
  *    which is also the Hadoop default for large fsimages).
  */
object FsImageSource {

  final case class FsInode(path: String, name: String, ftype: String,
                           owner: String, grp: String, perm: String,
                           size: Long, csize: Long, repl: Int, blocks: Long,
                           mtime_sec: Long, depth: Int, id: Long,
                           atime_sec: Long, storage_policy: Int,
                           ec_policy: String, symlink_target: String,
                           n_acl: Int, acl: Seq[String])

  /** Hadoop's fixed root inode id (INodeId.ROOT_INODE_ID). */
  val RootInodeId = 16385L

  def inodes(spark: SparkSession, imagePath: String): DataFrame = {
    val rows = loadRows(imagePath)
    import spark.implicits._
    spark.createDataset(rows).toDF()
  }

  private def toInode(i: RawInode, path: String, strings: StringTables): FsInode =
    FsInode(path, i.name,
      i.inodeType match { case 1 => "F"; case 2 => "D"; case 3 => "S"; case _ => "?" },
      strings.user(FsImageFormat.permUserSerial(i.permission)),
      strings.group(FsImageFormat.permGroupSerial(i.permission)),
      "%04o".format(FsImageFormat.permMode(i.permission)),
      i.sizeBytes, i.consumedBytes, i.replication,
      i.numBlocks.toLong, i.mtime / 1000,
      if (path == "/") 0 else path.count(_ == '/'), i.id,
      i.atime / 1000, i.storagePolicy, FsImageFormat.ecPolicyName(i.ecPolicy),
      i.symlinkTarget,
      i.aclRaw.length, i.aclRaw.toSeq.map(v => FsImageFormat.aclEntryString(v, strings)))

  /** Builds dir id → absolute path from the collected dir inodes plus the
    * dir→parent edges (memoized upward walk, O(#dirs)). */
  private def dirPaths(dirRows: Array[RawInode],
                       parentOf: java.util.HashMap[Long, Long]): Map[Long, String] = {
    val byId = dirRows.map(d => d.id -> d).toMap
    val memo = new java.util.HashMap[Long, String]()
    def pathOf(id: Long): String =
      if (id == RootInodeId || !byId.contains(id)) "/"
      else Option(memo.get(id)).getOrElse {
        val parent = if (parentOf.containsKey(id)) parentOf.get(id).longValue() else RootInodeId
        val pp = pathOf(parent)
        val p = (if (pp == "/") "" else pp) + "/" + byId(id).name
        memo.put(id, p)
        p
      }
    dirRows.map(d => d.id -> pathOf(d.id)).toMap
  }

  /** Scale-path loader — see the object scaladoc for the design. Driver
    * memory is O(#dirs + string table + scan buffer), never O(section). */
  def inodesDistributed(spark: SparkSession, imagePath: String,
                        parallelism: Int = 0,
                        targetChunkBytes: Long = 32L << 20): DataFrame = {
    import spark.implicits._
    val sc = spark.sparkContext

    val summary = FsImageFormat.readSummary(imagePath)
    val secs = summary.sections.map(s => s.name -> s).toMap

    // String table: tiny (distinct users/groups/ACL names) — in-memory.
    val strings = {
      val raf = new RandomAccessFile(imagePath, "r")
      try {
        val st = secs.get("STRING_TABLE")
          .map(s => FsImageFormat.maybeDecompress(FsImageFormat.readSection(raf, s), summary.codec))
          .getOrElse(Array.emptyByteArray)
        FsImageFormat.parseStringTable(st)
      } finally raf.close()
    }

    // Ranged-readable view of the INODE / INODE_DIR sections: the image
    // itself when uncompressed; a streamed-inflated side file per section
    // otherwise (zlib is not splittable — the one-time inflation is
    // sequential O(buffer)-memory I/O, and everything downstream stays
    // ranged + parallel). On a cluster the side file must land on storage
    // the executors share; large production fsimages are typically stored
    // uncompressed anyway.
    def sectionView(name: String): (String, Section) = summary.codec match {
      case None | Some("") =>
        (imagePath, secs.getOrElse(name, Section(name, 0, 0)))
      case codec =>
        secs.get(name) match {
          case None => (imagePath, Section(name, 0, 0))
          case Some(s) =>
            val src = new java.io.File(imagePath)
            val side = new java.io.File(src.getParentFile, s".${src.getName}.graft-$name")
            if (!side.isFile || side.lastModified() < src.lastModified()) {
              // inflate to a temp file, then atomic-rename into place: a
              // crashed or concurrent inflation must never leave a partial
              // side file that mtime-checks as valid on the next run
              val tmp = java.io.File.createTempFile(side.getName, ".tmp", src.getParentFile)
              val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(tmp))
              val buf = new Array[Byte](1 << 16)
              val in = FsImageFormat.sectionRawStream(imagePath, s, codec)
              try {
                var n = in.read(buf)
                while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
              } finally { in.close(); out.close() }
              java.nio.file.Files.move(tmp.toPath, side.toPath,
                java.nio.file.StandardCopyOption.REPLACE_EXISTING,
                java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            }
            (side.getPath, Section(name, side.length(), 0L))
        }
    }
    val (inodePath, inodeSec) = sectionView("INODE")
    val (dirPath, dirSec) = sectionView("INODE_DIR")

    // Driver pre-pass: stream each section once for message-aligned chunk
    // ranges (absolute offsets into the view file).
    def ranges(path: String, sec: Section, dropHeader: Boolean): Array[(Long, Long)] = {
      if (sec.length == 0) return Array.empty
      val chunk =
        if (parallelism > 0) math.max(1L << 16, sec.length / parallelism)
        else targetChunkBytes
      val in = FsImageFormat.sectionRawStream(path, sec, None)
      try FsImageFormat.scanRanges(in, dropHeader, chunk).map {
        case (from, to) => (sec.offset + from, sec.offset + to)
      } finally in.close()
    }
    val inodeRanges = ranges(inodePath, inodeSec, dropHeader = true)
    val dirRanges = ranges(dirPath, dirSec, dropHeader = false)

    val ip = inodePath; val dp = dirPath // plain strings for the closures
    // ship the driver's Hadoop conf so executor-side FileSystem resolution
    // keeps credentials / fs impls (a default Configuration would not)
    val hconf = sc.broadcast {
      val it = sc.hadoopConfiguration.iterator()
      val b = Seq.newBuilder[(String, String)]
      while (it.hasNext) { val e = it.next(); b += ((e.getKey, e.getValue)) }
      b.result()
    }
    def parsedInodes = sc.parallelize(inodeRanges.toSeq, math.max(1, inodeRanges.length))
      .flatMap { case (from, to) =>
        FsImageFormat.parseInodeRange(FsImageFormat.readRange(ip, from, (to - from).toInt, hconf.value), 0, (to - from).toInt)
      }
    def dirEntries = sc.parallelize(dirRanges.toSeq, math.max(1, dirRanges.length))
      .flatMap { case (from, to) =>
        FsImageFormat.parseDirRange(FsImageFormat.readRange(dp, from, (to - from).toInt, hconf.value), 0, (to - from).toInt)
      }

    // Directory tree: dirs are ~1% of inodes → collect + broadcast.
    val dirRows = parsedInodes.filter(_.inodeType == 2).collect()
    val dirIds = dirRows.map(_.id).toSet
    val bcDirIds = sc.broadcast(dirIds)
    val dirParentOf = {
      val m = new java.util.HashMap[Long, Long]()
      dirEntries
        .flatMap(e => e.children.filter(bcDirIds.value.contains).map(c => (c, e.parent)))
        .collect()
        .foreach { case (c, p) => m.put(c, p) }
      m
    }
    val bcDirPaths = sc.broadcast(dirPaths(dirRows, dirParentOf))
    val bcStrings = sc.broadcast(strings)

    // Files + symlinks: distributed join on the parent edge, then path =
    // broadcast dir path + name (root-attached when no edge exists).
    val edges = dirEntries
      .flatMap(d => d.children.map(c => (c, d.parent)))
      .toDF("child_id", "parent_id")
    val nonDirs = parsedInodes.filter(_.inodeType != 2)
      .map(i => (i.id, i))
      .toDF("id", "inode")
      .join(edges, col("id") === col("child_id"), "left_outer")
      .select(col("inode").as("_1"), col("parent_id").as("_2"))
      .as[(RawInode, Option[Long])]
      .map { case (i, parent) =>
        val pp = bcDirPaths.value.getOrElse(parent.getOrElse(RootInodeId), "/")
        toInode(i, (if (pp == "/") "" else pp) + "/" + i.name, bcStrings.value)
      }

    val dirPathMap = bcDirPaths.value
    val dirDs = spark.createDataset(dirRows.toSeq.map(d => toInode(d, dirPathMap(d.id), strings)))
    nonDirs.unionByName(dirDs).toDF()
  }

  /** Parses the image into namespace rows (driver-side). */
  def loadRows(imagePath: String): Seq[FsInode] = {
    val raf = new RandomAccessFile(imagePath, "r")
    try {
      val summary = FsImageFormat.readSummary(raf)
      val secs = summary.sections.map(s => s.name -> s).toMap
      def sec(name: String): Array[Byte] =
        secs.get(name)
          .map(s => FsImageFormat.maybeDecompress(FsImageFormat.readSection(raf, s), summary.codec))
          .getOrElse(Array.emptyByteArray)

      val strings = FsImageFormat.parseStringTable(sec("STRING_TABLE"))
      val raw = FsImageFormat.parseInodes(sec("INODE")).toVector
      val dirEntries = FsImageFormat.parseDirEntries(sec("INODE_DIR")).toVector

      val parentOf = new java.util.HashMap[Long, Long]()
      dirEntries.foreach(e => e.children.foreach(c => parentOf.put(c, e.parent)))
      val byId = raw.map(i => i.id -> i).toMap

      // Memoized upward path walk — O(n) total.
      val pathMemo = new java.util.HashMap[Long, String]()
      def pathOf(id: Long): String =
        if (id == RootInodeId || !byId.contains(id)) "/"
        else Option(pathMemo.get(id)).getOrElse {
          val inode = byId(id)
          val parent = if (parentOf.containsKey(id)) parentOf.get(id).longValue() else RootInodeId
          val pp = pathOf(parent)
          val p = (if (pp == "/") "" else pp) + "/" + inode.name
          pathMemo.put(id, p)
          p
        }

      raw.map(i => toInode(i, pathOf(i.id), strings))
    } finally raf.close()
  }
}
