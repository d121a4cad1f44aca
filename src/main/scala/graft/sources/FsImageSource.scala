package graft.sources

import java.io.RandomAccessFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.fsimage.FsImageFormat
import graft.sources.fsimage.FsImageFormat._

/** HDFS fsimage → DataFrame source (SURVEY §2.1). Produces the same inode
  * schema as [[graft.core.Namespace]], so every report in
  * [[graft.operators.Reports]] runs unchanged on real namenode metadata.
  *
  * Round-1 scope: sections are parsed on the driver (the reference's
  * FsImageLoader is also fully in-memory — lib/.../core/FsImageLoader
  * .java:286), then parallelized. Scale path (round 2+): the INODE section
  * is a delimited stream — a cheap varint pre-scan yields message offsets
  * for ranged `binaryRecords`-style distributed parsing, and path assembly
  * becomes an iterative parent join. Uncompressed and zlib (DefaultCodec)
  * images supported.
  */
object FsImageSource {

  final case class FsInode(path: String, name: String, ftype: String,
                           owner: String, grp: String, perm: String,
                           size: Long, csize: Long, repl: Int, blocks: Long,
                           mtime_sec: Long, depth: Int, id: Long)

  /** Hadoop's fixed root inode id (INodeId.ROOT_INODE_ID). */
  val RootInodeId = 16385L

  def inodes(spark: SparkSession, imagePath: String): DataFrame = {
    val rows = loadRows(imagePath)
    import spark.implicits._
    spark.createDataset(rows).toDF()
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

      raw.map { i =>
        val path = pathOf(i.id)
        val ftype = i.inodeType match {
          case 1 => "F"
          case 2 => "D"
          case 3 => "S"
          case _ => "?"
        }
        FsInode(
          path = path,
          name = i.name,
          ftype = ftype,
          owner = strings.user(FsImageFormat.permUserSerial(i.permission)),
          grp = strings.group(FsImageFormat.permGroupSerial(i.permission)),
          perm = "%04o".format(FsImageFormat.permMode(i.permission)),
          size = i.sizeBytes,
          csize = i.sizeBytes * math.max(i.replication, 1),
          repl = i.replication,
          blocks = i.numBlocks.toLong,
          mtime_sec = i.mtime / 1000,
          depth = if (path == "/") 0 else path.count(_ == '/'),
          id = i.id)
      }
    } finally raf.close()
  }
}
