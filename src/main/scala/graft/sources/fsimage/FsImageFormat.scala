package graft.sources.fsimage

import java.io.RandomAccessFile
import java.nio.ByteBuffer

/** Minimal protobuf wire-format reader for HDFS fsimage files — built from
  * the public fsimage.proto / hdfs.proto layout (Apache Hadoop) and
  * validated against the reference's documented test images
  * (reference lib/.../core/FsImageLoaderTest.java:27-62 lists the exact
  * expected namespace). No Hadoop classes, no generated protobuf code.
  *
  * File layout: "HDFSIMG1" magic; sections back-to-back; FileSummary
  * (varint-delimited protobuf) at the tail, followed by its 4-byte
  * big-endian length as the file's last bytes.
  */
object FsImageFormat {

  final case class Section(name: String, length: Long, offset: Long)
  final case class FileSummary(ondiskVersion: Int, layoutVersion: Int,
                               codec: Option[String], sections: Seq[Section])

  /** Raw inode record (union of the three inode types' fields). */
  final case class RawInode(
      id: Long, inodeType: Int, name: String,
      // files
      replication: Int, mtime: Long, atime: Long, preferredBlockSize: Long,
      permission: Long, numBlocks: Int, sizeBytes: Long,
      storagePolicy: Int, ecPolicy: Int,
      // symlink
      symlinkTarget: String)

  final case class DirEntry(parent: Long, children: Array[Long])

  final case class StringTables(users: Map[Long, String], groups: Map[Long, String],
                                flat: Map[Long, String], typed: Boolean) {
    def user(serial: Long): String =
      if (typed) users.getOrElse(serial, s"user#$serial")
      else flat.getOrElse(serial, s"user#$serial")
    def group(serial: Long): String =
      if (typed) groups.getOrElse(serial, s"group#$serial")
      else flat.getOrElse(serial, s"group#$serial")
  }

  // --------------------------------------------------------------- wire fmt

  private final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end

    def varint(): Long = {
      var r = 0L; var s = 0
      var b = 0
      do {
        b = buf(pos) & 0xFF; pos += 1
        r |= (b & 0x7FL) << s; s += 7
      } while ((b & 0x80) != 0)
      r
    }

    def fixed64(): Long = {
      val v = ByteBuffer.wrap(buf, pos, 8).order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
      pos += 8; v
    }

    def fixed32(): Long = {
      val v = ByteBuffer.wrap(buf, pos, 4).order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
      pos += 4; v.toLong & 0xFFFFFFFFL
    }

    def bytes(len: Int): Array[Byte] = {
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + len)
      pos += len; out
    }

    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 => val n = varint().toInt; pos += n
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(s"wire type $w")
    }

    /** Iterate fields of the message in [pos, end); cb(fieldNo, wireType). */
    def eachField(cb: (Int, Int, Reader) => Unit): Unit =
      while (hasMore) {
        val tag = varint()
        cb((tag >> 3).toInt, (tag & 7).toInt, this)
      }

    def subMessage(): Reader = {
      val len = varint().toInt
      val r = new Reader(buf, pos, pos + len)
      pos += len
      r
    }
  }

  private def delimited(buf: Array[Byte], off: Int, len: Int): Iterator[Reader] =
    new Iterator[Reader] {
      private val outer = new Reader(buf, off, off + len)
      def hasNext: Boolean = outer.hasMore
      def next(): Reader = outer.subMessage()
    }

  // ----------------------------------------------------------------- parse

  /** Reads the FileSummary from the image tail. */
  def readSummary(raf: RandomAccessFile): FileSummary = {
    val fileLen = raf.length()
    raf.seek(fileLen - 4)
    val summaryLen = raf.readInt()
    val blob = new Array[Byte](summaryLen)
    raf.seek(fileLen - 4 - summaryLen)
    raf.readFully(blob)
    val outer = new Reader(blob, 0, blob.length)
    val msg = outer.subMessage() // writeDelimitedTo → varint length prefix
    var ondisk = 0; var layout = 0
    var codec: Option[String] = None
    val sections = Seq.newBuilder[Section]
    msg.eachField { (fn, wt, r) =>
      (fn, wt) match {
        case (1, 0) => ondisk = r.varint().toInt
        case (2, 0) => layout = r.varint().toInt
        case (3, 2) => codec = Some(new String(r.bytes(r.varint().toInt), "UTF-8"))
        case (4, 2) =>
          val s = r.subMessage()
          var name = ""; var len = 0L; var off = 0L
          s.eachField { (f, w, rr) =>
            (f, w) match {
              case (1, 2) => name = new String(rr.bytes(rr.varint().toInt), "UTF-8")
              case (2, 0) => len = rr.varint()
              case (3, 0) => off = rr.varint()
              case _      => rr.skip(w)
            }
          }
          sections += Section(name, len, off)
        case _ => r.skip(wt)
      }
    }
    FileSummary(ondisk, layout, codec, sections.result())
  }

  def readSection(raf: RandomAccessFile, s: Section): Array[Byte] = {
    val out = new Array[Byte](s.length.toInt)
    raf.seek(s.offset)
    raf.readFully(out)
    out
  }

  /** Supported compression codecs (FileSummary.codec). DefaultCodec is a
    * zlib stream (possibly several concatenated — Hadoop compressor
    * resets); inflate them all. */
  val ZlibCodec = "org.apache.hadoop.io.compress.DefaultCodec"

  def maybeDecompress(bytes: Array[Byte], codec: Option[String]): Array[Byte] =
    codec match {
      case None | Some("") => bytes
      case Some(ZlibCodec) =>
        val out = new java.io.ByteArrayOutputStream(math.max(bytes.length * 4, 1 << 16))
        val buf = new Array[Byte](1 << 16)
        var offset = 0
        while (offset < bytes.length) {
          val inf = new java.util.zip.Inflater()
          inf.setInput(bytes, offset, bytes.length - offset)
          var n = inf.inflate(buf)
          while (n > 0 || (!inf.finished() && !inf.needsInput())) {
            out.write(buf, 0, n)
            n = inf.inflate(buf)
          }
          val consumed = (bytes.length - offset) - inf.getRemaining
          inf.end()
          if (consumed <= 0) // trailing garbage / padding — stop
            offset = bytes.length
          else offset += consumed
        }
        out.toByteArray
      case Some(other) =>
        throw new UnsupportedOperationException(s"fsimage codec not supported: $other")
    }

  /** STRING_TABLE: header {numEntry=1, maskBits=2} then delimited entries
    * {id=1, str=2}. Hadoop 3 encodes the entry kind in the id's top bits
    * (id >>> 29: 1=user, 2=group); Hadoop 2 uses one flat table. */
  def parseStringTable(bytes: Array[Byte]): StringTables = {
    val it = delimited(bytes, 0, bytes.length)
    var maskBits = 0
    if (it.hasNext) it.next().eachField { (fn, wt, r) =>
      (fn, wt) match {
        case (2, 0) => maskBits = r.varint().toInt
        case _      => r.skip(wt)
      }
    }
    val users = Map.newBuilder[Long, String]
    val groups = Map.newBuilder[Long, String]
    val flat = Map.newBuilder[Long, String]
    it.foreach { m =>
      var id = 0L; var str = ""
      m.eachField { (fn, wt, r) =>
        (fn, wt) match {
          case (1, 0) => id = r.varint()
          case (2, 2) => str = new String(r.bytes(r.varint().toInt), "UTF-8")
          case _      => r.skip(wt)
        }
      }
      if (maskBits > 0) {
        val serial = id & ((1L << 29) - 1)
        (id >>> 29) match {
          case 1 => users += serial -> str
          case 2 => groups += serial -> str
          case _ => () // xattr namespace entries — not needed
        }
      } else flat += id -> str
    }
    StringTables(users.result(), groups.result(), flat.result(), typed = maskBits > 0)
  }

  /** Scans delimited-message boundaries without parsing bodies — the cheap
    * pre-pass that lets executors parse disjoint [start,end) ranges of the
    * INODE/INODE_DIR sections in parallel ([[graft.sources.FsImageSource]]
    * scale path). Returns message start offsets, header included. */
  def messageOffsets(bytes: Array[Byte]): Array[Int] = {
    val out = Array.newBuilder[Int]
    val r = new Reader(bytes, 0, bytes.length)
    while (r.hasMore) {
      out += r.pos
      val len = r.varint().toInt
      r.pos += len
    }
    out.result()
  }

  /** Parses every whole delimited INode message in [from, to). */
  def parseInodeRange(bytes: Array[Byte], from: Int, to: Int): Iterator[RawInode] =
    delimited(bytes, from, to - from).map(parseOneInode)

  /** INODE section: header {lastInodeId=1, numInodes=2} then delimited
    * INode {type=1, id=2, name=3, file=4, directory=5, symlink=6}. */
  def parseInodes(bytes: Array[Byte]): Iterator[RawInode] = {
    val it = delimited(bytes, 0, bytes.length)
    if (it.hasNext) it.next() // header — counts not needed, we stream
    it.map(parseOneInode)
  }

  private def parseOneInode(m: Reader): RawInode = {
      var typ = 0; var id = 0L; var name = ""
      var repl = 0; var mtime = 0L; var atime = 0L; var pbs = 0L
      var perm = 0L; var nBlocks = 0; var size = 0L
      var sp = 0; var ec = 0; var target = ""
      m.eachField { (fn, wt, r) =>
        (fn, wt) match {
          case (1, 0) => typ = r.varint().toInt
          case (2, 0) => id = r.varint()
          case (3, 2) => name = new String(r.bytes(r.varint().toInt), "UTF-8")
          case (4, 2) => // INodeFile
            val f = r.subMessage()
            f.eachField { (ff, fw, rr) =>
              (ff, fw) match {
                case (1, 0)  => repl = rr.varint().toInt
                case (2, 0)  => mtime = rr.varint()
                case (3, 0)  => atime = rr.varint()
                case (4, 0)  => pbs = rr.varint()
                case (5, 1)  => perm = rr.fixed64()
                case (6, 2)  => // BlockProto {blockId=1, genStamp=2, numBytes=3}
                  val b = rr.subMessage()
                  nBlocks += 1
                  b.eachField { (bf, bw, br) =>
                    (bf, bw) match {
                      case (3, 0) => size += br.varint()
                      case _      => br.skip(bw)
                    }
                  }
                case (10, 0) => sp = rr.varint().toInt
                case (12, 0) => ec = rr.varint().toInt
                case _       => rr.skip(fw)
              }
            }
          case (5, 2) => // INodeDirectory {modificationTime=1, ..., permission=4}
            val d = r.subMessage()
            d.eachField { (df, dw, rr) =>
              (df, dw) match {
                case (1, 0) => mtime = rr.varint()
                case (4, 1) => perm = rr.fixed64()
                case _      => rr.skip(dw)
              }
            }
          case (6, 2) => // INodeSymlink {permission=1, target=2, mtime=3, atime=4}
            val s = r.subMessage()
            s.eachField { (sf, sw, rr) =>
              (sf, sw) match {
                case (1, 1) => perm = rr.fixed64()
                case (2, 2) => target = new String(rr.bytes(rr.varint().toInt), "UTF-8")
                case (3, 0) => mtime = rr.varint()
                case (4, 0) => atime = rr.varint()
                case _      => rr.skip(sw)
              }
            }
          case _ => r.skip(wt)
        }
      }
      RawInode(id, typ, name, repl, mtime, atime, pbs, perm, nBlocks, size, sp, ec, target)
  }

  /** Parses every whole delimited DirEntry message in [from, to). */
  def parseDirRange(bytes: Array[Byte], from: Int, to: Int): Iterator[DirEntry] =
    delimited(bytes, from, to - from).map(parseOneDirEntry)

  /** INODE_DIR section: delimited DirEntry {parent=1, children=2 packed}. */
  def parseDirEntries(bytes: Array[Byte]): Iterator[DirEntry] =
    delimited(bytes, 0, bytes.length).map(parseOneDirEntry)

  private def parseOneDirEntry(m: Reader): DirEntry = {
      var parent = 0L
      val children = Array.newBuilder[Long]
      m.eachField { (fn, wt, r) =>
        (fn, wt) match {
          case (1, 0) => parent = r.varint()
          case (2, 2) => // packed varints
            val p = r.subMessage()
            while (p.hasMore) children += p.varint()
          case (2, 0) => children += r.varint()
          case _      => r.skip(wt)
        }
      }
      DirEntry(parent, children.result())
    }

  /** Permission fixed64 layout (Hadoop PermissionStatusFormat):
    * user serial «40 | group serial «16 | mode (16 bits). */
  def permMode(perm: Long): Int = (perm & 0xFFFF).toInt
  def permGroupSerial(perm: Long): Long = (perm >>> 16) & 0xFFFFFF
  def permUserSerial(perm: Long): Long = perm >>> 40
}
