package graft.sources.fsimage

import java.io.{ByteArrayOutputStream, DataOutputStream, FileOutputStream}

/** Test-scope fsimage writer (same wire format the parser reads): magic,
  * INODE / INODE_DIR / STRING_TABLE sections, tail FileSummary + 4-byte
  * length. Used for scale stress tests beyond the reference's images. */
object TestImageGen {

  private class W {
    val out = new ByteArrayOutputStream()
    def varint(v0: Long): W = {
      var v = v0
      while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt); this
    }
    def tag(field: Int, wt: Int): W = varint((field << 3) | wt)
    def fixed64(v: Long): W = {
      (0 until 8).foreach(i => out.write(((v >>> (8 * i)) & 0xFF).toInt)); this
    }
    def bytes(field: Int, b: Array[Byte]): W = { tag(field, 2); varint(b.length); out.write(b); this }
    def str(field: Int, s: String): W = bytes(field, s.getBytes("UTF-8"))
    def msg(field: Int)(f: W => Unit): W = { val i = new W; f(i); bytes(field, i.out.toByteArray) }
    def delimited(f: W => Unit): W = {
      val i = new W; f(i)
      varint(i.out.toByteArray.length); out.write(i.out.toByteArray); this
    }
  }

  /** Writes an image with `nDirs` dirs (fanout tree under root) and
    * `nFiles` files spread round-robin; returns (path, Σ file size). */
  def write(path: String, nDirs: Int, nFiles: Int): Long = {
    val rootId = 16385L
    val dirIds = (0 until nDirs).map(i => rootId + 1 + i)
    val fileIds = (0 until nFiles).map(i => rootId + 1 + nDirs + i)

    def perm(user: Long, group: Long, mode: Int): Long =
      (user << 40) | (group << 16) | mode

    val inodes = new W
    inodes.delimited { h => h.tag(1, 0).varint(rootId + nDirs + nFiles); h.tag(2, 0).varint(1 + nDirs + nFiles) }
    inodes.delimited { m =>
      m.tag(1, 0).varint(2); m.tag(2, 0).varint(rootId); m.str(3, "")
      m.msg(5)(d => { d.tag(1, 0).varint(1700000000000L); d.tag(4, 1).fixed64(perm(1, 1, 0x1ED)) })
    }
    var sumSize = 0L
    dirIds.zipWithIndex.foreach { case (id, i) =>
      inodes.delimited { m =>
        m.tag(1, 0).varint(2); m.tag(2, 0).varint(id); m.str(3, s"dir_$i")
        m.msg(5)(d => { d.tag(1, 0).varint(1700000000000L + i); d.tag(4, 1).fixed64(perm(1 + i % 20, 1 + i % 10, 0x1ED)) })
      }
    }
    fileIds.zipWithIndex.foreach { case (id, i) =>
      val size = 1024L * (1 + i % 3000)
      sumSize += size
      inodes.delimited { m =>
        m.tag(1, 0).varint(1); m.tag(2, 0).varint(id); m.str(3, s"f_$i.dat")
        m.msg(4) { f =>
          f.tag(1, 0).varint(1 + i % 3)
          f.tag(2, 0).varint(1700000000000L + i)
          f.tag(5, 1).fixed64(perm(1 + i % 20, 1 + i % 10, 0x1A4))
          f.msg(6)(b => { b.tag(1, 0).varint(id); b.tag(2, 0).varint(1); b.tag(3, 0).varint(size) })
        }
      }
    }

    val dirSection = new W
    // root's children: all dirs
    dirSection.delimited { m =>
      m.tag(1, 0).varint(rootId)
      m.msg(2)(p => dirIds.foreach(p.varint))
    }
    // files round-robin under dirs
    val byDir = fileIds.zipWithIndex.groupBy(_._2 % nDirs)
    byDir.toSeq.sortBy(_._1).foreach { case (d, fs) =>
      dirSection.delimited { m =>
        m.tag(1, 0).varint(dirIds(d))
        m.msg(2)(p => fs.foreach(f => p.varint(f._1)))
      }
    }

    val strings = new W
    strings.delimited { h => h.tag(1, 0).varint(30); h.tag(2, 0).varint(3) }
    (1 to 20).foreach(i => strings.delimited { e => e.tag(1, 0).varint((1L << 29) | i); e.str(2, s"user$i") })
    (1 to 10).foreach(i => strings.delimited { e => e.tag(1, 0).varint((2L << 29) | i); e.str(2, s"grp$i") })

    val fos = new FileOutputStream(path)
    val dos = new DataOutputStream(fos)
    dos.write("HDFSIMG1".getBytes("ASCII"))
    var offset = 8L
    val sections = Seq("INODE" -> inodes, "INODE_DIR" -> dirSection, "STRING_TABLE" -> strings)
    val located = sections.map { case (name, w) =>
      val b = w.out.toByteArray
      dos.write(b)
      val s = (name, b.length.toLong, offset)
      offset += b.length
      s
    }
    val summary = new W
    summary.delimited { fsm =>
      fsm.tag(1, 0).varint(1)
      fsm.tag(2, 0).varint(0xFFFFFFBFL) // layout -65 as uint
      located.foreach { case (name, len, off) =>
        fsm.msg(4)(sec => { sec.str(1, name); sec.tag(2, 0).varint(len); sec.tag(3, 0).varint(off) })
      }
    }
    val sb = summary.out.toByteArray
    dos.write(sb)
    dos.writeInt(sb.length)
    dos.close()
    sumSize
  }
}
