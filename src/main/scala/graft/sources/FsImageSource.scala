package graft.sources

import java.io.RandomAccessFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import graft.sources.fsimage.FsImageFormat
import graft.sources.fsimage.FsImageFormat._

/** HDFS fsimage → DataFrame source (SURVEY §2.1). Produces the same inode
  * schema as [[graft.core.Namespace]] (plus fsimage-only columns: id,
  * atime_sec, storage_policy, ec_policy, symlink_target, n_acl, acl,
  * n_xattr, xattrs), so every report in [[graft.operators.Reports]] runs
  * unchanged on real namenode metadata.
  *
  * Two loaders:
  *  - [[inodes]]: driver-side parse (the reference's posture — its
  *    FsImageLoader is fully in-memory, lib/.../core/FsImageLoader.java:286).
  *    Right for ad-hoc images up to a few million inodes.
  *  - [[inodesDistributed]]: the scale path. The driver never materializes
  *    a section OR the directory tree: it streams the INODE/INODE_DIR
  *    sections once to find message-aligned chunk boundaries (O(buffer)
  *    memory, [[FsImageFormat.scanRanges]]), then ships only (start,end)
  *    offset pairs; each executor reads its own byte range of the image
  *    via the Hadoop FileSystem API ([[FsImageFormat.readRange]] — works
  *    for both file:// and DFS paths). Directory paths are resolved
  *    DISTRIBUTIVELY — O(tree depth) iterative parent equi-joins over the
  *    dir table with per-round lineage checkpoints (the
  *    [[graft.operators.Dedup.connectedComponents]] posture), then file
  *    paths attach by one parent-id join — so driver state is only the
  *    string table plus the range scan buffer, never O(#dirs): a
  *    10⁸-inode fleet image (~10⁶–10⁷ dirs × ~100 B paths) loads under a
  *    2 GiB driver cap where a dir collect + path-map broadcast would be
  *    a multi-GB driver materialization. Zlib images are not splittable,
  *    so their sections are inflated once, streaming, to a side file that
  *    the ranged reads then target — on a cluster, point the side file at
  *    shared storage (or store scale images uncompressed, which is also
  *    the Hadoop default for large fsimages).
  */
object FsImageSource {

  final case class FsInode(path: String, name: String, ftype: String,
                           owner: String, grp: String, perm: String,
                           size: Long, csize: Long, repl: Int, blocks: Long,
                           mtime_sec: Long, depth: Int, id: Long,
                           atime_sec: Long, storage_policy: Int,
                           ec_policy: String, symlink_target: String,
                           n_acl: Int, acl: Seq[String],
                           n_xattr: Int, xattrs: Seq[String],
                           ns_quota: Long, ds_quota: Long,
                           pref_block: Long,
                           under_construction: Boolean = false,
                           uc_client: String = "", uc_machine: String = "")

  /** Hadoop's fixed root inode id (INodeId.ROOT_INODE_ID). */
  val RootInodeId = 16385L

  def inodes(spark: SparkSession, imagePath: String): DataFrame = {
    val rows = loadRows(imagePath)
    import spark.implicits._
    spark.createDataset(rows).toDF()
  }

  final case class FsSection(name: String, length: Long, offset: Long,
                             codec: String, layout_version: Int)

  /** FileSummary section inventory — what an image actually contains
    * (INODE, INODE_DIR, STRING_TABLE, SNAPSHOT, SNAPSHOT_DIFF, XATTR-era
    * sections, …), with on-disk lengths. The admin's first look at an
    * unknown image: which features are present and what dominates its
    * size. Driver-side only — the summary is a few hundred bytes. */
  def sections(spark: SparkSession, imagePath: String): DataFrame = {
    val s = FsImageFormat.readSummary(imagePath,
      spark.sparkContext.hadoopConfiguration)
    import spark.implicits._
    spark.createDataset(s.sections.map(x =>
      FsSection(x.name, x.length, x.offset, s.codec.getOrElse(""),
        s.layoutVersion))).toDF()
  }

  final case class FsSnapshot(snapshot_id: Int, name: String, root_id: Long)

  /** SNAPSHOT section inventory: one row per snapshot (id, name, the
    * snapshotted directory's inode id — join on inodes.id for the path).
    * Empty when the image has no SNAPSHOT section. */
  def snapshots(spark: SparkSession, imagePath: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val summary = FsImageFormat.readSummary(imagePath, conf)
    import spark.implicits._
    val rows = summary.sections.find(_.name == "SNAPSHOT") match {
      case None => Seq.empty[FsSnapshot]
      case Some(sec) =>
        val bytes = FsImageFormat.maybeDecompress(
          FsImageFormat.readSection(imagePath, sec, conf), summary.codec)
        FsImageFormat.parseSnapshots(bytes).snapshots
          .map(s => FsSnapshot(s.snapshotId, s.name, s.rootId))
    }
    spark.createDataset(rows).toDF()
  }

  final case class FsSnapshotDiff(inode_id: Long, diff_type: String,
                                  snapshot_id: Int, file_size: Long,
                                  name: String, n_created: Int, n_deleted: Int)

  /** SNAPSHOT_DIFF section: one row per (inode, snapshot) diff — the
    * per-snapshot file length for files, created/deleted child counts for
    * directories. Join inode_id on inodes.id for the live path. Empty
    * when the image carries no snapshot diffs. */
  def snapshotDiffs(spark: SparkSession, imagePath: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val summary = FsImageFormat.readSummary(imagePath, conf)
    import spark.implicits._
    val rows = summary.sections.find(_.name == "SNAPSHOT_DIFF") match {
      case None => Seq.empty[FsSnapshotDiff]
      case Some(sec) =>
        val bytes = FsImageFormat.maybeDecompress(
          FsImageFormat.readSection(imagePath, sec, conf), summary.codec)
        FsImageFormat.parseSnapshotDiffs(bytes).map(d =>
          FsSnapshotDiff(d.inodeId, d.diffType, d.snapshotId, d.fileSize,
            d.name, d.nCreated, d.nDeleted))
    }
    spark.createDataset(rows).toDF()
  }

  final case class FsUcEntry(inode_id: Long, full_path: String)

  /** FILES_UNDERCONSTRUCTION section: one row per file with an open
    * lease at image time (inode id, namenode-resolved full path). Join
    * inode_id on inodes.id for owner / client-name / size detail — the
    * `hdfs dfsadmin -listOpenFiles` readout
    * ([[graft.operators.Reports.openFiles]]). Empty when the image has
    * no open files. The reference drops this section entirely
    * (FsImageLoader.java loads only string/inode/dir sections). */
  def filesUnderConstruction(spark: SparkSession, imagePath: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val summary = FsImageFormat.readSummary(imagePath, conf)
    import spark.implicits._
    val rows = summary.sections.find(_.name == "FILES_UNDERCONSTRUCTION") match {
      case None => Seq.empty[FsUcEntry]
      case Some(sec) =>
        val bytes = FsImageFormat.maybeDecompress(
          FsImageFormat.readSection(imagePath, sec, conf), summary.codec)
        FsImageFormat.parseFilesUnderConstruction(bytes)
          .map(u => FsUcEntry(u.inodeId, u.fullPath))
    }
    spark.createDataset(rows).toDF()
  }

  final case class FsCachePool(pool: String, owner: String, grp: String,
                               mode: String, limit: Long,
                               max_relative_expiry_ms: Long,
                               default_replication: Int)
  final case class FsCacheDirective(directive_id: Long, path: String,
                                    cache_replication: Int, pool: String,
                                    expiry_ms: Long, expiry_relative: Boolean)

  private def cacheSection(spark: SparkSession, imagePath: String)
      : Option[FsImageFormat.CacheManagerSection] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val summary = FsImageFormat.readSummary(imagePath, conf)
    summary.sections.find(_.name == "CACHE_MANAGER").map { sec =>
      FsImageFormat.parseCacheManager(FsImageFormat.maybeDecompress(
        FsImageFormat.readSection(imagePath, sec, conf), summary.codec))
    }
  }

  /** CACHE_MANAGER pools — the `hdfs cacheadmin -listPools` readout
    * (name, owner/group, mode octal, byte limit, max relative expiry,
    * default replication). Empty when the image carries no cache state.
    * Beyond reference parity (hfsa drops the section). */
  def cachePools(spark: SparkSession, imagePath: String): DataFrame = {
    import spark.implicits._
    spark.createDataset(cacheSection(spark, imagePath).toSeq.flatMap(_.pools)
      .map(p => FsCachePool(p.name, p.owner, p.group, "%04o".format(p.mode),
        p.limit, p.maxRelativeExpiryMs, p.defaultReplication))).toDF()
  }

  /** CACHE_MANAGER directives — the `hdfs cacheadmin -listDirectives`
    * readout (id, cached path, cache replication, pool, absolute or
    * relative expiry; expiry_ms 0 = never). Join path on inodes.path for
    * the cached bytes ([[graft.operators.Reports.cacheReport]]). */
  def cacheDirectives(spark: SparkSession, imagePath: String): DataFrame = {
    import spark.implicits._
    spark.createDataset(cacheSection(spark, imagePath).toSeq.flatMap(_.directives)
      .map(d => FsCacheDirective(d.id, d.path, d.replication, d.pool,
        d.expiryMs, d.expiryRelative))).toDF()
  }

  final case class FsDelegationKey(key_id: Int, key_expiry_ms: Long,
                                   key_len: Int)
  final case class FsDelegationToken(seq: Int, version: Int, owner: String,
                                     renewer: String, real_user: String,
                                     issue_ms: Long, max_ms: Long,
                                     master_key_id: Int, expiry_ms: Long)

  private def secretSection(spark: SparkSession, imagePath: String)
      : Option[FsImageFormat.SecretManagerSection] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val summary = FsImageFormat.readSummary(imagePath, conf)
    summary.sections.find(_.name == "SECRET_MANAGER").map { sec =>
      FsImageFormat.parseSecretManager(FsImageFormat.maybeDecompress(
        FsImageFormat.readSection(imagePath, sec, conf), summary.codec))
    }
  }

  /** SECRET_MANAGER delegation keys — master-key inventory (id, expiry,
    * key LENGTH only; material never leaves the parser). Empty when the
    * image carries no secret-manager state. Beyond reference parity
    * (hfsa drops the section). */
  def delegationKeys(spark: SparkSession, imagePath: String): DataFrame = {
    import spark.implicits._
    spark.createDataset(secretSection(spark, imagePath).toSeq.flatMap(_.keys)
      .map(key => FsDelegationKey(key.id, key.expiryMs, key.keyLen))).toDF()
  }

  /** SECRET_MANAGER persisted delegation tokens — one row per live token
    * (sequence number, owner/renewer/real-user, issue/max/expiry times,
    * signing master-key id). Join master_key_id on
    * [[delegationKeys]].key_id for the token-vs-key audit
    * ([[graft.operators.Reports.secretReport]]). */
  def delegationTokens(spark: SparkSession, imagePath: String): DataFrame = {
    import spark.implicits._
    spark.createDataset(secretSection(spark, imagePath).toSeq.flatMap(_.tokens)
      .map(t => FsDelegationToken(t.sequenceNumber, t.version, t.owner,
        t.renewer, t.realUser, t.issueMs, t.maxMs, t.masterKeyId,
        t.expiryMs))).toDF()
  }

  final case class FsInodeRef(referred_id: Long, name: String,
                              dst_snapshot_id: Int, last_snapshot_id: Int)

  /** INODE_REFERENCE section: one row per snapshot-rename indirection
    * node (referred inode id, recorded name, dst/last snapshot ids — -1
    * when absent). Join referred_id on inodes.id for the live inode; a
    * row with last_snapshot_id ≥ 0 means the old name survives only
    * inside that snapshot. Empty when the image has no renames across
    * snapshot boundaries. */
  def inodeReferences(spark: SparkSession, imagePath: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val summary = FsImageFormat.readSummary(imagePath, conf)
    import spark.implicits._
    val rows = summary.sections.find(_.name == "INODE_REFERENCE") match {
      case None => Seq.empty[FsInodeRef]
      case Some(sec) =>
        val bytes = FsImageFormat.maybeDecompress(
          FsImageFormat.readSection(imagePath, sec, conf), summary.codec)
        FsImageFormat.parseInodeReferences(bytes)
          .map(r => FsInodeRef(r.referredId, r.name, r.dstSnapshotId, r.lastSnapshotId))
    }
    spark.createDataset(rows).toDF()
  }

  /** Merged EC policy table: the built-in five plus whatever the image's
    * ERASURE_CODING section adds (custom ids ≥ 64) — so custom-policy
    * files resolve real names and parity-true consumed sizes instead of
    * the documented `ec#id` / data-bytes fallback. Tiny (couple of
    * policies), read driver-side, broadcast to the distributed loader. */
  private def ecPolicies(summary: FsImageFormat.FileSummary, imagePath: String,
                         conf: org.apache.hadoop.conf.Configuration)
      : Map[Int, FsImageFormat.EcPolicy] =
    summary.sections.find(_.name == "ERASURE_CODING") match {
      case None => FsImageFormat.EcPoliciesById
      case Some(sec) =>
        val custom = FsImageFormat.parseErasureCoding(FsImageFormat.maybeDecompress(
          FsImageFormat.readSection(imagePath, sec, conf), summary.codec))
        FsImageFormat.EcPoliciesById ++ custom.map(p => p.id -> p)
    }

  private def toInode(i: RawInode, path: String, strings: StringTables,
                      policies: Map[Int, FsImageFormat.EcPolicy] =
                        FsImageFormat.EcPoliciesById): FsInode =
    FsInode(path, i.name,
      i.inodeType match { case 1 => "F"; case 2 => "D"; case 3 => "S"; case _ => "?" },
      strings.user(FsImageFormat.permUserSerial(i.permission)),
      strings.group(FsImageFormat.permGroupSerial(i.permission)),
      "%04o".format(FsImageFormat.permMode(i.permission)),
      i.sizeBytes, i.consumedBytes, i.replication,
      i.numBlocks.toLong, i.mtime / 1000,
      if (path == "/") 0 else path.count(_ == '/'), i.id,
      i.atime / 1000, i.storagePolicy,
      FsImageFormat.ecPolicyName(i.ecPolicy, policies),
      i.symlinkTarget,
      i.aclRaw.length, i.aclRaw.toSeq.map(v => FsImageFormat.aclEntryString(v, strings)),
      i.xattrNames.length,
      i.xattrNames.indices.map(k =>
        FsImageFormat.xattrString(i.xattrNames(k), i.xattrValues(k), strings)),
      i.nsQuota, i.dsQuota, i.preferredBlockSize,
      i.underConstruction, i.ucClient, i.ucMachine)

  /** Iterative memoized upward path walk, O(n) total — iterative (not
    * recursive) so pathological directory depths can't overflow the stack,
    * with a cycle guard so a corrupt image's parent loop raises a
    * diagnosable error instead of recursing forever. */
  private def pathResolver(byId: Map[Long, RawInode],
                           parentOf: Long => Option[Long]): Long => String = {
    val memo = new java.util.HashMap[Long, String]()
    (start: Long) => {
      if (start == RootInodeId || !byId.contains(start)) "/"
      else {
        val cached = memo.get(start)
        if (cached != null) cached
        else {
          val seen = new java.util.HashSet[java.lang.Long]()
          var chain = List.empty[Long] // head = nearest-root unresolved id
          var id = start
          var base: String = null
          while (base == null) {
            if (id == RootInodeId || !byId.contains(id)) base = "/"
            else {
              val c = memo.get(id)
              if (c != null) base = c
              else {
                if (!seen.add(id)) throw new IllegalStateException(
                  s"fsimage directory tree has a parent cycle at inode $id")
                chain ::= id
                id = parentOf(id).getOrElse(RootInodeId)
              }
            }
          }
          var p = base
          chain.foreach { cid =>
            p = (if (p == "/") "" else p) + "/" + byId(cid).name
            memo.put(cid, p)
          }
          p
        }
      }
    }
  }

  /** Hard cap on directory-tree depth for the distributed path walk —
    * far above HDFS reality (dfs.namenode.fs-limits.max-directory-items
    * trees run ~10–40 deep); hitting it means the image's parent edges
    * form a cycle, and the walk raises the same diagnosis the driver
    * loader's [[pathResolver]] cycle guard does instead of looping. */
  private val MaxTreeDepth = 1024

  /** Distributed dir id → absolute path: O(tree depth) iterative parent
    * equi-joins, each round shrinking to the still-unresolved rows and
    * truncating lineage with an eager localCheckpoint (the
    * [[graft.operators.Dedup.connectedComponents]] pattern). No driver
    * materialization — the only per-round driver values are a count and
    * the loop guard.
    *
    * @param dirs (id, name, parent) for every non-root directory; parent
    *             is RootInodeId when the image carries no edge for it
    * @return (id, path) for every dir INCLUDING root ("/"); a dir whose
    *         parent chain leaves the dir table attaches at root, exactly
    *         like the driver loader's [[pathResolver]]
    */
  private[sources] def dirPathsDistributed(spark: SparkSession, dirs: DataFrame,
                                           maxDepth: Int = MaxTreeDepth): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, concat, lit, when}
    import spark.implicits._
    // join side, reused every round: non-root dirs keyed by id
    val parentSide = dirs.select(col("id").as("cursor"),
      col("name").as("p_name"), col("parent").as("p_parent"))
      .localCheckpoint()
    // state: path = <unresolved prefix of cursor> + suffix; done ⇔ cursor=root
    var active = dirs
      .select(col("id"), concat(lit("/"), col("name")).as("suffix"),
        col("parent").as("cursor"))
      .localCheckpoint()
    var done = List.empty[DataFrame]
    var rounds = 0
    while (!active.isEmpty) {
      rounds += 1
      if (rounds > maxDepth) throw new IllegalStateException(
        s"fsimage directory tree has a parent cycle (depth > $maxDepth)")
      val stepped = active.join(parentSide, Seq("cursor"), "left_outer")
        .select(col("id"),
          when(col("p_name").isNull, col("suffix"))
            .otherwise(concat(lit("/"), col("p_name"), col("suffix"))).as("suffix"),
          // unmatched cursor = root or a dangling parent → attach at root
          coalesce(col("p_parent"), lit(RootInodeId)).as("cursor"))
        .localCheckpoint()
      done ::= stepped.filter(col("cursor") === RootInodeId)
        .select(col("id"), col("suffix").as("path"))
      active = stepped.filter(col("cursor") =!= RootInodeId)
    }
    val root = Seq((RootInodeId, "/")).toDF("id", "path")
    done.foldLeft(root)(_ unionByName _).localCheckpoint()
  }

  /** Scale-path loader — see the object scaladoc for the design. Driver
    * memory is O(string table + scan buffer), never O(section) or
    * O(#dirs). */
  def inodesDistributed(spark: SparkSession, imagePath: String,
                        parallelism: Int = 0,
                        targetChunkBytes: Long = 32L << 20): DataFrame = {
    import spark.implicits._
    val sc = spark.sparkContext

    // All driver-side I/O goes through the Hadoop FileSystem API with the
    // session's configuration — the SAME resolution the executors use in
    // readRange, so one path string works whether the image is local or on
    // a DFS (a java.io reader here would break every hdfs:// path).
    val hadoopConf = sc.hadoopConfiguration
    val summary = FsImageFormat.readSummary(imagePath, hadoopConf)
    val secs = summary.sections.map(s => s.name -> s).toMap

    // String table: tiny (distinct users/groups/ACL names) — in-memory.
    val strings = {
      val st = secs.get("STRING_TABLE")
        .map(s => FsImageFormat.maybeDecompress(
          FsImageFormat.readSection(imagePath, s, hadoopConf), summary.codec))
        .getOrElse(Array.emptyByteArray)
      FsImageFormat.parseStringTable(st)
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
            // side file lives NEXT TO THE IMAGE via the same FileSystem —
            // on a DFS that is shared storage the executors can range-read
            val img = new org.apache.hadoop.fs.Path(imagePath)
            val fs = img.getFileSystem(hadoopConf)
            val side = new org.apache.hadoop.fs.Path(
              img.getParent, s".${img.getName}.graft-$name")
            val srcMtime = fs.getFileStatus(img).getModificationTime
            val valid = fs.exists(side) &&
              fs.getFileStatus(side).getModificationTime >= srcMtime
            if (!valid) {
              // inflate to a temp path, then rename into place: a crashed
              // or concurrent inflation must never leave a partial side
              // file that mtime-checks as valid on the next run
              val tmp = new org.apache.hadoop.fs.Path(img.getParent,
                s"${side.getName}.tmp-${java.util.UUID.randomUUID}")
              val out = fs.create(tmp, true)
              val in = FsImageFormat.sectionRawStream(imagePath, s, codec, hadoopConf)
              try {
                val buf = new Array[Byte](1 << 16)
                var n = in.read(buf)
                while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
              } catch {
                case e: Throwable =>
                  try { in.close(); out.close(); fs.delete(tmp, false) } catch { case _: Throwable => () }
                  throw e
              }
              in.close(); out.close()
              fs.delete(side, false) // rename-over-existing is not portable
              if (!fs.rename(tmp, side)) {
                fs.delete(tmp, false)
                // a concurrent loader may have won the rename — accept its file
                if (!fs.exists(side)) throw new java.io.IOException(
                  s"could not move inflated section into place: $side")
              }
            }
            (side.toString, Section(name, fs.getFileStatus(side).getLen, 0L))
        }
    }
    val (inodePath, inodeSec) = sectionView("INODE")
    val (dirPath, dirSec) = sectionView("INODE_DIR")

    // Driver pre-pass: stream each section once for message-aligned chunk
    // ranges (absolute offsets into the view file).
    def ranges(path: String, sec: Section, dropHeader: Boolean): Array[(Long, Long)] = {
      if (sec.length == 0) return Array.empty
      val requested =
        if (parallelism > 0) math.max(1L << 16, sec.length / parallelism)
        else targetChunkBytes
      // clamp: range byte counts travel through Int (readRange buffers) —
      // an unclamped multi-GiB chunk would wrap .toInt and silently drop
      // the tail of each range
      val chunk = math.min(requested, 1L << 30)
      val in = FsImageFormat.sectionRawStream(path, sec, None, hadoopConf)
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
    // persisted: each RDD feeds several jobs (dir-path resolution + final
    // DataFrame) — without persist the dominant cost (ranged I/O +
    // protobuf parse of both sections) would run per consumer. DISK_ONLY,
    // not MEMORY_AND_DISK_SER: blocks stream straight to the disk store,
    // so caching N concurrent 32 MB parse ranges never competes with
    // execution memory — the difference between completing and OOMing
    // under a 2 GiB cap at 10⁷–10⁸ inodes; the re-read is sequential
    // local-disk I/O, far cheaper than a re-parse.
    import org.apache.spark.storage.StorageLevel
    // EC policy table (built-ins + the image's ERASURE_CODING section):
    // tiny, read once on the driver, broadcast — executors need it for
    // the per-inode consumed-size math
    val bcPolicies = sc.broadcast(ecPolicies(summary, imagePath, hadoopConf))
    val parsedInodes = sc.parallelize(inodeRanges.toSeq, math.max(1, inodeRanges.length))
      .flatMap { case (from, to) =>
        val n = java.lang.Math.toIntExact(to - from)
        FsImageFormat.parseInodeRange(FsImageFormat.readRange(ip, from, n, hconf.value),
          0, n, bcPolicies.value)
      }
      .persist(StorageLevel.DISK_ONLY)
    val dirEntries = sc.parallelize(dirRanges.toSeq, math.max(1, dirRanges.length))
      .flatMap { case (from, to) =>
        val n = java.lang.Math.toIntExact(to - from)
        FsImageFormat.parseDirRange(FsImageFormat.readRange(dp, from, n, hconf.value), 0, n)
      }
      .persist(StorageLevel.DISK_ONLY)

    val bcStrings = sc.broadcast(strings)

    // Directory tree: resolved DISTRIBUTIVELY — no collect, no path-map
    // broadcast. Edges are (child, parent) from the INODE_DIR section;
    // the dir table is (id, name, parent) with parent root-attached when
    // the image carries no edge (same semantics as the driver loader).
    val edges = dirEntries
      .flatMap(d => d.children.map(c => (c, d.parent)))
      .toDF("child_id", "parent_id")
    val dirMeta = parsedInodes.filter(_.inodeType == 2)
      .map(i => (i.id, i.name))
      .toDF("id", "name")
    val dirTable = dirMeta.filter(col("id") =!= RootInodeId)
      .join(edges, col("id") === col("child_id"), "left_outer")
      .select(col("id"), col("name"),
        org.apache.spark.sql.functions.coalesce(col("parent_id"), lit(RootInodeId)).as("parent"))
    val dirPathsDf = dirPathsDistributed(spark, dirTable)

    // Dir rows: attach each RawInode dir to its resolved path by id join.
    val dirDs = parsedInodes.filter(_.inodeType == 2)
      .map(i => (i.id, i))
      .toDF("id", "inode")
      .join(dirPathsDf, Seq("id"))
      .select(col("inode").as("_1"), col("path").as("_2"))
      .as[(RawInode, String)]
      .map { case (i, p) => toInode(i, p, bcStrings.value, bcPolicies.value) }

    // Files + symlinks: parent edge join, then parent path by join (a
    // left-join miss = no edge or non-dir parent → root-attached).
    val nonDirs = parsedInodes.filter(_.inodeType != 2)
      .map(i => (i.id, i))
      .toDF("id", "inode")
      .join(edges, col("id") === col("child_id"), "left_outer")
      .join(dirPathsDf.select(col("id").as("parent_id"), col("path").as("pp")),
        Seq("parent_id"), "left_outer")
      .select(col("inode").as("_1"),
        org.apache.spark.sql.functions.coalesce(col("pp"), lit("/")).as("_2"))
      .as[(RawInode, String)]
      .map { case (i, pp) =>
        toInode(i, (if (pp == "/") "" else pp) + "/" + i.name,
          bcStrings.value, bcPolicies.value)
      }

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
      val policies = FsImageFormat.EcPoliciesById ++
        FsImageFormat.parseErasureCoding(sec("ERASURE_CODING")).map(p => p.id -> p)
      val raw = FsImageFormat.parseInodes(sec("INODE"), policies).toVector
      val dirEntries = FsImageFormat.parseDirEntries(sec("INODE_DIR")).toVector

      val parentOf = new java.util.HashMap[Long, Long]()
      dirEntries.foreach(e => e.children.foreach(c => parentOf.put(c, e.parent)))
      val byId = raw.map(i => i.id -> i).toMap

      val pathOf = pathResolver(byId,
        id => if (parentOf.containsKey(id)) Some(parentOf.get(id).longValue()) else None)
      raw.map(i => toInode(i, pathOf(i.id), strings, policies))
    } finally raf.close()
  }
}
