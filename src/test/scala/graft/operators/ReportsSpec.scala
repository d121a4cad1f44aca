package graft.operators

import graft.SparkSpecBase

/** Crafted-inode edge cases for the report operators (the derived
  * namespace exercises the common paths; these pin the corners). */
class ReportsSpec extends SparkSpecBase {
  import org.apache.spark.sql.functions._

  private def inodes(rows: (String, String, Long)*) = {
    val session = spark
    import session.implicits._
    rows.toSeq.toDF("path", "name", "size")
      .withColumn("ftype", lit("F"))
      .withColumn("csize", col("size") * 2)
  }

  test("compactionPlan counts occupied bins, not the max bin index") {
    // limit > target: b (15 MiB) is still a "small" file at a 16 MiB
    // limit but overflows the 8 MiB archive on its own, skipping bin 1 —
    // n_bins must count the 2 occupied bins (0 and 2), saving 1 inode
    val df = inodes(
      ("/d/a", "a", 1L << 20),
      ("/d/b", "b", 15L << 20),
      ("/d/c", "c", 1L << 20))
    val plan = Reports.compactionPlan(df,
      limitBytes = 16L << 20, targetBytes = 8L << 20).collect()
    assert(plan.length == 1)
    assert(plan.head.getAs[Long]("n_bins") == 2L)
    assert(plan.head.getAs[Long]("files_saved") == 1L)
  }

  test("compactionPlan packs in name order and drops no-gain directories") {
    // /one: 3×1 MiB pack into a single 8 MiB bin (2 saved)
    // /solo: a single small file — nothing to gain, excluded
    val df = inodes(
      ("/one/a", "a", 1L << 20), ("/one/b", "b", 1L << 20),
      ("/one/c", "c", 1L << 20), ("/solo/x", "x", 1L << 20))
    val plan = Reports.compactionPlan(df,
      limitBytes = 2L << 20, targetBytes = 8L << 20).collect()
    assert(plan.map(_.getAs[String]("dir")).toSeq == Seq("/one"))
    assert(plan.head.getAs[Long]("n_bins") == 1L)
    assert(plan.head.getAs[Long]("files_saved") == 2L)
  }

  test("extensionReport lowercases, takes the last dot, and splits the byte share") {
    val df = inodes(
      ("/a/x.LOG", "x.LOG", 600L), ("/a/y.log", "y.log", 200L),
      ("/a/z.tar.gz", "z.tar.gz", 100L), ("/a/noext", "noext", 100L))
    val got = Reports.extensionReport(df)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    // ordered by bytes desc: log (800 = .LOG folded in), gz (last dot of
    // .tar.gz), '' for the dotless name; shares of the 1000-byte total
    assert(got.toSeq == Seq(
      ("log", 2L, 800L, 8000L), ("", 1L, 100L, 1000L), ("gz", 1L, 100L, 1000L)))
  }

  test("emptyDirs flags transitively-empty subtrees only") {
    val session = spark
    import session.implicits._
    // /warm holds a file deep down → /warm and /warm/mid are occupied;
    // /cold's only child is itself an empty dir → BOTH are empty
    val rows = Seq(
      ("/warm", "warm", "D"), ("/warm/mid", "mid", "D"),
      ("/warm/mid/f", "f", "F"),
      ("/cold", "cold", "D"), ("/cold/sub", "sub", "D"))
      .toDF("path", "name", "ftype")
      .withColumn("owner", lit("u")).withColumn("size", lit(1L))
      .withColumn("mtime_sec", lit(0L))
    val got = Reports.emptyDirs(rows).collect().map(_.getString(0)).toSeq
    assert(got == Seq("/cold", "/cold/sub"), got.mkString(", "))
  }

  test("giniReport: perfect equality scores 0, total concentration near 10^4") {
    val session = spark
    import session.implicits._
    def owned(rows: (String, String, Long)*) =
      rows.toSeq.toDF("path", "owner", "size")
        .withColumn("name", col("path")).withColumn("ftype", lit("F"))
    // 4 users, 100 bytes each → every Lorenz decile on the diagonal, G = 0
    val equal = owned(("/a", "u1", 100L), ("/b", "u2", 100L),
      ("/c", "u3", 100L), ("/d", "u4", 100L))
    val g0 = Reports.giniReport(equal).collect()
    assert(g0.forall(_.getLong(4) == 0L), "gini must be 0 under equality")
    assert(g0.last.getLong(3) == 10000L, "last decile must reach full share")
    // one user owns everything else near-zero → G = (n-1)/n·10⁴ = 7500
    val conc = owned(("/a", "u1", 0L), ("/b", "u2", 0L),
      ("/c", "u3", 0L), ("/d", "u4", 1000L))
    val g1 = Reports.giniReport(conc).collect()
    assert(g1.head.getLong(4) == 7500L, s"got ${g1.head.getLong(4)}")
  }

  test("duReport caps the key domain at maxDepth and keeps subtree totals") {
    val df = inodes(
      ("/a/b/c/deep", "deep", 10L),
      ("/a/b/c/deep2", "deep2", 5L),
      ("/a/top", "top", 1L),
      ("/rootfile", "rootfile", 2L))
    val got = Reports.duReport(df, maxDepth = 2, topN = 10)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // depth-2 cap: the deep files roll into /a/b, never /a/b/c
    assert(got("/") == ((18L, 4L)))
    assert(got("/a") == ((16L, 3L)))
    assert(got("/a/b") == ((15L, 2L)))
    assert(!got.contains("/a/b/c"))
  }

  // a diff-projection-shaped namespace: path, ftype, size, owner, mtime_sec
  private def ns(rows: (String, String, Long, String, Long)*) = {
    val session = spark
    import session.implicits._
    rows.toSeq.toDF("path", "ftype", "size", "owner", "mtime_sec")
  }

  private def directSummary(df: org.apache.spark.sql.DataFrame) =
    df.filter(col("ftype") === "F").groupBy(col("owner"))
      .agg(count(lit(1)).as("n_files"), sum(col("size")).as("sum_size"))

  test("incremental summary maintenance ≡ full recompute: chown, drop-out, new owner, non-file noise") {
    // before: u1 owns two files, u2 owns one, plus a dir and symlink.
    // after: u1's /a/f1 is chowned to brand-new u3 (mtime bumped so the
    // diff sees it), u2's only file is REMOVED (u2 must drop out of the
    // summary entirely), /a/f2 grows by 7 bytes, a new file lands for u1,
    // and the dir/symlink rows change mtime (diff rows that must NOT
    // leak into a files summary).
    val before = ns(
      ("/a/f1", "F", 100L, "u1", 10L), ("/a/f2", "F", 50L, "u1", 10L),
      ("/b/f3", "F", 30L, "u2", 10L),
      ("/a", "D", 0L, "u1", 5L), ("/a/ln", "S", 0L, "u1", 5L))
    val after = ns(
      ("/a/f1", "F", 100L, "u3", 11L), ("/a/f2", "F", 57L, "u1", 11L),
      ("/a/f4", "F", 9L, "u1", 12L),
      ("/a", "D", 0L, "u1", 6L), ("/a/ln", "S", 0L, "u1", 6L))
    val incr = Reports.applySummaryDelta(
        directSummary(before),
        Reports.summaryDelta(Reports.namespaceDiff(before, after)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val full = directSummary(after)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(incr === full)
    assert(incr === Set(("u1", 2L, 66L), ("u3", 1L, 100L)))
    assert(!incr.exists(_._1 == "u2"), "owner whose last file left must drop out")
  }

  test("incremental maintenance composes: successive diffs fold with no drift") {
    // the production loop: each cycle's maintained output IS the next
    // cycle's stored before-summary — A→B→C folded twice must equal a
    // direct recompute on C (owner u2 leaves in B and RETURNS in C, so a
    // drop-out row must be re-creatable from a later delta)
    val a = ns(("/f1", "F", 100L, "u1", 1L), ("/f2", "F", 30L, "u2", 1L))
    val b = ns(("/f1", "F", 100L, "u1", 2L), ("/f3", "F", 7L, "u1", 2L))
    val c = ns(("/f1", "F", 100L, "u1", 2L), ("/f3", "F", 9L, "u1", 3L),
      ("/f4", "F", 11L, "u2", 3L))
    val sB = Reports.applySummaryDelta(directSummary(a),
      Reports.summaryDelta(Reports.namespaceDiff(a, b)))
    val sC = Reports.applySummaryDelta(sB,
      Reports.summaryDelta(Reports.namespaceDiff(b, c)))
    def set(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(set(sC) === set(directSummary(c)))
    assert(set(sC) === Set(("u1", 2L, 109L), ("u2", 1L, 11L)))
  }

  test("type flip at identical size/owner/mtime is a modified diff row and keeps the maintained summary exact (ADVICE r11)") {
    // /a/f1 is a FILE before and a SYMLINK after, with size, owner and
    // mtime all unchanged — the predicate that compared only those three
    // classified the flip 'unchanged', losing the file debit and breaking
    // the maintained summary's exact-equivalence contract.
    val before = ns(("/a/f1", "F", 100L, "u1", 10L), ("/b/f2", "F", 7L, "u2", 10L))
    val after  = ns(("/a/f1", "S", 100L, "u1", 10L), ("/b/f2", "F", 7L, "u2", 10L))
    val diff = Reports.namespaceDiff(before, after)
    val changes = diff.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(changes === Set(("/a/f1", "modified")))
    val incr = Reports.applySummaryDelta(directSummary(before),
        Reports.summaryDelta(diff))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val full = directSummary(after)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(incr === full)
    assert(incr === Set(("u2", 1L, 7L)), "u1's file debit must land (flip to symlink)")
  }

  test("summaryDelta on an empty diff is empty and applySummaryDelta is then identity") {
    val base = ns(("/a/f1", "F", 100L, "u1", 10L))
    val diff = Reports.namespaceDiff(base, base)
    assert(diff.count() === 0L)
    val kept = Reports.applySummaryDelta(directSummary(base), Reports.summaryDelta(diff))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(kept === Set(("u1", 1L, 100L)))
  }
}
