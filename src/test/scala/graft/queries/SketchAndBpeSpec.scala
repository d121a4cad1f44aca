package graft.queries

import java.nio.file.Files

import graft.SparkSpecBase

/** Corner cases for the Count-Min sketch and BPE merge-mining queries —
  * the DuckDB oracle is the value check; these pin the algorithmic
  * invariants a hash match can't localize when it breaks. */
class SketchAndBpeSpec extends SparkSpecBase {

  test("q_cm_sketch never underestimates and is exact when collision-free") {
    val rows = Analytics.qCmSketch(spark, Sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (exact, est, overBp) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(est >= exact, s"CM underestimated ${r.get(0)}: $est < $exact")
      assert(overBp >= 0L)
      assert(overBp == math.floor((est - exact) * 10000.0 / exact).toLong)
    }
  }

  test("qTopkMergeRollup bounds hold: est_min <= exact <= est_min + err_max") {
    val rows = Analytics.qTopkMergeRollup(spark, Sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (estMin, errMax, exact, ok) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))
      assert(errMax >= 0L)
      assert(estMin <= exact && exact <= estMin + errMax,
        s"bound violated: $estMin <= $exact <= ${estMin + errMax}")
      assert(ok, "ok column must certify the bound")
    }
  }

  test("lenQuantileRollup: merged ALL grid equals a raw-rescan grid and every cell contains its exact quantile") {
    val rows = TextQueries.lenQuantileRollup(spark, Sf).collect()
    assert(rows.nonEmpty)
    // every level answers all three quantiles
    val all = rows.filter(_.getAs[String]("lvl") == "ALL")
    assert(all.map(_.getAs[Long]("q_bp")).sorted.toSeq === Seq(5000L, 9000L, 9900L))
    for (r <- rows) {
      val (w, estLo, exact, ok) = (r.getAs[Long]("grid_w"), r.getAs[Long]("est_lo"),
        r.getAs[Long]("exact_q"), r.getAs[Boolean]("ok"))
      assert(ok, s"certificate must hold on ${r.getAs[String]("lvl")}")
      assert(estLo <= exact && exact < estLo + w,
        s"exact quantile $exact escaped its grid cell [$estLo, ${estLo + w})")
    }
    // mergeability: the ALL sketch (a sum of per-source grids) must agree
    // with a sketch built by rescanning raw documents at the global level
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(spark, Sf)
    val direct = docs.select(expr("n_chars div 256").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
    val n = docs.count()
    for (qBp <- Seq(5000L, 9000L, 9900L)) {
      val rank = (qBp * n + 9999L) / 10000L
      val estBucket = direct.orderBy(col("bucket")).collect()
        .scanLeft((Long.MinValue, 0L)) { case ((_, cum), r) =>
          (r.getAs[Long]("bucket"), cum + r.getAs[Long]("cnt")) }
        .find(_._2 >= rank).get._1
      val merged = rows.find(r =>
        r.getAs[String]("lvl") == "ALL" && r.getAs[Long]("q_bp") == qBp).get
      assert(merged.getAs[Long]("est_lo") === estBucket * 256L,
        s"merged grid diverged from the raw-rescan grid at q=$qBp")
    }
  }

  test("rpDistortion: JL ratio concentrates around 10000 bp and the projection is norm-preserving on average") {
    val rows = VectorQueries.rpDistortion(spark, Sf).collect()
    assert(rows.length === 32 * 31 / 2, "sample must yield exactly C(32,2) pairs")
    val ratios = rows.map(_.getAs[Long]("ratio_bp"))
    assert(!rows.exists(_.isNullAt(4)), "no degenerate zero-distance pairs expected")
    // E[ratio] = 10000 by the JL lemma with +-1 signs; k=16 gives a wide
    // per-pair spread but the MEAN over 496 pairs is tight. Deterministic
    // data + deterministic signs => this is a fixed number, not a flake.
    val mean = ratios.sum / ratios.length
    assert(mean > 8000 && mean < 12000, s"JL mean ratio off: $mean bp")
    // every pair stays within a loose multiplicative band (no catastrophic
    // collapse of any single distance)
    assert(ratios.forall(r => r > 1000 && r < 40000),
      s"pair distortion escaped the sanity band: min=${ratios.min} max=${ratios.max}")
  }

  test("qAbSrm flags an engineered one-sided assignment and passes the real one") {
    import java.security.MessageDigest
    import spark.implicits._
    def gateBp(id: Long): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(s"exp_$id".getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 6)
      java.lang.Long.parseLong(hex, 16) * 10000L / 16777216L
    }
    // the real corpus: a healthy md5 split must not trip the guardrail
    val real = Analytics.qAbSrm(spark, Sf).collect().head
    assert(real.getInt(3) == 0, s"false SRM alarm: $real")
    // doctored events: 40 users, ALL on the treatment side of the gate
    val treatIds = (1L to 10000L).filter(gateBp(_) < 5000).take(40)
    val dir = java.nio.file.Files.createTempDirectory("srm").toString
    treatIds.map(u => (u, new java.sql.Timestamp(86400000L), "click", 1.0, u))
      .toDF("user_id", "ts", "event_type", "value", "event_id")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rigged = Analytics.qAbSrm(spark, dir).collect().head
    assert(rigged.getLong(0) == 40L && rigged.getLong(1) == 0L)
    assert(rigged.getInt(3) == 1, s"SRM must fire on a one-sided split: $rigged")
  }

  test("qKmvDiff and qKmvIntersect partition the A side exactly") {
    // |A∖B| + |A∩B| = |A| on the exact columns — the two sketch queries
    // must agree on the ground truth they price their estimates against
    val d = Analytics.qKmvDiff(spark, Sf).collect().head
    val i = Analytics.qKmvIntersect(spark, Sf).collect().head
    assert(d.getAs[Long]("n_a") == i.getAs[Long]("n_a"))
    assert(d.getAs[Long]("n_diff_exact") + i.getAs[Long]("n_inter_exact")
      == d.getAs[Long]("n_a"))
  }

  test("rankFusion scores are exactly the RRF of the two source lists") {
    val a = VectorQueries.annBruteForce(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Number]("rnk").longValue).toMap
    val b = VectorQueries.annPq(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Number]("rnk").longValue).toMap
    val fused = VectorQueries.rankFusion(spark, Sf).collect()
    assert(fused.nonEmpty)
    for (r <- fused) {
      val key = (r.getLong(0), r.getLong(1))
      val expect = a.get(key).map(rk => 1000000L / (60 + rk)).getOrElse(0L) +
        b.get(key).map(rk => 1000000L / (60 + rk)).getOrElse(0L)
      assert(r.getAs[Long]("rrf") == expect, s"rrf drift at $key")
      val expectLists = Seq(a.contains(key), b.contains(key)).count(identity).toLong
      assert(r.getAs[Long]("n_lists") == expectLists)
    }
    // a both-lists candidate must outrank a single-list one at equal ranks
    assert(fused.forall(_.getAs[Long]("n_lists") >= 1L))
  }

  test("bpeLoop matches an in-memory reference BPE trajectory, incl. overlap semantics") {
    import spark.implicits._
    // "aaaa" pins the greedy-overlap contract: pair (a,a) counts 3 slots
    // but only 2 non-overlapping merges apply; later rounds then merge
    // the merged symbols ("aa","aa") — the re-pairing bpeMerges can't see
    val dir = Files.createTempDirectory("bpeloop").toString
    Seq(
      (1L, "aaaa aaaa abab", "en", "web", 14L),
      (2L, "abab the the banana", "en", "web", 19L),
      (3L, "banana the aaaa", "en", "web", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // reference BPE: same tie-break (count desc, pair asc), same greedy
    // leftmost non-overlapping application
    var vocab: Map[Vector[String], Long] = Seq(
      "aaaa", "aaaa", "abab", "abab", "the", "the", "banana", "banana",
      "the", "aaaa").groupBy(identity).map { case (t, o) =>
        t.map(_.toString).toVector -> o.size.toLong }
    val totalChars = vocab.map { case (s, f) => s.map(_.length).sum * f }.sum
    def applyMerge(s: Vector[String], pa: String, pb: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == pa && s(i + 1) == pb) {
          out += (pa + pb); i += 2
        } else { out += s(i); i += 1 }
      }
      out.result()
    }
    val expect = (1 to TextQueries.BpeLoopMerges).map { r =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (s, f) =>
        s.indices.dropRight(1).foreach { i =>
          counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + f }
      }
      val ((pa, pb), n) = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.head
      vocab = vocab.toSeq.map { case (s, f) => applyMerge(s, pa, pb) -> f }
        .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
      val toks = vocab.map { case (s, f) => s.length * f }.sum
      (r.toLong, pa, pb, n, toks, toks * 10000L / totalChars)
    }

    val got = TextQueries.bpeLoop(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === expect)
    // the overlap case actually fired: round-1 merge is (a,a) with 9
    // counted slots but tokens drop by only 6 (2 applications × 3 forms)
    assert(got.head._2 == "a" && got.head._3 == "a" && got.head._4 == 9L)
  }

  test("bpeApply prices every document with the trained merge table (in-memory reference)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("bpeapply").toString
    val docs = Seq(
      (1L, "aaaa aaaa abab", "en", "src_a", 14L),
      (2L, "abab the the banana", "en", "src_a", 19L),
      (3L, "banana the aaaa", "en", "src_b", 15L),
      (4L, "the aaaa abab abab banana", "en", "src_b", 25L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // reference: train 8 merges on the corpus vocab (count desc, pair asc
    // ties, greedy leftmost non-overlapping application) — then APPLY the
    // final segmentation to every document word
    val allWords = docs.flatMap(_._2.toLowerCase.split("\\s+"))
    var vocab: Map[Vector[String], Long] = allWords
      .groupBy(identity).map { case (t, o) =>
        t.map(_.toString).toVector -> o.size.toLong }
    def applyMerge(s: Vector[String], pa: String, pb: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == pa && s(i + 1) == pb) {
          out += (pa + pb); i += 2
        } else { out += s(i); i += 1 }
      }
      out.result()
    }
    (1 to TextQueries.BpeLoopMerges).foreach { _ =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (s, f) =>
        s.indices.dropRight(1).foreach { i =>
          counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + f }
      }
      if (counts.nonEmpty) {
        val ((pa, pb), _) = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head
        vocab = vocab.toSeq.map { case (s, f) => applyMerge(s, pa, pb) -> f }
          .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
      }
    }
    val segLen: Map[String, Long] =
      vocab.keys.map(s => s.mkString -> s.length.toLong).toMap
    val expect = docs.groupBy(_._4).toSeq.sortBy(_._1).map { case (src, ds) =>
      val ws = ds.flatMap(_._2.toLowerCase.split("\\s+"))
      val wsTok = ws.size.toLong
      val bpeTok = ws.map(segLen).sum
      val chars = ws.map(_.length.toLong).sum
      (src, ds.size.toLong, wsTok, bpeTok,
        bpeTok * 10000L / wsTok, bpeTok * 10000L / chars)
    }
    val got = TextQueries.bpeApply(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === expect)
    // the merges genuinely compressed: BPE tokens < chars on both sources
    expect.foreach { case (_, _, _, bpe, _, _) => assert(bpe > 0) }
    assert(got.map(_._4).sum < docs.map(_._2.replace(" ", "").length).sum)
  }

  test("bpeMerges finds the engineered dominant pair with exact weights") {
    import spark.implicits._
    // "abab" contributes pairs ab, ba, ab per occurrence; corpus freq 3.
    // "zq" appears once; single-char "a" is excluded by the len>=2 gate.
    val dir = Files.createTempDirectory("bpe").toString
    Seq(
      (1L, "abab abab zq", "en", "web", 12L),
      (2L, "abab a", "en", "web", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextQueries.bpeMerges(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // ab: 2 slots per "abab" form × freq 3 = 6 occurrences, 1 word form
    assert(out.head == (("ab", 6L, 1L)), out.mkString(", "))
    assert(out.map(t => t._1 -> t._2).toMap.apply("ba") == 3L)
    assert(out.map(_._1).contains("zq"))
    assert(!out.map(_._1).exists(_.contains("a ")), "pairs must not cross words")
  }
}
