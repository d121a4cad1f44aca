package graft.queries

import java.nio.file.Files
import java.security.MessageDigest

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Corner cases for the split/leakage/budget/eval query family — the
  * DuckDB oracle is the value check; these pin the *logic* (partition
  * invariants, engineered leakage, arm disjointness) that a hash match
  * alone can't localize when it breaks. */
class SplitAndEvalSpec extends SparkSpecBase {

  /** The documented split gate, re-derived independently of the query:
    * md5("spl_" + id) → first 6 hex chars → basis points of 2²⁴. */
  private def splitOf(docId: Long): String = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s"spl_$docId".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 6)
    val bp = java.lang.Long.parseLong(hex, 16) * 10000L / 16777216L
    if (bp < 9000) "train" else if (bp < 9500) "val" else "test"
  }

  test("splitAssign partitions the corpus and reproduces exactly") {
    val docs = graft.core.Tables.documents(spark, Sf)
    val total = docs.count()
    val a = TextQueries.splitAssign(spark, Sf).collect()
    assert(a.map(_.getLong(2)).sum == total) // every doc in exactly one split
    assert(a.map(_.getString(0)).toSet.subsetOf(Set("train", "val", "test")))
    assert(a.forall(_.getLong(4) <= 10000L)) // lang_share_bp
    // train dominates under the 90/5/5 gate even on a 50-doc corpus
    val trainDocs = a.filter(_.getString(0) == "train").map(_.getLong(2)).sum
    assert(trainDocs * 10 >= total * 6, s"train=$trainDocs of $total")
    val b = TextQueries.splitAssign(spark, Sf).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("splitLeakage counts an engineered cross-split duplicate pair") {
    // pick one train id and one test id via the independent gate above
    val ids = (1L to 500L)
    val trainId = ids.find(splitOf(_) == "train").get
    val testId = ids.find(splitOf(_) == "test").get
    val valId = ids.find(splitOf(_) == "val").get
    import spark.implicits._
    val rows = Seq(
      (trainId, "the shared duplicate body", "en", "web", 25L),
      (testId, "the shared duplicate body", "en", "web", 25L),
      // same-split duplicate group: dup but NOT a leak
      (valId, "another body entirely", "en", "web", 21L),
      (ids.find(i => splitOf(i) == "val" && i != valId).get,
        "another body entirely", "en", "web", 21L),
      // singleton
      (ids.find(i => splitOf(i) == "train" && i != trainId).get,
        "unique text", "en", "web", 11L))
    val dir = Files.createTempDirectory("split_leak").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextQueries.splitLeakage(spark, dir).collect().head
    assert(r.getLong(0) == 2L, "n_dup_groups")     // two dup groups
    assert(r.getLong(1) == 1L, "n_leak_groups")    // only one straddles
    assert(r.getLong(2) == 1L, "leak_train_test")
    assert(r.getLong(3) == 0L, "leak_train_val")
    assert(r.getLong(4) == 0L, "leak_val_test")
    assert(r.getLong(5) == 2L, "n_docs_leaked")
  }

  test("tokenBudget shares are a coherent descending-cumulative view") {
    val docs = graft.core.Tables.documents(spark, Sf)
    val rows = TextQueries.tokenBudget(spark, Sf).collect()
    assert(rows.map(_.getLong(2)).sum == docs.count())
    val tokens = rows.map(_.getLong(3))
    assert(tokens.zip(tokens.tail).forall { case (a, b) => a >= b })
    val cum = rows.map(_.getLong(5))
    assert(cum.zip(cum.tail).forall { case (a, b) => a <= b })
    // floor rounding may shave at most one bp per row off the total
    assert(cum.last <= 10000L && cum.last >= 10000L - rows.length)
  }

  test("topShingles is bounded, ordered and within document frequency") {
    val nDocs = graft.core.Tables.documents(spark, Sf).count()
    val rows = TextQueries.topShingles(spark, Sf).collect()
    assert(rows.length <= 50)
    assert(rows.forall(r => r.getLong(1) >= 1L && r.getLong(1) <= nDocs))
    val dfs = rows.map(_.getLong(1))
    assert(dfs.zip(dfs.tail).forall { case (a, b) => a >= b })
  }

  test("qEventsLift arms partition events and users per type") {
    val ev = graft.core.Tables.events(spark, Sf)
    val expected = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (r <- Analytics.qEventsLift(spark, Sf).collect()) {
      val (n, u) = expected(r.getString(0))
      assert(r.getLong(1) + r.getLong(2) == n, s"${r.getString(0)} events")
      // assignment is per-user, so the user sets are disjoint and exhaustive
      assert(r.getLong(3) + r.getLong(4) == u, s"${r.getString(0)} users")
    }
  }

  test("sourceOverlap and zipf stay within set-theoretic bounds") {
    val ov = TextQueries.sourceOverlap(spark, Sf).collect()
    assert(ov.nonEmpty)
    assert(ov.forall(r => r.getLong(2) <= math.min(r.getLong(3), r.getLong(4))))
    assert(ov.forall(r => r.getLong(5) <= 10000L && r.getString(0) < r.getString(1)))
    val z = TextQueries.zipf(spark, Sf).collect().head
    assert(z.getLong(1) <= z.getLong(0)) // head is a subset of the vocab
    assert(!z.isNullAt(3) && z.getLong(3) < 0L) // frequencies decay
  }

  test("annPq returns 5 ranked candidates per query with monotone ADC") {
    val rows = VectorQueries.annPq(spark, Sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 10 && byQ.values.forall(_.length == 5))
    for ((_, rs) <- byQ) {
      val d = rs.sortBy(_.getInt(3)).map(_.getLong(2))
      assert(d.zip(d.tail).forall { case (a, b) => a <= b })
    }
    val rec = VectorQueries.annPqRecall(spark, Sf).collect()
    assert(rec.length == 10)
    assert(rec.forall(r => r.getLong(2) <= r.getLong(1) && r.getLong(3) <= 10000L))
  }

  test("exact refine dominates raw ADC recall, per query") {
    // the rerank's whole claim: re-ranking the ADC shortlist with exact
    // distances can only recover truth hits, never lose them — so
    // recall@5 must be >= the raw IVF-PQ number for EVERY query. (The
    // shortlist (50) covers the probed cells' plausible heads; a
    // violation means the shortlist or the exact metric drifted.)
    val raw = VectorQueries.annIvfPqRecall(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val ref = VectorQueries.annRerankRecall(spark, Sf).collect()
    assert(ref.length == raw.size)
    for (r <- ref)
      assert(r.getLong(3) >= raw(r.getLong(0)),
        s"q=${r.getLong(0)}: refine ${r.getLong(3)} < adc ${raw(r.getLong(0))}")
  }

  test("annIvfSq ranks candidates only from probed cells, distances monotone") {
    val rows = VectorQueries.annIvfSq(spark, Sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 10 && byQ.values.forall(_.length >= 5))
    for ((_, rs) <- byQ) {
      val d = rs.sortBy(_.getInt(3)).map(_.getLong(2))
      assert(d.zip(d.tail).forall { case (a, b) => a <= b })
    }
    val rec = VectorQueries.annIvfSqRecall(spark, Sf).collect()
    assert(rec.forall(r => r.getLong(2) <= r.getLong(1) && r.getLong(3) <= 10000L))
  }

  test("tfidfKeywords: scores are exact tf·⌊log2(N/df)⌋ and heads are per-doc") {
    val kw = TextQueries.tfidfKeywords(spark, Sf).collect()
    val nDocs = graft.core.Tables.documents(spark, Sf).count()
    assert(kw.groupBy(_.getLong(0)).values.forall(_.length <= 3))
    for (r <- kw) {
      val (tf, df, score) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(df >= 1 && df <= nDocs)
      val idf = 63 - java.lang.Long.numberOfLeadingZeros(nDocs / df)
      assert(score == tf * idf, s"term=${r.getString(2)}")
    }
  }

  test("probe sweep recall is monotone in nprobe") {
    // more probed cells can only add candidates — recall@5 must not
    // decrease as nprobe grows (the curve's defining property)
    val rows = VectorQueries.annProbeSweep(spark, Sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
    val recalls = rows.map(_.getLong(3))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b }, recalls.toSeq)
  }

  test("aHash is invariant to uniform brightness scaling, unlike md5") {
    // the perceptual property exact hashing lacks: doubling every
    // luminance preserves which blocks sit above the global mean
    val px = Array.tabulate(4096)(i => if ((i / 64) % 2 == 0) 10.toByte else 200.toByte)
    val brighter = px.map(b => ((b & 0xFF) * 2 / 3).toByte)
    assert(graft.multimodal.Multimodal.aHashOf(px) ==
           graft.multimodal.Multimodal.aHashOf(brighter))
    assert(graft.multimodal.Multimodal.aHashOf(Array.emptyByteArray) == "")
    val h = graft.multimodal.Multimodal.aHashOf(px)
    assert(h.length == 64 && h.forall(c => c == '0' || c == '1'))
  }

  test("sketch evals report hits within both pair sets") {
    for (q <- Seq(VectorQueries.minhashRecall _, VectorQueries.simhashEval _)) {
      val r = q(spark, Sf).collect().head
      val (nExact, nCand, nHit) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(nHit <= nExact && nHit <= nCand)
      assert(r.getLong(3) <= 10000L && r.getLong(4) <= 10000L)
    }
  }
}
