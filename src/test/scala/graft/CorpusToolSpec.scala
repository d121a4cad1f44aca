package graft

/** Drives every CorpusTool command end-to-end at sf0.001 — dispatch-level
  * coverage; the underlying operators are oracle-checked via Verify. */
class CorpusToolSpec extends SparkSpecBase {

  test("every corpus command runs and returns rows") {
    val cmds = Seq("stats", "dedup", "minhash", "minhashkeep", "jaccard",
      "containment", "clusters", "keep", "semdedup", "semdedupeval",
      "semdedupeval09", "substrscrub", "semdecon", "ivfincr",
      "quality", "gopher", "dsir", "spandup", "curriculum", "langid", "keywords",
      "sample", "pack", "pii", "winnow", "winnoweval", "bpe",
      "wsample", "lenquantile", "rproject", "ccnet", "sourcecap", "fertility",
      "bpeloop", "spanislands", "spanhist", "knngraph", "knnrecall",
      "knndedup", "knnsearch", "knnsearcheval", "ivfrebalance",
      "ivfrebalanceeval", "bpeapply", "pcatopk", "pcatopkvar",
      "pqrotateeval", "hnswsearch", "hnswrecall", "hnswsweep", "minhashb3",
      "matryoshka", "unigramseg", "unigramem", "hnswinsert", "zordereval")
    for (c <- cmds)
      assert(CorpusTool.run(spark, c, Sf, Map.empty).count() > 0, s"$c returned 0 rows")
  }

  test("thresholds parameterize the pair commands") {
    // an impossible containment cut empties the pair set; the default finds some
    assert(CorpusTool.run(spark, "containment", Sf, Map("-c" -> "10001")).count() == 0)
    assert(CorpusTool.run(spark, "jaccard", Sf, Map("-j" -> "10001")).count() == 0)
  }

  test("unknown command is rejected with the command list") {
    val e = intercept[IllegalArgumentException] {
      CorpusTool.run(spark, "nope", Sf, Map.empty)
    }
    assert(e.getMessage.contains("semdedup"))
  }
}
