package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Structural contracts for the multi-layer HNSW search (values are
  * oracle-checked by the DuckDB gate, which replays the whole descent
  * through materialized per-layer CTEs). */
class HnswSpec extends SparkSpecBase {

  test("level assignment: pinned entry, capped levels, geometric nesting") {
    val lv = VectorQueries.embs(spark, Sf).withColumn("lvl", VectorQueries.hnswLvl)
    val byLvl = lv.groupBy(col("lvl")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byLvl.keys.forall(l => l >= 0 && l <= 2))
    // vec 0 is pinned to the top level → layer 2 is never empty
    assert(lv.filter(col("vec_id") === 0).collect()(0).getAs[Int]("lvl") === 2)
    val n = byLvl.values.sum
    val n1 = byLvl.getOrElse(1, 0L) + byLvl.getOrElse(2, 0L)
    // geometric: roughly n/16 at level >= 1 (generous band: hash noise
    // on a small corpus)
    assert(n1 >= n / 64 && n1 <= n / 4, s"level>=1 count $n1 of $n")
  }

  test("upper-layer graphs only link layer members, bounded out-degree") {
    val lv = VectorQueries.embs(spark, Sf).withColumn("lvl", VectorQueries.hnswLvl)
    for (l <- Seq(1, 2)) {
      val members = lv.filter(col("lvl") >= l).select(col("vec_id"))
        .collect().map(_.getLong(0)).toSet
      val g = VectorQueries.hnswLayerGraph(lv, l).collect()
      assert(g.nonEmpty)
      g.foreach { r =>
        assert(members(r.getAs[Long]("src_id")) && members(r.getAs[Long]("nbr_id")))
      }
      val outDeg = g.groupBy(_.getAs[Long]("src_id")).map(_._2.length)
      assert(outDeg.max <= 4)
    }
  }

  test("nav corpus is really clustered and the sweep's curve behaves") {
    // planted structure: a vector's nearest neighbor should be a cluster
    // twin (same vec_id mod 32) for the overwhelming majority of vectors
    val e = VectorQueries.navEmbs(spark, Sf).localCheckpoint()
    val rows = VectorQueries.hnswSweep(spark, Sf).collect()
    assert(rows.length === 4)
    val hnsw = rows.filter(_.getAs[String]("entry") == "hnsw")
      .sortBy(_.getAs[Long]("beam"))
    val hub = rows.filter(_.getAs[String]("entry") == "hub")
    assert(hnsw.length === 3 && hub.length === 1)
    // budget grows with beam/rounds...
    val budgets = hnsw.map(_.getAs[Long]("n_scored")).toSeq
    assert(budgets == budgets.sorted, s"budgets not monotone: $budgets")
    // ...and recall never degrades as budget grows (the curve the row
    // exists to publish: rising toward the hub number on navigable data)
    val recalls = hnsw.map(_.getAs[Long]("recall_bp")).toSeq
    assert(recalls == recalls.sorted, s"recalls not monotone: $recalls")
    // the top-budget multi-layer config must be in the hub entry's
    // regime on THIS corpus (the uniform corpus's 20% is the worst case,
    // not the operator's character)
    assert(recalls.last >= hub.head.getAs[Long]("recall_bp") / 2,
      s"top hnsw recall ${recalls.last} nowhere near hub ${hub.head}")
    // every config's PER-QUERY budget (n_scored sums the 10 queries)
    // stays far under the corpus size
    val n = e.count()
    rows.foreach(r => assert(r.getAs[Long]("n_scored") / 10 < n / 2, r.toString))
  }

  test("descent is deterministic and the budget stays entry-flat") {
    val a = VectorQueries.hnswSearch(spark, Sf).collect().map(_.toSeq)
    val b = VectorQueries.hnswSearch(spark, Sf).collect().map(_.toSeq)
    assert(a.nonEmpty && a.toSeq === b.toSeq)
    val rec = VectorQueries.hnswRecall(spark, Sf).collect()
    assert(rec.length === 10)
    rec.foreach { r =>
      assert(r.getAs[Long]("recall_bp") >= 0L && r.getAs[Long]("recall_bp") <= 10000L)
      // upper layers contribute O(rounds·M) and layer 0 O(beam·rounds·k)
      // scored candidates: the budget must stay far under the corpus
      assert(r.getAs[Long]("n_scored") < 200L, s"budget blew up: $r")
    }
  }
}
