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
