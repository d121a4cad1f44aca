package graft.queries

import graft.SparkSpecBase

/** SemDeDup decision-table invariants (the value check is the DuckDB
  * oracle, which replays the fit + in-cluster pair scan exactly). */
class SemDedupSpec extends SparkSpecBase {
  test("semdedup emits one decision per vector and keeps a representative per cluster") {
    val rows = VectorQueries.semDedup(spark, Sf).collect()
    val n = graft.core.Tables.embeddings(spark, Sf).count()
    assert(rows.length == n, "one row per corpus vector")
    assert(rows.forall(r => r.getInt(2) == 0 || r.getInt(2) == 1))
    // the lowest id in a cluster can have no lower-id neighbor → always kept,
    // so every cluster retains at least one representative
    val byCluster = rows.groupBy(_.getLong(1))
    assert(byCluster.values.forall(_.exists(_.getInt(2) == 1)))
    byCluster.values.foreach { members =>
      val minId = members.map(_.getLong(0)).min
      assert(members.find(_.getLong(0) == minId).get.getInt(2) == 1,
        s"cluster min id $minId must be kept")
    }
  }
}
