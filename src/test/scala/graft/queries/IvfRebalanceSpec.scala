package graft.queries

import graft.SparkSpecBase

/** [[VectorQueries.ivfRebalance]] invariants (values are hash-checked by
  * the DuckDB oracle; these are the CONTRACT guarantees): population
  * conservation, the post-split load bound, provenance, id freshness,
  * and the balanced-cut ±1 halves. */
class IvfRebalanceSpec extends SparkSpecBase {

  test("rebalance conserves population and lands every cell within the load bound") {
    val before = VectorQueries.ivfBalance(spark, Sf).collect()
    val after = VectorQueries.ivfRebalance(spark, Sf).collect()
    val nTotal = before.map(_.getAs[Long]("n_vecs")).sum
    val nCells0 = before.length.toLong
    assert(after.map(_.getAs[Long]("n_vecs")).sum === nTotal, "population conserved")
    // the bound, vs the PRE-split fair share (the probe budget's basis):
    // unsplit cells satisfy it by the hot predicate, split halves by the
    // balanced median cut
    after.foreach { r =>
      assert(r.getAs[Long]("n_vecs") * nCells0 * 10000 <=
        VectorQueries.IvfSplitLoadBp * nTotal, s"over bound: $r")
    }
    // every hot cell was split; kept cells keep their id
    val hotParents = after.filter(_.getAs[Boolean]("was_split"))
      .map(_.getAs[Long]("parent_cell")).toSet
    assert(hotParents.nonEmpty, "harness data must exercise a split")
    before.filter(r => r.getAs[Long]("n_vecs") * nCells0 * 10000 >
        VectorQueries.IvfSplitLoadBp * nTotal)
      .foreach(r => assert(hotParents.contains(r.getAs[Long]("cell"))))
    after.filter(!_.getAs[Boolean]("was_split"))
      .foreach(r => assert(r.getAs[Long]("cell") === r.getAs[Long]("parent_cell")))
    // fresh ids collision-free; each split parent → exactly 2 sub-cells
    // with ±1 balanced halves
    assert(after.map(_.getAs[Long]("cell")).distinct.length === after.length)
    after.filter(_.getAs[Boolean]("was_split"))
      .groupBy(_.getAs[Long]("parent_cell")).foreach { case (p, subs) =>
        assert(subs.length === 2, s"parent $p sub-cell count")
        val pops = subs.map(_.getAs[Long]("n_vecs")).sorted
        assert(pops(1) - pops(0) <= 1, s"parent $p split ${pops.mkString("/")}")
      }
  }

  test("rebalance eval reports the improvement with conserved totals") {
    val rows = VectorQueries.ivfRebalanceEval(spark, Sf).collect()
      .map(r => r.getAs[String]("phase") -> r).toMap
    assert(rows("before").getAs[Long]("n_total") ===
      rows("after").getAs[Long]("n_total"))
    assert(rows("after").getAs[Long]("max_load_bp") <= VectorQueries.IvfSplitLoadBp)
    assert(rows("after").getAs[Long]("max_load_bp") <
      rows("before").getAs[Long]("max_load_bp"))
    assert(rows("after").getAs[Long]("n_cells") >
      rows("before").getAs[Long]("n_cells"))
  }
}
