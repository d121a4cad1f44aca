package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core extraction by iterative peeling (Matula–Beck; the linear-time
  * sequential form is Batagelj–Zaveršnik 2003) — the third iterative-graph
  * primitive next to triangle counting and PageRank: repeatedly delete
  * every node of degree < k until the fixpoint, leaving the maximal
  * subgraph where every node keeps ≥ k neighbors (the standard cohesion
  * screen before community/centrality work).
  *
  * Distributed shape (the bounded-lineage recipe shared with
  * `Dedup.connectedComponents` and `qPagerank`): the SYMMETRIZED edge
  * table is peeled a FIXED number of rounds — each round is one
  * map-side-combined degree `groupBy` plus two left-semi equi-joins
  * against the (tiny, auto-broadcast) survivor set, `localCheckpoint`ed
  * so plan depth stays constant instead of growing a 2-joins-per-round
  * lineage. A fixed round count (rather than loop-until-converged) keeps
  * the computation expressible as unrolled SQL for the DuckDB oracle;
  * convergence is not assumed but CERTIFIED by the caller checking the
  * final minimum degree ≥ k (the `stable` column in `q_kcore`).
  *
  * At 100 TB: each round is O(|E|) shuffle work on the shrinking edge
  * table, rounds = peel-cascade depth (measured 6 at both sf0.01 and
  * sf0.1 on the co-order graph; bounded by graph degeneracy in the
  * worst case), and the survivor set rides as a broadcast semi-join —
  * no driver-side state beyond the checkpoint bookkeeping. */
object KCore {

  /** Peel `sym` (a SYMMETRIZED directed edge table with long columns
    * `u`, `v`; both (a,b) and (b,a) present, no self-loops) for exactly
    * `rounds` rounds at threshold `k`. Returns the surviving symmetric
    * edge table. Peeling preserves symmetry: an edge survives iff BOTH
    * endpoints have degree ≥ k, a symmetric criterion, so the result is
    * again a valid input (idempotent once converged). */
  def peel(sym: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"k-core threshold must be >= 1, got $k")
    require(rounds >= 1, s"peel rounds must be >= 1, got $rounds")
    var e = sym.localCheckpoint()
    for (r <- 1 to rounds) {
      // out-degree == degree on a symmetric table; survivors broadcast
      val keep = e.groupBy(col("u")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k)
        .select(col("u").as("node"))
        .localCheckpoint(false)
      e = e.join(keep, e("u") === keep("node"), "left_semi")
      e = e.join(keep, e("v") === keep("node"), "left_semi")
      // the semi-joins are broadcast (survivors ≪ edges), so a round adds
      // only map-side filters to the lineage — materializing every OTHER
      // round halves the checkpoint write volume while keeping the
      // re-derivation window at most one filter round deep
      if (r % 2 == 0 || r == rounds) e = e.localCheckpoint()
    }
    e
  }
}
