package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Contracts for e_pca_power / e_pca_var: the integer fixed-point power
  * iteration must land on (a scaling of) the same direction a plain
  * double-precision power iteration finds, and the variance readout must
  * stay internally consistent. Values are oracle-checked by the driver's
  * DuckDB gate. */
class PcaSpec extends SparkSpecBase {

  private def doubleGram(): Array[Array[Double]] = {
    val vecs = graft.core.Tables.embeddings(spark, Sf)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val d = vecs.head.length
    val g = Array.ofDim[Double](d, d)
    for (v <- vecs; i <- 0 until d; j <- 0 until d) g(i)(j) += v(i) * v(j)
    g
  }

  private def rayleigh(g: Array[Array[Double]], w: Array[Double]): Double = {
    val d = w.length
    val gw = Array.tabulate(d)(i => (0 until d).map(j => g(i)(j) * w(j)).sum)
    val num = (0 until d).map(i => w(i) * gw(i)).sum
    num / (0 until d).map(i => w(i) * w(i)).sum
  }

  test("integer power iteration reaches the double-precision direction") {
    val g = doubleGram()
    val d = g.length
    // 50-round double-precision reference from the same all-ones start
    var ref = Array.fill(d)(1.0)
    for (_ <- 1 to 50) {
      val y = Array.tabulate(d)(i => (0 until d).map(j => g(i)(j) * ref(j)).sum)
      val n = math.sqrt(y.map(x => x * x).sum)
      ref = y.map(_ / n)
    }
    val w = VectorQueries.pcaPower(spark, Sf).orderBy(col("dim")).collect()
      .map(_.getAs[Long]("pc1_q").toDouble)
    assert(w.length == d)
    // the fixed 8-round integer budget must capture (nearly) the same
    // spectral mass as the converged double reference
    val rw = rayleigh(g, w)
    val rr = rayleigh(g, ref)
    assert(rw >= 0.9 * rr, s"integer Rayleigh $rw << reference $rr")
    // renormalization keeps the iterate at the fixed-point scale
    val maxAbs = w.map(math.abs).max
    assert(maxAbs >= (1L << 19).toDouble && maxAbs <= (1L << 21).toDouble)
  }

  test("deflated components: pc1 pinned, near-orthogonal, decaying spectrum") {
    val rows = VectorQueries.pcaTopK(spark, Sf).collect()
    assert(rows.length === 4 * 64)
    val comps = rows.groupBy(_.getAs[Long]("component")).toSeq.sortBy(_._1)
      .map { case (_, rs) =>
        rs.sortBy(_.getAs[Long]("dim")).map(_.getAs[Long]("w_q").toDouble) }
    // component 1 IS e_pca_power's direction (shared Gram + rounds)
    val pc1 = VectorQueries.pcaPower(spark, Sf).orderBy(col("dim")).collect()
      .map(_.getAs[Long]("pc1_q").toDouble)
    assert(comps.head.sameElements(pc1))
    // pairwise near-orthogonality (integer deflation is approximate:
    // |cos| stays small, not exactly zero)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.indices.map(i => a(i) * b(i)).sum
      dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    for (i <- comps.indices; j <- (i + 1) until comps.length)
      assert(math.abs(cos(comps(i), comps(j))) < 0.15,
        s"components ${i + 1},${j + 1} cos=${cos(comps(i), comps(j))}")
    // every component explains a positive share; the synthetic corpus's
    // near-flat spectrum means strict decay is NOT guaranteed by an
    // 8-round estimate, but PC1 must stay within 20% of the best
    // component and the 4 together must not (grossly) exceed the total
    val varRows = VectorQueries.pcaTopKVar(spark, Sf).collect()
      .sortBy(_.getAs[Long]("component"))
    val exps = varRows.map(_.getAs[Long]("explained_bp"))
    assert(exps.forall(_ > 0L))
    assert(exps.head * 10L >= exps.max * 8L, exps.mkString(","))
    assert(exps.sum <= 10500L, exps.mkString(","))
  }

  test("pca dim permutation is a bijection that actually regroups dims") {
    val ws = VectorQueries.pcaTopDirections(
      graft.core.Tables.embeddings(spark, Sf)
        .select(col("vec_id"), transform(col("embedding"),
          x => floor(x.cast("double") * 16384).cast("long")).as("vq")), 4)
    val perm = VectorQueries.pcaPerm(ws)
    assert(perm.sorted.sameElements(Array.tabulate(64)(_.toLong)))
    assert(!perm.sameElements(Array.tabulate(64)(_.toLong)), "identity perm: eval is vacuous")
    val rot = VectorQueries.pqRotateEval(spark, Sf).collect()
    assert(rot.length === 16)
    val bySub = rot.groupBy(_.getAs[String]("variant"))
    assert(bySub("raw").length === 8 && bySub("rotated").length === 8)
    // same corpus priced twice: per-variant vector counts agree
    assert(bySub("raw").map(_.getAs[Long]("n_vecs")).sum ===
      bySub("rotated").map(_.getAs[Long]("n_vecs")).sum)
  }

  test("gram pass partial-aggregates before the shuffle and never joins") {
    val p = VectorQueries.pcaGram(VectorQueries.pcaQuant(spark, Sf))
      .queryExecution.executedPlan.toString
    // the corpus pass must be scan → explode → partial agg → exchange →
    // final agg: map-side combine caps the shuffle at 64 rows/partition
    assert(p.contains("partial_sum") || p.contains("Partial"),
      s"no map-side partial aggregation in the Gram pass")
    assert(!p.contains("Join"), "the Gram pass must not join anything")
    assert(!p.contains("CartesianProduct"))
  }

  test("variance readout is internally consistent") {
    val r = VectorQueries.pcaVar(spark, Sf).collect()(0)
    assert(r.getAs[Long]("n_vectors") > 0)
    val bp = r.getAs[Long]("explained_bp")
    // PC1 of any nonzero corpus explains a positive fraction, at most all
    assert(bp > 0 && bp <= 10000, s"explained_bp $bp out of range")
    // and at least the uniform floor 1/64 of the total variance
    assert(bp >= 10000 / 64, s"explained_bp $bp below the uniform floor")
  }
}
