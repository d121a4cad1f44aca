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
