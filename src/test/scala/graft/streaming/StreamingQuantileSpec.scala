package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpecBase

/** Streaming fixed-grid quantile sketch: batch-split invariance (a
  * histogram is a sum), the one-bucket-width upper-bound guarantee
  * against exact in-grid quantiles, type isolation, and saturation
  * clamping at the grid ceiling. */
class StreamingQuantileSpec extends SparkSpecBase {

  private val Buckets = 64
  private val Width = 1000L // cents per bucket

  /** The operator's integer readout, replicated: upper edge (cents) of
    * the first bucket whose cumulative count reaches ⌈p%·total⌉. */
  private def gridQuantile(counts: Array[Long], p: Long): Long = {
    val total = counts.sum
    val target = (p * total + 99) / 100
    var cum = 0L
    var i = 0
    while (i < Buckets - 1 && cum + counts(i) < target) { cum += counts(i); i += 1 }
    (i + 1L) * Width
  }

  private def fold(counts: Array[Long], vs: Seq[Double]): Unit =
    vs.foreach { v =>
      val cents = math.floor(v * 100).toLong
      counts(math.min(Buckets - 1L, math.max(0L, cents / Width)).toInt) += 1
    }

  test("quantile grid: split invariance, upper bound, isolation, saturation") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    // type a: 0..499 spread over the grid; type b: values past the grid
    // ceiling (64 buckets × 10.00 = 640.00) → estimates must CLAMP there
    val a = (0 until 500).map(u => ("a", (u % 500) * 1.0))
    val b = Seq.fill(10)(("b", 9999.0))
    val all = new scala.util.Random(7).shuffle(a ++ b)
    val batches = Seq(all.take(300), all.drop(300))

    val input = MemoryStream[(String, Double)]
    val query = EventsStream.quantileGrid(
        input.toDF().toDF("event_type", "value")).toDF()
      .writeStream.format("memory").queryName("qg_stream")
      .outputMode("update").start()
    try {
      batches.foreach { bt => input.addData(bt: _*); query.processAllAvailable() }
      // final emission per type = the row with the max cumulative n_rows
      // (n_rows is monotone; quantile estimates themselves need not be)
      val got = spark.table("qg_stream").collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).maxBy(_._1) }

      // split invariance: single-fold reference grid gives identical rows
      for ((t, vs) <- (a ++ b).groupBy(_._1)) {
        val c = new Array[Long](Buckets)
        fold(c, vs.map(_._2))
        val expect = (vs.size.toLong,
          gridQuantile(c, 50), gridQuantile(c, 95), gridQuantile(c, 99))
        assert(got(t) == expect, s"split drift for $t: ${got(t)} != $expect")
      }

      // upper-bound property for the in-grid type: estimate ≥ exact
      // quantile (cents) and within one bucket width of it
      val sortedA = a.map(x => math.floor(x._2 * 100).toLong).sorted
      for ((p, gotV) <- Seq(50L -> got("a")._2, 95L -> got("a")._3, 99L -> got("a")._4)) {
        val exact = sortedA(((p * sortedA.size + 99) / 100 - 1).toInt)
        assert(gotV >= exact, s"p$p upper bound violated: $gotV < $exact")
        assert(gotV - exact <= Width, s"p$p looser than one bucket: $gotV vs $exact")
      }

      // saturation: the off-grid type clamps to the grid ceiling
      assert(got("b") == ((10L, 64000L, 64000L, 64000L)))
    } finally query.stop()
  }
}
