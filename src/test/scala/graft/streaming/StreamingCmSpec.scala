package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpecBase

/** Streaming Count-Min sketch: batch-split invariance, the CM
  * no-underestimate guarantee, and hash-recipe identity with the batch
  * `q_cm_sketch` (hex-string) formulation. */
class StreamingCmSpec extends SparkSpecBase {

  test("cmHash byte math equals the batch hex recipe") {
    val md = java.security.MessageDigest.getInstance("MD5")
    for (depth <- 0 until 4; id <- Seq(0L, 1L, 7L, 999L, 123456789L)) {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"cm${depth}_$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 12)
      val expect = (java.lang.Long.parseLong(hex, 16) % 256).toInt
      assert(EventsStream.cmHash(md, depth, id, 256) == expect, s"d=$depth id=$id")
    }
  }

  test("streaming CM converges to the single-fold grid and never underestimates") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    // type a: user u delivered (u%5)+1 times; type b: one user once —
    // per-type grids must stay isolated
    val a = (0 until 50).flatMap(u => Seq.fill((u % 5) + 1)(("a", u.toLong)))
    val b = Seq(("b", 7L))
    val all = a ++ b
    val input = MemoryStream[(String, Long)]
    val query = EventsStream.cmSketch(
        input.toDF().toDF("event_type", "user_id"))
      .writeStream.format("memory").queryName("cm_stream")
      .outputMode("update").start()
    try {
      val batches = Seq(all.take(60), all.drop(60))
      batches.foreach { b =>
        input.addData(b: _*)
        query.processAllAvailable()
      }
      // Final estimate per (type, user): CM running estimates are
      // MONOTONE nondecreasing across batches (cells only increment), so
      // the max over a key's emissions IS its last emission — no
      // dependence on memory-sink row order (the r6 ADVICE brittleness).
      val got = spark.table("cm_stream").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
      val exact = all.groupBy(identity).map { case (k, vs) => k -> vs.size.toLong }
      // never underestimate, for every user that got an emission
      for (((t, u), est) <- got)
        assert(est >= exact((t, u)), s"underestimate for $t/$u: $est")
      // reference grids folded batch-by-batch with the same hash recipe;
      // a key's expected value is the grid readout AFTER ITS LAST-SEEN
      // batch (update mode emits a key only in batches that touch it, so
      // later growth of shared cells must not leak into the expectation)
      val md = java.security.MessageDigest.getInstance("MD5")
      val grid = collection.mutable.Map.empty[String, Array[Long]]
      val expectAt = collection.mutable.Map.empty[(String, Long), Long]
      for (batch <- batches) {
        for ((t, u) <- batch) {
          val c = grid.getOrElseUpdate(t, new Array[Long](4 * 256))
          for (d <- 0 until 4) c(d * 256 + EventsStream.cmHash(md, d, u, 256)) += 1
        }
        for ((t, u) <- batch.distinct) {
          val c = grid(t)
          expectAt((t, u)) = (0 until 4)
            .map(d => c(d * 256 + EventsStream.cmHash(md, d, u, 256))).min
        }
      }
      assert(got.keySet == expectAt.keySet)
      for (((t, u), est) <- got)
        assert(est == expectAt((t, u)), s"batch-split drift for $t/$u: $est != ${expectAt((t, u))}")
      // type isolation: b's single event estimates exactly 1
      assert(got(("b", 7L)) == 1L)
    } finally query.stop()
  }
}
