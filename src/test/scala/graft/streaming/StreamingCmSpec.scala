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
      input.addData(all.take(60): _*)
      query.processAllAvailable()
      input.addData(all.drop(60): _*)
      query.processAllAvailable()
      // last emission per (type, user) carries the final running estimate
      val got = spark.table("cm_stream").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .groupBy(_._1).map { case (k, vs) => k -> vs.last._2 }
      val exact = all.groupBy(identity).map { case (k, vs) => k -> vs.size.toLong }
      // never underestimate, for every user that got an emission
      for (((t, u), est) <- got)
        assert(est >= exact((t, u)), s"underestimate for $t/$u: $est")
      // single-fold reference grid via the same hash recipe
      val md = java.security.MessageDigest.getInstance("MD5")
      val grid = collection.mutable.Map.empty[String, Array[Long]]
      for ((t, u) <- all) {
        val c = grid.getOrElseUpdate(t, new Array[Long](4 * 256))
        for (d <- 0 until 4) c(d * 256 + EventsStream.cmHash(md, d, u, 256)) += 1
      }
      for (((t, u), est) <- got) {
        val c = grid(t)
        val expect = (0 until 4)
          .map(d => c(d * 256 + EventsStream.cmHash(md, d, u, 256))).min
        assert(est == expect, s"batch-split drift for $t/$u: $est != $expect")
      }
      // type isolation: b's single event estimates exactly 1
      assert(got(("b", 7L)) == 1L)
    } finally query.stop()
  }
}
