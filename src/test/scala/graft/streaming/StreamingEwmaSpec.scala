package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

case class PEv(ts: Timestamp, event_type: String, event_id: Long,
               user_id: Long, value: Double)

/** The streaming per-user EWMA gate: identical output under any batching
  * of an in-order stream, and equal to a direct per-user fold. */
class StreamingEwmaSpec extends SparkSpecBase {

  private def mkEvents: Seq[PEv] = {
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    (0 until 120).map { i =>
      PEv(new Timestamp(base + i * 60000L),
          if (i % 4 == 0) "view" else "purchase",
          i.toLong, (i % 5).toLong, (i % 17) * 1.37 + 1.0)
    }
  }

  private def run(name: String, splits: Seq[Seq[PEv]]): Seq[String] = {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PEv]
    val query = EventsStream.ewmaGated(input.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      splits.foreach { s => input.addData(s); query.processAllAvailable() }
      spark.table(name).orderBy("event_id").collect().map(_.toString).toSeq
    } finally query.stop()
  }

  test("alert sequence is split-invariant and equals the direct fold") {
    val evs = mkEvents
    val one = run("ewma_one", Seq(evs))
    val uneven = run("ewma_uneven",
      Seq(evs.take(7), evs.slice(7, 50), evs.slice(50, 51), evs.drop(51)))
    assert(one.nonEmpty && one == uneven)

    // direct per-user fold over the purchases in (ts, event_id) order
    val expected = evs.filter(_.event_type == "purchase")
      .groupBy(_.user_id).toSeq
      .flatMap { case (u, rows) =>
        var ewma = 0L; var n = 0L
        rows.sortBy(r => (r.ts.getTime, r.event_id)).map { r =>
          val vc = math.floor(r.value * 100).toLong
          val prev = if (n == 0) -1L else ewma
          val flag = if (n > 0 && vc > 2 * prev) 1 else 0
          ewma = if (n == 0) vc else (ewma + vc) / 2
          n += 1
          EventsStream.EwmaAlert(u, r.event_id, vc, prev, flag)
        }
      }
      .sortBy(_.event_id)
      .map(a => s"[${a.user_id},${a.event_id},${a.v_c},${a.ewma_prev_c},${a.is_anomaly}]")
    assert(one == expected)
    // the gate actually fires somewhere on this series
    assert(one.exists(_.endsWith(",1]")))
  }
}
