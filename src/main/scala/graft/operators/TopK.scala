package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Group-wise top-k as a typed Aggregator with a bounded buffer — an
  * operator Spark lacks natively: `rank().over(window)` shuffles and sorts
  * EVERY group member before filtering, while this aggregator keeps at
  * most k (value, id) pairs per group on the map side too, so shuffle
  * volume is O(groups·k) instead of O(rows). The 100 TB form of "top
  * neighbors per query" / "top hotspots per tenant".
  *
  * Ordering: value DESC, id ASC — ties beyond position k are cut (unlike
  * rank(), which keeps them), giving exactly-k deterministic results.
  */
object TopK {

  type Entry = (Long, Long) // (value, id)

  private def better(a: Entry, b: Entry): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(k: Int)(buf: List[Entry], e: Entry): List[Entry] = {
    val (front, back) = buf.span(better(_, e))
    val merged = front ::: e :: back
    if (merged.length > k) merged.take(k) else merged
  }

  /** Aggregator over (value, id) pairs; buffer is a ≤k sorted list
    * (kryo-encoded — tiny, k entries). Partial aggregation applies on the
    * map side like any Aggregator. */
  private final class TopKAgg(k: Int) extends Aggregator[Entry, List[Entry], Seq[Entry]] {
    def zero: List[Entry] = Nil
    def reduce(buf: List[Entry], e: Entry): List[Entry] = insert(k)(buf, e)
    def merge(a: List[Entry], b: List[Entry]): List[Entry] = b.foldLeft(a)(insert(k))
    def finish(buf: List[Entry]): Seq[Entry] = buf
    def bufferEncoder: Encoder[List[Entry]] = Encoders.kryo[List[Entry]]
    def outputEncoder: Encoder[Seq[Entry]] = Encoders.kryo[Seq[Entry]]
  }

  /** df(groupCol, valueCol, idCol) → (groupCol, rnk, idCol, valueCol) of
    * the k best rows per group. */
  def topK(df: DataFrame, groupCol: String, valueCol: String, idCol: String,
           k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new TopKAgg(k).toColumn
    df.select(col(groupCol).cast("long"), col(valueCol).cast("long"), col(idCol).cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.name("topk"))
      .flatMap { case (g, entries) =>
        entries.zipWithIndex.map { case ((v, id), i) => (g, i + 1, id, v) }
      }
      .toDF(groupCol, "rnk", idCol, valueCol)
  }
}
