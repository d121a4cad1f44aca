package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
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

  /** Sorted bounded buffer as two parallel primitive arrays — encoded as
    * native ArrayType columns (product encoder, no kryo), so partial
    * buffers ship as compact unsafe rows on the shuffle. */
  final case class Buf(values: Array[Long], ids: Array[Long])

  private def better(v: Long, id: Long, v2: Long, id2: Long): Boolean =
    v > v2 || (v == v2 && id < id2)

  private final class TopKAgg(k: Int, bufEnc: Encoder[Buf],
                              outEnc: Encoder[Seq[Entry]])
      extends Aggregator[Entry, Buf, Seq[Entry]] {

    def zero: Buf = Buf(Array.emptyLongArray, Array.emptyLongArray)

    def reduce(b: Buf, e: Entry): Buf = {
      val n = b.values.length
      // O(1) rejection — the common case once the buffer is full
      if (n == k && !better(e._1, e._2, b.values(n - 1), b.ids(n - 1))) return b
      var pos = 0
      while (pos < n && better(b.values(pos), b.ids(pos), e._1, e._2)) pos += 1
      val m = math.min(n + 1, k)
      val vs = new Array[Long](m); val is = new Array[Long](m)
      System.arraycopy(b.values, 0, vs, 0, pos)
      System.arraycopy(b.ids, 0, is, 0, pos)
      vs(pos) = e._1; is(pos) = e._2
      val tail = m - pos - 1
      if (tail > 0) {
        System.arraycopy(b.values, pos, vs, pos + 1, tail)
        System.arraycopy(b.ids, pos, is, pos + 1, tail)
      }
      Buf(vs, is)
    }

    def merge(a: Buf, b: Buf): Buf = {
      if (a.values.isEmpty) return b
      if (b.values.isEmpty) return a
      val m = math.min(a.values.length + b.values.length, k)
      val vs = new Array[Long](m); val is = new Array[Long](m)
      var i = 0; var j = 0; var o = 0
      while (o < m) {
        val takeA = j >= b.values.length ||
          (i < a.values.length && better(a.values(i), a.ids(i), b.values(j), b.ids(j)))
        if (takeA) { vs(o) = a.values(i); is(o) = a.ids(i); i += 1 }
        else { vs(o) = b.values(j); is(o) = b.ids(j); j += 1 }
        o += 1
      }
      Buf(vs, is)
    }

    def finish(b: Buf): Seq[Entry] =
      b.values.indices.map(i => (b.values(i), b.ids(i)))

    def bufferEncoder: Encoder[Buf] = bufEnc
    def outputEncoder: Encoder[Seq[Entry]] = outEnc
  }

  /** df(groupCol, valueCol, idCol) → (groupCol, rnk, idCol, valueCol) of
    * the k best rows per group. */
  def topK(df: DataFrame, groupCol: String, valueCol: String, idCol: String,
           k: Int): DataFrame = {
    require(k >= 1, s"topK: k must be >= 1 (got $k)")
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new TopKAgg(k, implicitly[Encoder[Buf]],
      implicitly[Encoder[Seq[Entry]]]).toColumn
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
