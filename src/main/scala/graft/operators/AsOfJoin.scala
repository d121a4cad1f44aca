package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins — for each left row, the most recent right row with
  * `rightTime <= leftTime` (backward) or the earliest right row with
  * `rightTime >= leftTime` (forward) on the same key. Spark has no native
  * as-of operator; the naive formulation (range join + per-row extremum)
  * explodes to O(|L|·|R|) per key. This implementation uses the
  * union+window shape: tag and union both sides, sort each key's rows
  * once by time (descending for forward), and carry the latest right
  * payload forward with `last_value(..., ignoreNulls)`.
  *
  * Cost: ONE shuffle on the key + one per-partition sort — the same plan
  * Spark generates for any window aggregation, independent of how many
  * right rows precede each left row. Skewed keys fall under AQE's
  * skew-handling like any window.
  *
  * Tie-breaks are deterministic: right rows at equal times resolve by the
  * ordering of `rightOrder` (smallest wins in forward mode); at exactly
  * equal left/right time the right row sorts first (inclusive as-of).
  */
object AsOfJoin {

  /** @param left        left (probe) side
    * @param right       right (reference) side
    * @param leftKey     join key column name on the left
    * @param rightKey    join key column name on the right
    * @param leftTime    event-time column (long/timestamp) on the left
    * @param rightTime   event-time column on the right
    * @param payloadCols right columns carried to the output (prefixed asof_)
    * @param rightOrder  extra deterministic tie-break column on the right
    */
  def backward(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               payloadCols: Seq[String],
               rightOrder: String): DataFrame =
    joined(left, right, leftKey, rightKey, leftTime, rightTime,
      payloadCols, rightOrder, forward = false)

  /** Forward as-of: for each left row the EARLIEST right row at or after
    * its time — the "next scheduled event" lookup. Same one-shuffle
    * union+window plan as [[backward]], with the per-key sort reversed. */
  def forward(left: DataFrame, right: DataFrame,
              leftKey: String, rightKey: String,
              leftTime: String, rightTime: String,
              payloadCols: Seq[String],
              rightOrder: String): DataFrame =
    joined(left, right, leftKey, rightKey, leftTime, rightTime,
      payloadCols, rightOrder, forward = true)

  private def joined(left: DataFrame, right: DataFrame,
                     leftKey: String, rightKey: String,
                     leftTime: String, rightTime: String,
                     payloadCols: Seq[String],
                     rightOrder: String, forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq

    val taggedLeft = left
      .withColumn("_k", col(leftKey))
      .withColumn("_t", col(leftTime).cast("long"))
      .withColumn("_isLeft", lit(1))
      .withColumn("_ord", lit(Long.MaxValue))
    val taggedRight = payloadCols.foldLeft(
      right
        .withColumn("_k", col(rightKey))
        .withColumn("_t", col(rightTime).cast("long"))
        .withColumn("_isLeft", lit(0))
        .withColumn("_ord", col(rightOrder).cast("long"))
    ) { (df, c) => df.withColumnRenamed(c, s"asof_$c") }

    val lNull = payloadCols.foldLeft(taggedLeft)((df, c) =>
      df.withColumn(s"asof_$c", lit(null).cast(taggedRight.schema(s"asof_$c").dataType)))

    val unioned = lNull.select(
        (Seq("_k", "_t", "_isLeft", "_ord") ++ leftCols ++ payloadCols.map(c => s"asof_$c")).distinct.map(col): _*)
      .unionByName(
        taggedRight.select((Seq("_k", "_t", "_isLeft", "_ord") ++ payloadCols.map(c => s"asof_$c")).map(col): _*),
        allowMissingColumns = true)

    // right rows sort before left rows at equal _t (inclusive as-of);
    // forward mode walks time descending, so the carried right row is the
    // earliest at-or-after one, and _ord descends so the SMALLEST
    // tie-break value is the last seen (= the winner) at equal times
    val ordering =
      if (forward) Seq(col("_t").desc, col("_isLeft"), col("_ord").desc)
      else Seq(col("_t"), col("_isLeft"), col("_ord"))
    val w = Window.partitionBy(col("_k"))
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("_isLeft") === 1)
      .select(leftCols.map(col) ++ payloadCols.map(c => col(s"asof_$c")): _*)
  }
}
