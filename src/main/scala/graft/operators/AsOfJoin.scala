package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the most recent right row with
  * `rightTime <= leftTime` on the same key. Spark has no native as-of
  * operator; the naive formulation (range join + per-row max) explodes to
  * O(|L|·|R|) per key. This implementation uses the union+window shape:
  * tag and union both sides, sort each key's rows once by time, and carry
  * the latest right payload forward with `last_value(..., ignoreNulls)`.
  *
  * Cost: ONE shuffle on the key + one per-partition sort — the same plan
  * Spark generates for any window aggregation, independent of how many
  * right rows precede each left row. Skewed keys fall under AQE's
  * skew-handling like any window.
  *
  * Tie-breaks are deterministic: right rows at equal times resolve by the
  * ordering of `rightOrder`; at exactly equal left/right time the right
  * row sorts first (inclusive as-of).
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
               rightOrder: String): DataFrame = {
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

    // right rows sort before left rows at equal _t (inclusive as-of)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_isLeft"), col("_ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("_isLeft") === 1)
      .select(leftCols.map(col) ++ payloadCols.map(c => col(s"asof_$c")): _*)
  }
}
