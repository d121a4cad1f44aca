package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed exclusive prefix sum (SURVEY §2.3) — the scalable
  * replacement for the single-partition `Window.orderBy` cumulative sum
  * (which funnels the whole dataset through one task and is THE classic
  * 100 TB anti-pattern).
  *
  * Two-phase shape: range-partition + sort by the key, materialize once
  * (`localCheckpoint`, so both passes read the same blocks and the range
  * boundaries can't drift between jobs), then
  *   1. per-partition totals — one tiny row per partition to the driver
  *      (O(#partitions), thousands at cluster scale, never data-sized);
  *   2. per-partition running sums seeded with the broadcast cumulative
  *      offsets.
  * Wall-clock is two linear scans; shuffle is the one range exchange.
  */
object PrefixSum {

  /** @param df       input with a unique INTEGRAL `keyCol` and non-null
    *                  integral `valueCol` (fractional keys would collapse
    *                  under the long cast and break row identity)
    * @param keyCol   defines the global order (and identifies rows)
    * @param valueCol summed value
    * @return (keyCol, valueCol, prefix_excl) — prefix_excl = sum of
    *         valueCol over all rows with a strictly smaller key
    */
  def exclusive(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import org.apache.spark.sql.types.{ByteType, IntegerType, ShortType}
    Seq(keyCol, valueCol).foreach { c =>
      val dt = df.schema(c).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"PrefixSum.exclusive: column '$c' must be integral, got $dt")
    }
    val sorted = df
      .select(col(keyCol).cast("long").as(keyCol), col(valueCol).cast("long").as(valueCol))
      .repartitionByRange(col(keyCol))
      .sortWithinPartitions(col(keyCol))
      .localCheckpoint()
    val totals = sorted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L
        it.foreach(r => s += r.getLong(1))
        Iterator((pid, s))
      }
      .collect().sortBy(_._1).map(_._2)
    // offsets(pid) = sum of all partitions before pid
    val offsets = totals.scanLeft(0L)(_ + _)
    val bOff = spark.sparkContext.broadcast(offsets)
    val rows = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = bOff.value(pid)
      it.map { r =>
        val v = r.getLong(1)
        val p = s
        s += v
        Row(r.getLong(0), v, p)
      }
    }
    spark.createDataFrame(rows, StructType(Seq(
      StructField(keyCol, LongType, nullable = false),
      StructField(valueCol, LongType, nullable = false),
      StructField("prefix_excl", LongType, nullable = false))))
  }
}
