package graft.sources

import org.apache.spark.sql.DataFrame

/** Report output formats (reference tool `-o txt|csv|json`,
  * tool/.../HdfsFSImageTool.java:55-59 + CsvExport/JsonExport tests),
  * re-expressed as distributed writers plus a driver-side text renderer
  * for the human-readable summary.
  */
object ReportSink {

  /** CSV with header — the tool's `-o csv`. */
  def csv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** JSON lines — the tool's `-o json` (records form). */
  def json(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Parquet — the engine-native interchange format. */
  def parquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Hive-style partitioned parquet — the 100 TB output posture: readers
    * of `WHERE owner = …` / date-ranged queries prune whole directories. */
  def parquetPartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed + sorted table (saveAsTable — bucketing needs a catalog):
    * co-locates join/agg keys so downstream joins on `bucketCols` skip the
    * shuffle entirely. */
  def parquetBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                      nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)

  /** Fixed-width text table of the first `maxRows` rows — the tool's
    * `-o txt` report body. Driver-side by design (human console output);
    * `maxRows` bounds the collect. */
  def text(df: DataFrame, maxRows: Int = 100): String = {
    val cols = df.columns
    val rows = df.limit(maxRows).collect().map(_.toSeq.map(v => String.valueOf(v)))
    val widths = cols.indices.map { i =>
      (cols(i).length +: rows.map(_(i).length)).max
    }
    def line(vals: Seq[String]): String =
      vals.zip(widths).map { case (v, w) => v.padTo(w, ' ') }.mkString(" | ")
    (line(cols.toSeq) +: ("-" * (widths.sum + 3 * (cols.length - 1))) +: rows.map(line))
      .mkString("\n")
  }
}
