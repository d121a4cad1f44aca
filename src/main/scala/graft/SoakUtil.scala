package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shared plumbing for the capped-heap scale soaks ([[PipelineBench]],
  * [[AnnBench]]): one definition of the embedding synthesis keeps the two
  * soaks comparable (a drift in the perturbation would silently break
  * cross-soak numbers), and the timing/heap readouts stay identical. */
object SoakUtil {

  def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = f
    ((System.nanoTime() - t0) / 1e9, a)
  }

  def ms3(v: Double): String = (math.round(v * 1000) / 1000.0).toString

  /** Sum of per-pool peak heap since start (monotone, so the last sample
    * covers the run). Per-pool G1 peaks need not coincide in time, so the
    * SUM can read above -Xmx; the hard bound of record is -Xmx itself —
    * a capped run that completes proves the whole workload fit. */
  def peakHeapMb: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
      .map(_.getPeakUsage.getUsed).sum / (1024 * 1024)
  }

  /** Write a `mult`× embedding table to `$dir/embeddings.parquet`:
    * replica ids offset by 10⁶ (so the original probe ids stay the
    * smallest), each element deterministically perturbed per
    * (vec_id, replica, dim) — `mult`× DISTINCT points, not duplicates.
    * Returns the written row count. */
  def synthEmbeddings(spark: SparkSession, base: String, mult: Int,
                      dir: String): Long = {
    val reps = spark.range(mult).toDF("r")
    graft.core.Tables.embeddings(spark, base)
      .crossJoin(reps)
      .select((col("vec_id") + col("r") * 1000000L).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x + pmod(col("vec_id") * 7 + col("r") * 13 + i, lit(1000))
            .cast("float") / lit(1000000.0f)).cast("float")).as("embedding"),
        col("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    spark.read.parquet(s"$dir/embeddings.parquet").count()
  }
}
