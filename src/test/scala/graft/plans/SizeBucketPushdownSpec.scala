package graft.plans

import graft.SparkSpecBase
import graft.functions.SizeBucketImpl
import org.apache.spark.sql.functions._

/** The rewrite must (a) reach the parquet scan as a pushed size range and
  * (b) return exactly the rows the original opaque predicate selects. */
class SizeBucketPushdownSpec extends SparkSpecBase {

  test("size_bucket equality filter pushes a size range into the scan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("szpush").toString
    // sizes straddling several buckets incl. the edges of bucket 5
    val sizes = Seq(0L, 100L, SizeBucketImpl.MiB - 1, SizeBucketImpl.MiB,
      (1L << 23) - 1, 1L << 23, (1L << 24) - 1, 1L << 24, 1L << 30)
    sizes.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "size").write.mode("overwrite").parquet(dir)

    val q = spark.read.parquet(dir).filter(expr("size_bucket(size) = 5"))
    val plan = q.queryExecution.executedPlan.toString

    // bucket 5 = [2^23, 2^24): both bounds must be pushed to parquet
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(size,8388608)") &&
      plan.contains("LessThan(size,16777216)"), s"no pushed range:\n$plan")

    val got = q.select("size").collect().map(_.getLong(0)).toSet
    val expected = sizes.filter(s => SizeBucketImpl.bucket(s) == 5).toSet
    assert(got == expected && expected == Set(1L << 23, (1L << 24) - 1))

    // bucket 45 is unreachable (max real bucket is 44) — must stay empty,
    // not rewrite to size >= (1L << 63) == Long.MinValue (always true)
    assert(spark.read.parquet(dir).filter(expr("size_bucket(size) = 45")).count() == 0)

    // edge buckets keep exact semantics too
    for (b <- Seq(0, 1, 2, 3)) {
      val rows = spark.read.parquet(dir)
        .filter(expr(s"size_bucket(size) = $b"))
        .select("size").collect().map(_.getLong(0)).toSet
      assert(rows == sizes.filter(s => SizeBucketImpl.bucket(s) == b).toSet, s"bucket $b")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
