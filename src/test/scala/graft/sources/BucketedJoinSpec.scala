package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The 100 TB co-location posture: two tables bucketed+sorted on the join
  * key ([[ReportSink.parquetBucketed]]) must join with ZERO exchanges —
  * the shuffle is paid once at write time and amortized over every
  * downstream join/aggregation on that key. */
class BucketedJoinSpec extends SparkSpecBase {

  test("join of two bucketed tables runs with no Exchange in the plan") {
    import spark.implicits._
    val a = (1 to 10000).map(i => (i.toLong, s"a_$i")).toDF("key", "a_val")
    val b = (1 to 10000).map(i => (i.toLong, i * 2L)).toDF("key", "b_val")

    spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    ReportSink.parquetBucketed(a, "graft_bkt_a", Seq("key"), nBuckets = 8)
    ReportSink.parquetBucketed(b, "graft_bkt_b", Seq("key"), nBuckets = 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bkt_a").join(spark.table("graft_bkt_b"), "key")
      assert(joined.count() == 10000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      // result equality with the plain (shuffled) join
      val plain = a.join(b, "key")
      assert(joined.exceptAll(plain).count() == 0 && plain.exceptAll(joined).count() == 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }
}
