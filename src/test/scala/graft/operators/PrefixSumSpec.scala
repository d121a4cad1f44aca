package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two-phase prefix sum must agree with the (non-scalable)
  * single-partition window definition on every partitioning. */
class PrefixSumSpec extends SparkSpecBase {

  private def reference(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val w = Window.orderBy(col("k")).rowsBetween(Window.unboundedPreceding, -1)
    pairs.toDF("k", "v")
      .select(col("k"), coalesce(sum(col("v")).over(w), lit(0L)).as("p"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("matches the window definition on shuffled sparse keys") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pairs = rnd.shuffle((0 until 500).map(i => (i * 13L + i % 7, rnd.nextInt(100).toLong)))
    val got = PrefixSum.exclusive(pairs.toDF("k", "v").repartition(11), "k", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == reference(pairs))
  }

  test("handles fewer rows than shuffle partitions (empty range partitions)") {
    import spark.implicits._
    val pairs = Seq((5L, 10L), (1L, 3L), (9L, 1L))
    val got = PrefixSum.exclusive(pairs.toDF("k", "v"), "k", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got == Seq((1L, 3L, 0L), (5L, 10L, 3L), (9L, 1L, 13L)))
  }

  test("empty input yields an empty result") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("k", "v")
    assert(PrefixSum.exclusive(empty, "k", "v").count() == 0)
  }
}
