package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SaltedSpec extends SparkSpecBase {
  test("salted aggregation equals plain groupBy on skewed data") {
    import spark.implicits._
    // heavy skew: 90% of rows share one key
    val df = (1 to 20000).map(i => (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toLong))
      .toDF("k", "v")

    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("n_rows"), sum("v").as("sum_v"))
      .orderBy("k").collect().map(_.toString)

    val salted = Salted.groupSum(df, Seq("k"), Seq("v"), saltBuckets = 8)
      .orderBy("k").collect().map(_.toString)

    assert(salted.toSeq == plain.toSeq)
  }

  test("skew join equals the plain join on hot-key data") {
    import spark.implicits._
    // left: 95% of rows on key 1; right: a small dim with multiple rows
    // per key (so the join fans out and salting must not change that)
    val left = (1 to 10000)
      .map(i => (if (i % 20 == 0) (i % 5).toLong + 2 else 1L, i.toLong)).toDF("k", "lv")
    val right = (0 to 6).flatMap(k => Seq((k.toLong, s"a$k"), (k.toLong, s"b$k")))
      .toDF("k", "rv")

    val plain = left.join(right, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val salted = Salted.skewJoin(left, right, "k", hotKeys = Seq(1L), replicas = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(salted == plain)
    // rows that match nothing on the right stay absent under salting too
    val rightMissing = right.filter(col("k") =!= 1L)
    val plain2 = left.join(rightMissing, Seq("k")).count()
    assert(Salted.skewJoin(left, rightMissing, "k", Seq(1L), 8).count() == plain2)
  }
}
