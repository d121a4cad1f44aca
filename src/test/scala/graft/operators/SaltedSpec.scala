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
}
