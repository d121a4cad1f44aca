package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpecBase {
  test("bounded-buffer top-k equals window rank on tie-free data") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    // unique values per group → rank() and exact-k agree
    val df = (1 to 5000).map(i => ((i % 13).toLong, (i * 31 % 4999).toLong * 13 + i % 13, i.toLong))
      .toDF("g", "v", "id")

    val viaAgg = TopK.topK(df, "g", "v", "id", k = 7)
      .orderBy("g", "rnk").collect().map(_.toString)

    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    val viaWindow = df.withColumn("rnk", rank().over(w)).filter(col("rnk") <= 7)
      .select(col("g"), col("rnk"), col("id"), col("v"))
      .orderBy("g", "rnk").collect().map(_.toString)

    assert(viaAgg.toSeq == viaWindow.toSeq)
  }

  test("returns exactly k with deterministic tie cut") {
    import spark.implicits._
    val df = Seq((1L, 10L, 1L), (1L, 10L, 2L), (1L, 10L, 3L), (1L, 5L, 4L))
      .toDF("g", "v", "id")
    val rows = TopK.topK(df, "g", "v", "id", k = 2).orderBy("rnk").collect()
    assert(rows.map(_.getLong(2)).toSeq == Seq(1L, 2L)) // ids 1,2 win the tie
  }
}
