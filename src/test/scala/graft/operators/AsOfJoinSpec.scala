package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpecBase {
  test("backward as-of equals the brute-force definition") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val left = (1 to 300).map(i => (i.toLong, (i % 9).toLong, rnd.nextInt(1000).toLong))
      .toDF("l_id", "k", "t")
    val rightRows = (1 to 120).map(i => (i.toLong, (i % 9).toLong, rnd.nextInt(1000).toLong))
    val right = rightRows.toDF("r_id", "k", "rt")

    val got = AsOfJoin.backward(left, right,
        leftKey = "k", rightKey = "k", leftTime = "t", rightTime = "rt",
        payloadCols = Seq("r_id"), rightOrder = "r_id")
      .orderBy("l_id")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3)))

    // brute force: max rt <= t, ties by max r_id
    val byKey = rightRows.groupBy(_._2)
    val expected = left.collect().map { r =>
      val (lid, k, t) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val best = byKey.getOrElse(k, Seq.empty).filter(_._3 <= t)
        .sortBy(x => (x._3, x._1)).lastOption.map(_._1).getOrElse(-1L)
      lid -> best
    }.sortBy(_._1)

    assert(got.toSeq == expected.toSeq)
  }

  test("forward as-of equals the brute-force definition") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val left = (1 to 300).map(i => (i.toLong, (i % 9).toLong, rnd.nextInt(1000).toLong))
      .toDF("l_id", "k", "t")
    val rightRows = (1 to 120).map(i => (i.toLong, (i % 9).toLong, rnd.nextInt(1000).toLong))
    val right = rightRows.toDF("r_id", "k", "rt")

    val got = AsOfJoin.forward(left, right,
        leftKey = "k", rightKey = "k", leftTime = "t", rightTime = "rt",
        payloadCols = Seq("r_id"), rightOrder = "r_id")
      .orderBy("l_id")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3)))

    // brute force: min rt >= t, ties by min r_id
    val byKey = rightRows.groupBy(_._2)
    val expected = left.collect().map { r =>
      val (lid, k, t) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val best = byKey.getOrElse(k, Seq.empty).filter(_._3 >= t)
        .sortBy(x => (x._3, x._1)).headOption.map(_._1).getOrElse(-1L)
      lid -> best
    }.sortBy(_._1)

    assert(got.toSeq == expected.toSeq)
  }
}
