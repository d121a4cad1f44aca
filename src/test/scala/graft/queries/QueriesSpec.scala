package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Plumbing-level checks at sf0.001 — the DuckDB oracle (driver + local
  * tools/check_oracle.py) is the authoritative value check. */
class QueriesSpec extends SparkSpecBase {

  test("size_bucket expression evaluates and stays codegen-compatible") {
    import spark.implicits._
    val df = Seq(0L, 1L, 1048576L, 2097152L, 4194304L).toDF("size")
      .select(col("size"), graft.functions.size_bucket(col("size")).as("b"))
    assert(df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap ==
      Map(0L -> 0, 1L -> 1, 1048576L -> 2, 2097152L -> 3, 4194304L -> 4))
  }

  test("namespace files = lineitem rows; inode types all present") {
    val ns = graft.core.Namespace.inodes(spark, Sf).cache()
    val byType = ns.groupBy("ftype").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val liCount = graft.core.Tables.lineitem(spark, Sf).count()
    assert(byType("F") == liCount)
    assert(byType.getOrElse("D", 0L) > 0 && byType.getOrElse("S", 0L) > 0)
    ns.unpersist()
  }

  test("every declared query runs and returns rows at sf0.001") {
    for ((name, fn) <- graft.SparkEntry.queries) {
      val n = fn(spark, Sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("matryoshka curve: full-dim row is a perfect-recall anchor, widths are complete") {
    val rows = VectorQueries.matryoshkaEval(spark, Sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(8L, 16L, 32L, 64L))
    val full = rows.find(_.getLong(0) == 64L).get
    assert(full.getAs[Long]("recall_bp") == 10000L,
      "truth compared against itself must be perfect recall")
    assert(rows.forall(_.getAs[Long]("n_queries") == 10L))
    assert(rows.forall(r => r.getAs[Long]("n_hit") <= r.getAs[Long]("n_truth")))
  }

  test("every oracle key has a matching query") {
    val qs = graft.SparkEntry.queries.keySet
    val orphans = graft.SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }
}
