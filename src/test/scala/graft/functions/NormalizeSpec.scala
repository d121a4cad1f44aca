package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** NFC canonicalization: decomposed and precomposed forms must converge,
  * already-normal text must pass through identically (and by reference —
  * the quick-check path), and the expression must survive codegen. */
class NormalizeSpec extends SparkSpecBase {

  private def norm(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(nfc_normalize(col("t"))).collect().head.getString(0)
  }

  test("decomposed e + combining acute becomes precomposed U+00E9") {
    assert(norm("café") == "café")
  }

  test("already-NFC text is unchanged, including non-BMP emoji") {
    assert(norm("plain ascii") == "plain ascii")
    assert(norm("café 😀") == "café 😀")
  }

  test("normalization is idempotent and hash-converges both forms") {
    import spark.implicits._
    val df = Seq(("a", "Schloß Straße é"), ("b", "Schloß Straße é"))
      .toDF("id", "t")
      .select(col("id"), md5(nfc_normalize(col("t"))).as("h"))
    val hs = df.collect().map(_.getString(1))
    assert(hs(0) == hs(1))
  }

  test("works through the SQL function surface with codegen") {
    import spark.implicits._
    Seq("éx").toDF("t").createOrReplaceTempView("norm_in")
    val out = spark.sql("SELECT nfc_normalize(t) AS n FROM norm_in").collect().head.getString(0)
    assert(out == "éx")
  }
}
