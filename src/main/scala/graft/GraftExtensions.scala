package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.LongType
import graft.functions.{DotProductExpr, IecFormatExpr, IecParseExpr, NormalizeNfcExpr, SizeBucketExpr}

/** SparkSessionExtensions wiring (SURVEY §4): registers graft's native
  * expressions as SQL functions so the engine's surface is reachable from
  * pure SQL (`spark.sql("SELECT size_bucket(size) …")`), not just the
  * Column API.
  *
  * Use: `SparkSession.builder.withExtensions(new GraftExtensions)` —
  * [[graft.core.GraftSession]] applies it by default — or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

    ext.injectFunction((FunctionIdentifier("size_bucket"),
      info("size_bucket", "size_bucket(bytes) - exponential HFSA size bucket"),
      (args: Seq[Expression]) => SizeBucketExpr(Cast(args.head, LongType))))

    ext.injectFunction((FunctionIdentifier("iec_format"),
      info("iec_format", "iec_format(bytes) - IEC binary string, e.g. '2 KiB'"),
      (args: Seq[Expression]) => IecFormatExpr(Cast(args.head, LongType))))

    ext.injectFunction((FunctionIdentifier("iec_parse"),
      info("iec_parse", "iec_parse(str) - bytes from IEC binary string"),
      (args: Seq[Expression]) => IecParseExpr(args.head)))

    ext.injectFunction((FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", "nfc_normalize(str) - Unicode NFC canonicalization"),
      (args: Seq[Expression]) => NormalizeNfcExpr(args.head)))

    ext.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - dot product of two double arrays"),
      (args: Seq[Expression]) => DotProductExpr(args(0), args(1))))

    // size_bucket(size) = b  →  size range predicate (parquet-pushable)
    ext.injectOptimizerRule(_ => graft.plans.SizeBucketPushdown)
  }
}
