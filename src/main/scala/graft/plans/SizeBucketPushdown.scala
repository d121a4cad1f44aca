package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType
import graft.functions.{SizeBucketExpr, SizeBucketImpl}

/** Optimizer rule: rewrite `size_bucket(size) = b` filter predicates into
  * plain range predicates on `size`.
  *
  * `size_bucket` is an opaque function to the parquet source, so a filter
  * on it scans every row group; the equivalent `size >= lo AND size < hi`
  * is a plain comparison the scan pushes down (`PushedFilters`), letting
  * parquet min/max row-group stats skip data entirely — the difference
  * between a full scan and a pruned one at 100 TB. The bucket model is
  * exact integer math ([[SizeBucketImpl.bucket]]), so the rewrite is
  * lossless: bucket 0 ⇔ size ≤ 0, bucket 1 ⇔ (0, 1 MiB), bucket 2 ⇔
  * [1 MiB, 2 MiB), bucket b ≥ 3 ⇔ [2^(b+18), 2^(b+19)).
  *
  * Only Filter conditions are rewritten (the range conjunction agrees with
  * EqualTo on non-null inputs and both reject null rows in a filter).
  * Registered via [[graft.GraftExtensions]] `injectOptimizerRule`.
  */
object SizeBucketPushdown extends Rule[LogicalPlan] {

  private def range(c: Expression, b: Int): Expression = b match {
    // bucket() never exceeds 44 (size = Long.MaxValue → 45 - nlz = 44), so
    // b = 45 must stay never-true — 1L << 63 would wrap negative and turn
    // the predicate always-true
    case x if x < 0 || x > 44 => Literal.FalseLiteral
    case 0 => LessThanOrEqual(c, Literal(0L))
    case 1 => And(GreaterThan(c, Literal(0L)),
                  LessThan(c, Literal(SizeBucketImpl.MiB)))
    case 2 => And(GreaterThanOrEqual(c, Literal(SizeBucketImpl.MiB)),
                  LessThan(c, Literal(2L * SizeBucketImpl.MiB)))
    case x if x + 19 >= 63 => GreaterThanOrEqual(c, Literal(1L << (x + 18)))
    case x => And(GreaterThanOrEqual(c, Literal(1L << (x + 18))),
                  LessThan(c, Literal(1L << (x + 19))))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val rewritten = cond.transform {
        case EqualTo(SizeBucketExpr(c), Literal(b: Int, IntegerType)) => range(c, b)
        case EqualTo(Literal(b: Int, IntegerType), SizeBucketExpr(c)) => range(c, b)
      }
      if (rewritten.fastEquals(cond)) f else f.copy(condition = rewritten)
  }
}
