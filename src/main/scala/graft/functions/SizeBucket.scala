package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.{graftshim => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Exponential file-size bucketing with the reference's bucket model
  * (reference lib/.../util/SizeBucket.java:54-66, Bucket2nModel):
  * bucket 0 = 0 B, 1 = (0, 1 MiB), 2 = [1, 2 MiB), then doubling.
  *
  * Implemented with exact integer math (`numberOfLeadingZeros`), not
  * floating-point log2, so results are bit-exact and the DuckDB oracle can
  * reproduce them with an integer CASE ladder ([[SizeBucketSql]]).
  */
object SizeBucketImpl {
  final val MiB = 1L << 20

  /** floor(log2(size)) - 18 for size ≥ 2 MiB ⇔ reference's
    * `(int)(log(size/2MiB)/log(2)) + 3`. */
  def bucket(size: Long): Int =
    if (size <= 0L) 0
    else if (size < MiB) 1
    else if (size < 2 * MiB) 2
    else 45 - java.lang.Long.numberOfLeadingZeros(size)

  /** Upper border of a bucket in bytes (reference SizeBucket.java:76-86):
    * border(0)=0, border(b)=2^(b+19) (1 MiB, 2 MiB, 4 MiB, ...). */
  def upperBorder(bucket: Int): Long =
    if (bucket <= 0) 0L else 1L << (bucket + 19)
}

/** Catalyst expression wrapper — codegen keeps the whole aggregation inside
  * WholeStageCodegen (no UDF boxing/serialization on the 100 TB path). */
/** Child must be LongType — [[graft.functions.size_bucket]] casts. */
case class SizeBucketExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    SizeBucketImpl.bucket(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SizeBucketImpl.bucket($c)")

  override protected def withNewChildInternal(newChild: Expression): SizeBucketExpr =
    copy(child = newChild)
}

/** DuckDB-side rendering: an integer CASE ladder (no float log2 — avoids
  * 1-ulp disagreements at exact powers of two). */
object SizeBucketSql {
  def caseSql(col: String, maxBucket: Int = 26): String = {
    val cases = (3 to maxBucket).map { b =>
      s"WHEN $col < ${1L << (b + 19)} THEN $b"
    }
    s"""CASE WHEN $col <= 0 THEN 0
        WHEN $col < 1048576 THEN 1
        WHEN $col < 2097152 THEN 2
        ${cases.mkString("\n        ")}
        ELSE ${maxBucket + 1} END"""
  }

  def upperBorderSql(bucketCol: String): String =
    s"CASE WHEN $bucketCol <= 0 THEN 0 ELSE (CAST(1 AS bigint) << ($bucketCol + 19)) END"
}
