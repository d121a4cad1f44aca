package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.{graftshim => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `iec_format(bytes)` — human-readable IEC binary string column. */
case class IecFormatExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(IECBinaryImpl.format(input.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.IECBinaryImpl.format($c))")

  override protected def withNewChildInternal(newChild: Expression): IecFormatExpr =
    copy(child = newChild)
}

/** `iec_parse(str)` — bytes from an IEC binary string column. */
case class IecParseExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    IECBinaryImpl.parse(input.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.IECBinaryImpl.parse($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): IecParseExpr =
    copy(child = newChild)
}
