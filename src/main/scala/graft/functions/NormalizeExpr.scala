package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.{graftshim => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the text
  * canonicalization step a corpus pipeline runs before hashing/dedup
  * (decomposed "é" = `e` + U+0301 and precomposed U+00E9 must hash alike).
  * Spark has no built-in for this; a Scala UDF would box every row, while
  * this stays inside whole-stage codegen with one `java.text.Normalizer`
  * call per value. Mirrors DuckDB's `nfc_normalize` bit-for-bit, so
  * normalized-text hashes stay oracle-checkable (SURVEY §6).
  *
  * The common case (already-NFC ASCII/BMP text) short-circuits in
  * `Normalizer.isNormalized`'s quick check — near-zero cost on clean
  * corpora.
  */
case class NormalizeNfcExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    NormalizeNfcExpr.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeNfcExpr.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeNfcExpr =
    copy(child = newChild)
}

object NormalizeNfcExpr {
  /** Called from generated code — keep the signature UTF8String→UTF8String. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  def apply(c: Column): Column =
    ExpressionUtils.column(NormalizeNfcExpr(ExpressionUtils.expression(c)))
}
