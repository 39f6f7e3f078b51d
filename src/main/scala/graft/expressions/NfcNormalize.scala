package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the
  * corpus-hygiene pass that folds combining sequences into precomposed
  * code points (e.g. `a` + U+0301 → `á`) so downstream exact/sketch dedup
  * and tokenization see one spelling per grapheme.
  *
  * Why a custom Expression: Spark has no Unicode-normalization builtin
  * (the usual fallback is a Scala UDF, which breaks whole-stage codegen
  * and serializes every row through a lambda). `java.text.Normalizer` is
  * JDK-standard canonical composition, so the generated code is a single
  * static call that stays inside the codegen'd projection. DuckDB's
  * `nfc_normalize` (utf8proc) implements the same Unicode canonical
  * composition, giving the oracle bit parity.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType

  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static entry point shared by eval and generated code. ASCII fast
    * path: `isNormalized` is a cheap scan that avoids allocating for the
    * (overwhelmingly common at corpus scale) already-NFC case. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
