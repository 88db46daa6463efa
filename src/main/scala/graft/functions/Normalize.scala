package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonical normalization as a native Catalyst expression
  * with codegen — the first pass of any text-cleaning pipeline (decomposed
  * combining sequences → precomposed forms, so byte-level dedup/hashing
  * sees one canonical spelling). Wraps `java.text.Normalizer` (ICU-exact
  * for NFC) inside whole-stage codegen: no UDF, no serialization, a
  * static call per row like the FNV/sketch expressions in this package.
  * The fast path skips allocation when the input is already NFC (true for
  * the overwhelming majority of real text).
  */
object Normalize {
  /** NFC-normalize the UTF-8 string. Referenced from generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def nfc_normalize(c: Column): Column =
    Shim.column(NfcNormalize(Shim.expression(c.cast("string"))))
}

case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    Normalize.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Normalize.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
