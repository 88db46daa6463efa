package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit FNV-1a rolling content fingerprint as a native Catalyst
  * expression with codegen — the document-fingerprinting primitive
  * (deterministic, order-sensitive, byte-level; public FNV reference
  * parameters offset=0xcbf29ce484222325, prime=0x100000001b3).
  */
object FnvHash {
  final val Offset = -3750763034362895579L // 0xcbf29ce484222325
  final val Prime = 1099511628211L // 0x100000001b3

  /** FNV-1a over the UTF-8 bytes of s. Referenced from generated code. */
  def fnv1a(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = Offset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xFFL)
      h *= Prime
      i += 1
    }
    h
  }

  def fnv_fingerprint(c: Column): Column =
    Shim.column(Fnv1a64(Shim.expression(c.cast("string"))))
}

case class Fnv1a64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    FnvHash.fnv1a(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FnvHash.fnv1a($c)")
  override protected def withNewChildInternal(newChild: Expression): Fnv1a64 =
    copy(child = newChild)
}
