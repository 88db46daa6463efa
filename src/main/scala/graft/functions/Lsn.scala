package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Postgres LSN text form `%X/%X` ↔ uint64, as native Catalyst expressions
  * (codegen'd — no Scala UDF serialization in the hot path).
  *
  * Semantics mirror the reference's parseLSN (creek client.go:784-800,
  * itself from jackc/pglogrepl): `lsn = (upperHalf << 32) + lowerHalf`.
  */
object Lsn {
  /** Parse `%X/%X` → long. Static forwarder is referenced from codegen. */
  def parse(s: UTF8String): Long = {
    val str = s.toString
    val slash = str.indexOf('/')
    require(slash > 0, s"malformed LSN: $str")
    val upper = java.lang.Long.parseLong(str.substring(0, slash), 16)
    val lower = java.lang.Long.parseLong(str.substring(slash + 1), 16)
    (upper << 32) + lower
  }

  /** Format long → `%X/%X` (uppercase hex, no padding — pglogrepl form). */
  def format(l: Long): UTF8String =
    UTF8String.fromString(
      java.lang.Long.toHexString(l >>> 32).toUpperCase + "/" +
        java.lang.Long.toHexString(l & 0xFFFFFFFFL).toUpperCase)

  def lsn_to_long(c: Column): Column = Shim.column(LsnToLong(Shim.expression(c.cast("string"))))
  def long_to_lsn(c: Column): Column = Shim.column(LongToLsn(Shim.expression(c.cast("long"))))
}

case class LsnToLong(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    Lsn.parse(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Lsn.parse($c)")
  override protected def withNewChildInternal(newChild: Expression): LsnToLong =
    copy(child = newChild)
}

case class LongToLsn(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    Lsn.format(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Lsn.format($c)")
  override protected def withNewChildInternal(newChild: Expression): LongToLsn =
    copy(child = newChild)
}
