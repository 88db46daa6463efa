package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{Fnv1a64, LongToLsn, LsnToLong}

/** SparkSessionExtensions registering graft's custom Catalyst expressions
  * as SQL functions, so `spark.sql("SELECT lsn_to_long(...)")` works:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * // or: spark.sql.extensions=graft.GraftExtensions
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("lsn_to_long"),
      info("lsn_to_long", "lsn_to_long(str) - parse a Postgres %X/%X LSN to uint64"),
      (args: Seq[Expression]) => LsnToLong(args.head)))
    ext.injectFunction((FunctionIdentifier("long_to_lsn"),
      info("long_to_lsn", "long_to_lsn(bigint) - format uint64 as %X/%X LSN text"),
      (args: Seq[Expression]) => LongToLsn(args.head)))
    ext.injectFunction((FunctionIdentifier("fnv_fingerprint"),
      info("fnv_fingerprint", "fnv_fingerprint(str) - 64-bit FNV-1a content fingerprint"),
      (args: Seq[Expression]) => Fnv1a64(args.head)))
  }
}
