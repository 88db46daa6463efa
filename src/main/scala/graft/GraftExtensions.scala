package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.Literal
import graft.functions.{DotProductExpr, Fnv1a64, HyperplaneLshExpr, LongToLsn,
  LsnToLong, MinHashSigExpr, SimHash64Expr, TokenShingleHashExpr, TopKByAgg}

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
    def intArg(e: Expression): Int =
      e.asInstanceOf[Literal].value.asInstanceOf[Number].intValue()
    ext.injectFunction((FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes",
        "shingle_hashes(str, width, distinct) - word-width-gram shingle hashes, one native pass"),
      (args: Seq[Expression]) => TokenShingleHashExpr(args.head,
        intArg(args(1)), args(2).asInstanceOf[Literal].value == true)))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(array<bigint>, numPerms) - MinHash signature"),
      (args: Seq[Expression]) => MinHashSigExpr(args.head, intArg(args(1)))))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(array<bigint>) - 64-bit SimHash of element hashes"),
      (args: Seq[Expression]) => SimHash64Expr(args.head)))
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(array, array) - ordered-accumulation dot product"),
      (args: Seq[Expression]) => DotProductExpr(args.head, args(1))))
    ext.injectFunction((FunctionIdentifier("hyperplane_lsh"),
      info("hyperplane_lsh",
        "hyperplane_lsh(array, tables, planes) - random-hyperplane LSH bucket codes"),
      (args: Seq[Expression]) => HyperplaneLshExpr(args.head,
        intArg(args(1)), intArg(args(2)))))
    ext.injectFunction((FunctionIdentifier("topk_by"),
      info("topk_by",
        "topk_by(payload, ord, tie, k) - top-k rows per group via bounded heaps (no sort)"),
      (args: Seq[Expression]) => TopKByAgg(args.head, args(1), args(2),
        intArg(args(3))).toAggregateExpression()))
  }
}
