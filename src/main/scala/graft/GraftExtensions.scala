package graft

import graft.functions.PyTitleCase
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Engine extensions registered through the public SparkSessionExtensions
  * surface: exposes the custom Catalyst expressions to Spark SQL, so
  * `spark.sql("SELECT py_title(name) ...")` works anywhere the extension is
  * installed (GraftSession installs it; usable via
  * `spark.sql.extensions=graft.GraftExtensions` on any cluster).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("py_title"),
      new ExpressionInfo(classOf[PyTitleCase].getName, "py_title"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 1, "py_title takes exactly one argument")
        PyTitleCase(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[graft.functions.VecDot].getName, "vec_dot"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2, "vec_dot takes exactly two arguments")
        graft.functions.VecDot(args.head, args(1))
      }))
    def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression, fn: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$fn expects a literal integer, got $other")
    }
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[graft.functions.MinhashSig].getName, "minhash_sig"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2, "minhash_sig takes (array<string>, k)")
        graft.functions.MinhashSig(args.head, intLit(args(1), "minhash_sig k"))
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[graft.functions.Simhash64].getName, "simhash64"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 1, "simhash64 takes exactly one argument")
        graft.functions.Simhash64(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[graft.functions.WordShingles].getName, "word_shingles"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2, "word_shingles takes (string, n)")
        graft.functions.WordShingles(args.head, intLit(args(1), "word_shingles n"))
      }))
    ext.injectFunction((
      FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[graft.functions.PolyHash].getName, "poly_hash"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2, "poly_hash takes (string, modulus)")
        val mod = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
          case other => throw new IllegalArgumentException(
            s"poly_hash expects a literal modulus, got $other")
        }
        graft.functions.PolyHash(args.head, mod)
      }))
  }
}
