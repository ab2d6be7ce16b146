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
  }
}
