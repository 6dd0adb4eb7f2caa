package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the library's native
  * expressions into the SQL function registry so `spark.sql("SELECT
  * dot_fp(a, b) ...")` works alongside the Column API.
  *
  * Usage:
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)   // or
  *     .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_fp"),
      new ExpressionInfo(classOf[DotProductFp].getName, "dot_fp"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "dot_fp expects exactly 2 arguments")
        DotProductFp(children.head, children(1))
      }))
  }
}
