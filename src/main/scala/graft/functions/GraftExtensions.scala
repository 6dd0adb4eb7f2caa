package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the library's native
  * expressions into the SQL function registry so `spark.sql("SELECT
  * dot_fp(a, b) ...")` works alongside the Column API, and installs the
  * [[RewriteSortedIntersectCount]] optimizer rule so the portable
  * `size(array_intersect(...))` formulation over provably-sorted inputs
  * compiles to the merge-count kernel.
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
    ext.injectFunction((
      new FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "sorted_intersect_count expects exactly 2 arguments")
        SortedIntersectCount(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("shingle_array"),
      new ExpressionInfo(classOf[ShingleArray].getName, "shingle_array"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "shingle_array expects (text, n)")
        children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(n: Integer, _) =>
            ShingleArray(children.head, n)
          case other => throw new IllegalArgumentException(
            s"shingle_array n must be an integer literal, got $other")
        }
      }))
    ext.injectFunction((
      new FunctionIdentifier("fixed_point"),
      new ExpressionInfo(classOf[FixedPointFp].getName, "fixed_point"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "fixed_point expects exactly 1 argument")
        FixedPointFp(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("quantize_int8"),
      new ExpressionInfo(classOf[QuantizeInt8Fp].getName, "quantize_int8"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "quantize_int8 expects exactly 1 argument")
        QuantizeInt8Fp(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash_fp"),
      new ExpressionInfo(classOf[SimHashFp].getName, "simhash_fp"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "simhash_fp expects exactly 1 argument")
        SimHashFp(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash64_fp"),
      new ExpressionInfo(classOf[SimHash64Fp].getName, "simhash64_fp"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "simhash64_fp expects exactly 1 argument")
        SimHash64Fp(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sigs_fp"),
      new ExpressionInfo(classOf[MinHashSigsFp].getName, "minhash_sigs_fp"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "minhash_sigs_fp expects (shingles, k)")
        children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(k: Integer, _) =>
            MinHashSigsFp(children.head, k)
          case other => throw new IllegalArgumentException(
            s"minhash_sigs_fp k must be an integer literal, got $other")
        }
      }))
    ext.injectFunction((
      new FunctionIdentifier("multi_pattern_count"),
      new ExpressionInfo(classOf[MultiPatternCount].getName, "multi_pattern_count"),
      (children: Seq[Expression]) => {
        require(children.length >= 2,
          "multi_pattern_count expects (text, pattern, pattern, ...)")
        val pats = children.tail.map {
          case org.apache.spark.sql.catalyst.expressions.Literal(u, _) if u != null =>
            u.toString
          case other => throw new IllegalArgumentException(
            s"multi_pattern_count patterns must be non-null string literals, got $other")
        }
        MultiPatternCount(children.head, pats)
      }))
    // aggregate: the analyzer wraps a resolved AggregateFunction in an
    // AggregateExpression, so the plain-expression builder suffices
    ext.injectFunction((
      new FunctionIdentifier("array_sum_fp"),
      new ExpressionInfo(classOf[ArraySumFp].getName, "array_sum_fp"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "array_sum_fp expects exactly 1 argument")
        ArraySumFp(children.head)
      }))
    ext.injectOptimizerRule(_ => RewriteSortedIntersectCount)
  }
}
