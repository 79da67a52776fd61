package graft.plans

import graft.expressions.{ArrayDot, BoundedTopK, MinHashSig, SortedIntersectSize}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Spark session extension: registers graft's custom expressions so
  * plain `spark.sql` users can call them.
  *
  * Usage: `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * or `SparkSession.builder.withExtensions(new GraftExtensions()(_))`.
  *
  *   SELECT probe_id, bounded_top_k(cos, neighbor_id, 5) FROM scored
  *   GROUP BY probe_id
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // HOF dot-product pattern -> codegen'd ArrayDot (semantics-equal;
    // see DotProductRewrite). Users writing the portable SQL spelling
    // get the native expression for free.
    ext.injectOptimizerRule(_ => DotProductRewrite)
  }
}

object GraftExtensions {

  /** The registrations, exposed so tests exercise the EXACT builder
    * lambdas (argument-shape matches included) that production
    * sessions get via injectFunction. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
    Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("bounded_top_k"),
      new ExpressionInfo(classOf[BoundedTopK].getName, "bounded_top_k"),
      (args: Seq[Expression]) => args match {
        case Seq(score, id, Literal(k: Int, _)) => BoundedTopK(score, id, k)
        case _ => throw new IllegalArgumentException(
          "bounded_top_k(score double, id bigint, k int-literal)")
      }),
    (new FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => ArrayDot(a, b)
        case _ => throw new IllegalArgumentException(
          "array_dot(array<float|double>, array<float|double>)")
      }),
    (new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_signature"),
      (args: Seq[Expression]) => args match {
        case Seq(sh, Literal(n: Int, _)) => MinHashSig(sh, n)
        case _ => throw new IllegalArgumentException(
          "minhash_signature(array<bigint>, numHashes int-literal)")
      }),
    (new FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName,
        "sorted_intersect_size"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => SortedIntersectSize(a, b)
        case _ => throw new IllegalArgumentException(
          "sorted_intersect_size(array<bigint> sorted-distinct, array<bigint> sorted-distinct)")
      }))
}
