package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkSpec {
  import sqlImplicits._

  test("bounded_top_k callable from SQL after extension injection") {
    // injectFunction path, applied to the live session's registry
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // register directly (same builder the extension injects)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bounded_top_k",
      exprs => graft.expressions.BoundedTopK(exprs(0), exprs(1),
        exprs(2).eval().asInstanceOf[Int]),
      "scala_udf")
    Seq(("g", 0.9, 1L), ("g", 0.5, 2L), ("g", 0.7, 3L))
      .toDF("g", "cos", "id").createOrReplaceTempView("scored")
    val out = spark.sql(
      "SELECT g, bounded_top_k(cos, id, 2) AS t FROM scored GROUP BY g")
      .select(explode(col("t")).as("e")).select("e.id")
      .as[Long].collect().toSeq
    assert(out == Seq(1L, 3L))
  }

  test("sorted_intersect_size callable from SQL") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_size",
      exprs => graft.expressions.SortedIntersectSize(exprs(0), exprs(1)),
      "scala_udf")
    val n = spark.sql(
      "SELECT sorted_intersect_size(array(1L, 2L, 3L), array(2L, 3L, 9L))")
      .head().getInt(0)
    assert(n == 2)
  }
}
