package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SortedIntersectSpec extends SparkSpec {
  import sqlImplicits._

  test("matches array_intersect size on random sorted-distinct sets") {
    val rnd = new scala.util.Random(29)
    val df = (1 to 300).map { _ =>
      def set() = Array.fill(rnd.nextInt(40) + 1)(rnd.nextInt(60).toLong)
        .distinct.sorted
      (set(), set())
    }.toDF("a", "b")
    val rows = df.select(
      SortedIntersect.size(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("slow")).collect()
    assert(rows.forall(r => r.getInt(0) == r.getInt(1)))
  }

  test("jaccard equals intersect-over-union formulation exactly") {
    val df = Seq(
      (Array(1L, 2L, 3L, 4L), Array(2L, 3L, 4L, 5L)),
      (Array(1L, 2L), Array(3L, 4L)),
      (Array(7L), Array(7L))).toDF("a", "b")
    val rows = df.select(
      SortedIntersect.jaccard(col("a"), col("b")).as("fast"),
      (size(array_intersect(col("a"), col("b"))).cast("double") /
        size(array_union(col("a"), col("b")))).as("slow"))
      .as[(Double, Double)].collect()
    assert(rows.forall { case (f, s) => f == s })
  }

  test("empty and null inputs") {
    val df = Seq((Some(Array.empty[Long]), Some(Array(1L, 2L)))).toDF("a", "b")
    assert(df.select(SortedIntersect.size(col("a"), col("b")))
      .head().getInt(0) == 0)
    val nl = Seq((Some(Array(1L)), Option.empty[Array[Long]])).toDF("a", "b")
    assert(nl.select(SortedIntersect.size(col("a"), col("b")))
      .head().isNullAt(0))
  }
}
