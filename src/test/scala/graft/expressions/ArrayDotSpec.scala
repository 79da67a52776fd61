package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ArrayDotSpec extends SparkSpec {
  import sqlImplicits._

  test("matches the HOF fold bit-for-bit on random float vectors") {
    val rnd = new scala.util.Random(17)
    val df = (1 to 500).map(_ =>
      (Array.fill(64)(rnd.nextFloat() * 2 - 1),
        Array.fill(64)(rnd.nextFloat() * 2 - 1))).toDF("a", "b")
    val hof = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val rows = df.select(ArrayDot.dot(col("a"), col("b")).as("fast"),
      hof.as("slow")).as[(Double, Double)].collect()
    assert(rows.forall { case (f, s) => f == s }) // exact, not approx
  }

  test("mixed float/double element types; length mismatch is null") {
    val ok = Seq((Array(1.0f, 2.0f), Array(2.0, 4.0))).toDF("a", "b")
      .select(ArrayDot.dot(col("a"), col("b")).as("d")).as[Double].head()
    assert(ok == 10.0) // float widens exactly: 1*2 + 2*4
    // mismatched lengths: null, matching the HOF zip_with-pad
    // semantics (a truncated dot must never masquerade as a score)
    val mm = Seq((Array(1.0f, 2.0f, 3.0f), Array(2.0, 4.0))).toDF("a", "b")
    assert(mm.select(ArrayDot.dot(col("a"), col("b"))).head().isNullAt(0))
  }

  test("null array gives null") {
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    assert(df.select(ArrayDot.dot(col("a"), col("b"))).head().isNullAt(0))
  }

  test("null element poisons the dot to null, matching the HOF sum") {
    // containsNull=true element type (the from_json/parquet default):
    // zip_with's null product nulls the whole aggregate, so ArrayDot
    // must return null too — not silently read the slot as 0.0
    val df = Seq(
      (1, Seq(Option(1.0f), None, Option(3.0f)),
        Seq(Option(4.0f), Option(5.0f), Option(6.0f))),
      (2, Seq(Option(1.0f), Option(2.0f), Option(3.0f)),
        Seq(Option(4.0f), Option(5.0f), Option(6.0f))))
      .toDF("id", "a", "b")
    val rows = df.select(col("id"), ArrayDot.dot(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    assert(rows(0).isNullAt(1))
    assert(rows(1).getDouble(1) == 32.0)
  }
}
