package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BoundedTopKSpec extends SparkSpec {
  import sqlImplicits._

  test("heap keeps exact top-k with (score desc, id asc) ties") {
    val buf = new TopKBuffer(3)
    Seq((0.5, 10L), (0.9, 4L), (0.9, 2L), (0.1, 1L), (0.7, 9L))
      .foreach { case (s, i) => buf.insert(s, i) }
    assert(buf.sortedDesc.toSeq == Seq((0.9, 2L), (0.9, 4L), (0.7, 9L)))
  }

  test("serialize roundtrip preserves contents") {
    val buf = new TopKBuffer(4)
    (1 to 10).foreach(i => buf.insert(i * 0.1, i.toLong))
    val back = TopKBuffer.fromBytes(buf.toBytes)
    assert(back.sortedDesc.toSeq == buf.sortedDesc.toSeq)
  }

  test("aggregate matches window row_number result on random data") {
    val rnd = new scala.util.Random(42)
    val df = (1 to 5000).map(i =>
      (s"g${i % 7}", rnd.nextDouble(), i.toLong))
      .toDF("g", "cos", "neighbor_id")
    val viaAgg = df.groupBy("g")
      .agg(BoundedTopK.boundedTopK(col("cos"), col("neighbor_id"), 5).as("t"))
      .select(col("g"), explode(col("t")).as("e"))
      .select(col("g"), col("e.score"), col("e.id"))
      .orderBy("g", "id").as[(String, Double, Long)].collect().toSeq
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("g"), col("cos"), col("neighbor_id"))
      .orderBy("g", "neighbor_id").as[(String, Double, Long)].collect().toSeq
    assert(viaAgg == viaWindow)
  }

  test("ignores null scores") {
    val df = Seq((Some(0.5), 1L), (None, 2L), (Some(0.9), 3L))
      .toDF("cos", "neighbor_id")
    val out = df.agg(
      BoundedTopK.boundedTopK(col("cos"), col("neighbor_id"), 10).as("t"))
      .select(size(col("t"))).as[Int].head()
    assert(out == 2)
  }
}
