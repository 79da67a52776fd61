package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MinHashSigSpec extends SparkSpec {
  import sqlImplicits._

  test("matches the per-seed xxhash64 HOF minima exactly") {
    val rnd = new scala.util.Random(41)
    val df = (1 to 200).map(_ =>
      Array.fill(rnd.nextInt(60) + 1)(rnd.nextLong())).toDF("sh")
    val n = 16
    val hof = array((0 until n).map(j =>
      array_min(transform(col("sh"), s => xxhash64(lit(j), s)))): _*)
    val rows = df.select(MinHashSig.of(col("sh"), n).as("fast"),
      hof.as("slow")).as[(Seq[Long], Seq[Long])].collect()
    assert(rows.forall { case (f, s) => f == s })
  }

  test("empty array yields MaxValue sentinels; null yields null") {
    val df = Seq(Some(Array.empty[Long]), None).toDF("sh")
    val rows = df.select(MinHashSig.of(col("sh"), 4)).collect()
    assert(rows.exists(r => !r.isNullAt(0) &&
      r.getSeq[Long](0) == Seq.fill(4)(Long.MaxValue)))
    assert(rows.exists(_.isNullAt(0)))
  }
}
