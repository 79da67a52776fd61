package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import sqlImplicits._

  test("saltedJoin equals the plain join") {
    val rnd = new scala.util.Random(5)
    val big = (1 to 2000).map(i =>
      (if (i % 10 == 0) "hot" else s"k${rnd.nextInt(50)}", i))
      .toDF("k", "v")
    val small = (Seq("hot") ++ (0 until 50).map(i => s"k$i"))
      .zipWithIndex.toDF("sk", "sv")
    val plain = big.join(small, big("k") === small("sk"))
      .select("k", "v", "sv").orderBy("v")
      .as[(String, Int, Int)].collect().toSeq
    val salted = Skew.saltedJoin(big, small, Seq("k" -> "sk"), buckets = 8)
      .select("k", "v", "sv").orderBy("v")
      .as[(String, Int, Int)].collect().toSeq
    assert(salted == plain)
  }

  test("saltedJoin left keeps unmatched rows") {
    val big = Seq(("a", 1), ("zzz", 2)).toDF("k", "v")
    val small = Seq(("a", 10)).toDF("sk", "sv")
    val out = Skew.saltedJoin(big, small, Seq("k" -> "sk"), 4, "left")
    assert(out.count() == 2)
    assert(out.filter(col("k") === "zzz").select("sv").head().isNullAt(0))
  }

  test("hotKeys finds heavy hitters") {
    val df = (Seq.fill(100)("hot") ++ Seq("a", "b")).toDF("k")
    val hot = Skew.hotKeys(df, Seq("k"), minCount = 50)
    assert(hot.select("k").as[String].collect().toSeq == Seq("hot"))
  }
}
