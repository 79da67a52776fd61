package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpec {
  import sqlImplicits._

  test("tfIdfTopTerms ranks by tf desc then rarity then token") {
    val df = Seq(
      (1L, "x x x y z"), // tf: x=3, y=1, z=1
      (2L, "y y z w w w w")) // tf: w=4, y=2, z=1
      .toDF("doc_id", "text")
    val out = Corpus.tfIdfTopTerms(df, 2)
      .as[(Long, Int, String, Long, Long)].collect().toSet
    // df: x=1 y=2 z=2 w=1; doc1 top2 = x(3), then y/z tie tf=1 df=2 → y
    // doc2 top2 = w(4), y(2)
    assert(out == Set(
      (1L, 1, "x", 3L, 1L), (1L, 2, "y", 1L, 2L),
      (2L, 1, "w", 4L, 1L), (2L, 2, "y", 2L, 2L)))
  }

  test("bigramCounts counts adjacent pairs, short docs drop out") {
    val df = Seq("a b a b", "a b", "solo").toDF("text")
    val out = Corpus.bigramCounts(df).as[(String, Long)].collect().toMap
    assert(out == Map("a b" -> 3L, "b a" -> 1L))
  }

  test("partitioned write + filtered read prunes partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val df = Seq((1L, "en"), (2L, "de"), (3L, "en")).toDF("id", "lang")
    df.write.mode("overwrite").partitionBy("lang").parquet(dir)
    val back = spark.read.parquet(dir).filter(col("lang") === "en")
    assert(back.count() == 2)
    // partition pruning happens at planning: the scan's partition
    // filters carry the lang predicate, no data filter needed
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"))
  }
}
