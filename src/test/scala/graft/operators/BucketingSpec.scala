package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import sqlImplicits._

  test("same-key bucketed join plans without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS graft_fact_b")
    spark.sql("DROP TABLE IF EXISTS graft_dim_b")
    val fact = (1 to 1000).map(i => (i.toLong % 100, s"f$i")).toDF("k", "fv")
    val dim = (0L until 100L).map(i => (i, s"d$i")).toDF("dk", "dv")
    Bucketing.writeBucketed(fact, "graft_fact_b", Seq("k"), 4)
    Bucketing.writeBucketed(dim, "graft_dim_b", Seq("dk"), 4)
    val joined = Bucketing.bucketedJoin(spark, "graft_fact_b", "graft_dim_b",
      Seq("k" -> "dk"))
    assert(joined.count() == 1000)
    assert(!Bucketing.hasShuffle(joined), "bucketed join must not shuffle")
    // contrast: the same join over plain (unbucketed) frames shuffles
    // (disable auto-broadcast so the small dim doesn't mask the shuffle)
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plain = fact.join(dim, fact("k") === dim("dk"))
      plain.count()
      assert(Bucketing.hasShuffle(plain))
    }
  }

  private def withSQLConf(kv: (String, String)*)(f: => Unit): Unit = {
    val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed aggregation on the bucket key avoids the shuffle") {
    val agg = spark.table("graft_fact_b").groupBy("k")
      .agg(count(lit(1)).as("n"))
    agg.count()
    assert(!Bucketing.hasShuffle(agg))
  }

  test("hasShuffle sees range shuffles and ignores broadcasts") {
    val df = spark.range(1000).toDF("id")
    // orderBy on a DERIVED column (range is already ordered by id,
    // so orderBy("id") is eliminated) plans Exchange
    // rangepartitioning — the flavor the old hashpartitioning-only
    // check missed
    val sorted = df.withColumn("m", col("id") % 7).orderBy("m")
    sorted.count()
    assert(Bucketing.hasShuffle(sorted))
    // a broadcast join has a BroadcastExchange but NO shuffle
    val small = spark.range(10).toDF("id")
    val bj = df.join(org.apache.spark.sql.functions.broadcast(small), "id")
    bj.count()
    assert(!Bucketing.hasShuffle(bj))
  }
}
