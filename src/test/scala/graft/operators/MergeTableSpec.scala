package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class MergeTableSpec extends SparkSpec {
  import sqlImplicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_mt").toString + "/t"

  private def rows(df: DataFrame): Set[(Long, String, Double)] =
    df.select(col("k").cast("long"), col("s"), col("v").cast("double"))
      .as[(Long, String, Double)].collect().toSet

  test("multi-batch merge equals the sequentially replayed reference") {
    val dir = freshDir()
    // batch 1: initial load
    val b1 = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0),
      (4L, "d", 4.0)).toDF("k", "s", "v")
    val r1 = MergeTable.merge(spark, dir, b1, Seq("k"), nBuckets = 4)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(r1._1 == 1L && r1._2 == 4L && r1._3 == 0L)
    assert(rows(MergeTable.snapshot(spark, dir)) ==
      Set((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0), (4L, "d", 4.0)))

    // batch 2: replace k=2, insert k=5, delete k=3, delete absent k=9
    val b2 = Seq((2L, "B", 20.0, false), (5L, "e", 5.0, false),
      (3L, "", 0.0, true), (9L, "", 0.0, true))
      .toDF("k", "s", "v", "del")
    val r2 = MergeTable.merge(spark, dir, b2, Seq("k"), nBuckets = 4,
      deleteCol = Some("del")).as[(Long, Long, Long, Long, Long)].head()
    assert(r2._1 == 2L && r2._2 == 2L && r2._3 == 2L)
    assert(rows(MergeTable.snapshot(spark, dir)) ==
      Set((1L, "a", 1.0), (2L, "B", 20.0), (4L, "d", 4.0), (5L, "e", 5.0)))

    // batch 3: replace the replaced (k=2 again), delete k=1
    val b3 = Seq((2L, "BB", 200.0, false), (1L, "", 0.0, true))
      .toDF("k", "s", "v", "del")
    MergeTable.merge(spark, dir, b3, Seq("k"), nBuckets = 4,
      deleteCol = Some("del"))
    assert(rows(MergeTable.snapshot(spark, dir)) ==
      Set((2L, "BB", 200.0), (4L, "d", 4.0), (5L, "e", 5.0)))
  }

  test("untouched buckets carry their pointers — zero rewrite") {
    val dir = freshDir()
    // many buckets so batch 2's single key touches a strict subset
    val b1 = (1L to 40L).map(i => (i, s"s$i", i.toDouble))
      .toDF("k", "s", "v")
    MergeTable.merge(spark, dir, b1, Seq("k"), nBuckets = 16)
    MergeTable.merge(spark, dir,
      Seq((1L, "X", -1.0)).toDF("k", "s", "v"), Seq("k"), nBuckets = 16)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // v2's data dir holds ONLY the touched bucket
    val v2Buckets = fs.globStatus(
      new org.apache.hadoop.fs.Path(s"$dir/data/v2/kb=*"))
    assert(v2Buckets.length == 1, "one touched bucket must rewrite")
    // the manifest mixes v1 (untouched) and v2 (touched) pointers
    val ptrs = spark.read.parquet(s"$dir/manifest/v2")
      .select(col("kb").cast("int"), col("version").cast("long"))
      .as[(Int, Long)].collect().toMap
    assert(ptrs.values.toSet == Set(1L, 2L))
    assert(ptrs.values.count(_ == 2L) == 1)
    // and the snapshot is still the full merged table
    assert(rows(MergeTable.snapshot(spark, dir)).size == 40)
    assert(rows(MergeTable.snapshot(spark, dir))
      .contains((1L, "X", -1.0)))
  }

  test("crash window: orphan data past the committed manifest is " +
    "invisible to readers and swept by the next merge") {
    val dir = freshDir()
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    MergeTable.merge(spark, dir,
      Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "s", "v"),
      Seq("k"), nBuckets = 4)
    val b2 = Seq((2L, "B", 20.0), (3L, "c", 3.0)).toDF("k", "s", "v")
    MergeTable.merge(spark, dir, b2, Seq("k"), nBuckets = 4)
    // simulate the crash between the data write and the manifest
    // rename: v2's data is durable, its commit is gone (plus a stale
    // manifest temp left behind)
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$dir/manifest/v2"), true))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/manifest_tmp_2"))
    // readers resolve the last COMMITTED version: batch 1's state
    assert(rows(MergeTable.snapshot(spark, dir)) ==
      Set((1L, "a", 1.0), (2L, "b", 2.0)))
    // re-applying the batch self-heals: orphan swept, result exact
    MergeTable.merge(spark, dir, b2, Seq("k"), nBuckets = 4)
    assert(rows(MergeTable.snapshot(spark, dir)) ==
      Set((1L, "a", 1.0), (2L, "B", 20.0), (3L, "c", 3.0)))
    // no duplicate rows anywhere (the torn-write failure mode)
    val snap = MergeTable.snapshot(spark, dir)
    assert(snap.count() == snap.select("k").distinct().count())
  }

  test("a fully-deleted bucket leaves the pointer map") {
    val dir = freshDir()
    // nBuckets = 1: everything in one bucket, then delete everything
    MergeTable.merge(spark, dir,
      Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "s", "v"),
      Seq("k"), nBuckets = 1)
    MergeTable.merge(spark, dir,
      Seq((1L, "", 0.0, true), (2L, "", 0.0, true))
        .toDF("k", "s", "v", "del"),
      Seq("k"), nBuckets = 1, deleteCol = Some("del"))
    val ptrs = spark.read.parquet(s"$dir/manifest/v2")
    assert(ptrs.count() == 0L, "deleted bucket must leave the manifest")
    assert(MergeTable.snapshot(spark, dir).count() == 0L)
  }

  test("duplicate delta keys fail LOUD with the measured count") {
    val dir = freshDir()
    val dup = Seq((1L, "a", 1.0), (1L, "b", 2.0), (2L, "c", 3.0))
      .toDF("k", "s", "v")
    val e = intercept[IllegalArgumentException] {
      MergeTable.merge(spark, dir, dup, Seq("k"), nBuckets = 4)
    }
    assert(e.getMessage.contains("1 duplicate key"))
  }

  test("compact folds fragmented buckets through the commit path; " +
    "contents identical, compact-clean buckets untouched") {
    val dir = freshDir()
    // three merges, all landing in the same single bucket → the
    // bucket's current version dir has several files only if one
    // merge wrote several; instead fragment by writing a multi-part
    // batch: repartition(3) → 3 files in the bucket dir
    val b1 = (1L to 30L).map(i => (i, s"s$i", i.toDouble))
      .toDF("k", "s", "v").repartition(3)
    MergeTable.merge(spark, dir, b1, Seq("k"), nBuckets = 2)
    val before = rows(MergeTable.snapshot(spark, dir))
    val report = MergeTable.compact(spark, dir, targetBytes = 1L << 30)
      .select(col("kb").cast("int"), col("files_before").cast("long"),
        col("files_after").cast("long"), col("rewritten"))
      .as[(Int, Long, Long, Boolean)].collect()
    // every fragmented bucket collapsed to one file
    assert(report.nonEmpty)
    report.foreach { case (b, nf, na, rw) =>
      if (nf > 1) assert(rw && na == 1L, s"bucket $b")
      else assert(!rw && na == nf, s"bucket $b")
    }
    assert(rows(MergeTable.snapshot(spark, dir)) == before)
    // a second compact is a no-op: nothing is fragmented any more
    val again = MergeTable.compact(spark, dir, targetBytes = 1L << 30)
    assert(again.filter(col("rewritten")).count() == 0L)
  }

  test("vacuum reclaims unreferenced versions; snapshot unaffected") {
    val dir = freshDir()
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    MergeTable.merge(spark, dir,
      Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "s", "v"),
      Seq("k"), nBuckets = 1)
    // rewrite the only bucket twice: v1 and v2 become dead
    MergeTable.merge(spark, dir,
      Seq((1L, "A", 10.0)).toDF("k", "s", "v"), Seq("k"), nBuckets = 1)
    MergeTable.merge(spark, dir,
      Seq((2L, "BB", 20.0)).toDF("k", "s", "v"), Seq("k"), nBuckets = 1)
    val want = rows(MergeTable.snapshot(spark, dir))
    val dead = MergeTable.vacuum(spark, dir)
    assert(dead == Seq(1L, 2L))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/data/v1")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/data/v2")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/data/v3")))
    assert(rows(MergeTable.snapshot(spark, dir)) == want)
  }
}
