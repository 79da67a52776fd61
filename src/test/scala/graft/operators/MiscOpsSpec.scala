package graft.operators

import graft.SparkSpec
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

class MiscOpsSpec extends SparkSpec {
  import sqlImplicits._

  test("flattenJson parses fields against schema") {
    val df = Seq((1L, """{"k": 42}"""), (2L, "not json")).toDF("id", "js")
    val out = NestedOps.flattenJson(df, "js",
      StructType(Seq(StructField("k", LongType))))
    val rows = out.orderBy("id").select("k").as[Option[Long]].collect().toSeq
    assert(rows == Seq(Some(42L), None))
  }

  test("flattenStructs flattens recursively with path names") {
    val df = Seq((1, 2, 3, 4)).toDF("a", "b", "c", "d")
      .select(col("a"), struct(col("b"),
        struct(col("c"), col("d")).as("in")).as("s"))
    val out = NestedOps.flattenStructs(df)
    assert(out.columns.toSeq == Seq("a", "s_b", "s_in_c", "s_in_d"))
    assert(out.as[(Int, Int, Int, Int)].head() == ((1, 2, 3, 4)))
  }

  test("windowStartUs integer bucket math") {
    val df = Seq(java.sql.Timestamp.valueOf("2024-01-01 00:20:00"))
      .toDF("ts")
    val us = df.select(TimeOps.windowStartUs(col("ts"), 900L * 1000000L)
      .as("w")).as[Long].head()
    // 00:20 floors to 00:15 bucket
    assert(us == java.sql.Timestamp.valueOf("2024-01-01 00:15:00")
      .getTime * 1000)
  }

  test("tumblingAgg counts and decimal-sums per window+key") {
    val df = Seq(
      ("2024-01-01 00:01:00", "a", 1.5),
      ("2024-01-01 00:14:59", "a", 2.5),
      ("2024-01-01 00:15:00", "a", 4.0)
    ).toDF("s", "k", "v").withColumn("ts", to_timestamp(col("s")))
    val out = TimeOps.tumblingAgg(df, "ts", Seq("k"), "v", 900L * 1000000L)
    val rows = out.orderBy("window_start_us")
      .select("n", "sum_value").as[(Long, Double)].collect().toSeq
    assert(rows == Seq((2L, 4.0), (1L, 4.0)))
  }

  test("slidingAgg: each event lands in width/slide windows") {
    val df = Seq(
      ("2024-01-01 00:05:00", "a", 1.0), // windows 23:45 & 00:00
      ("2024-01-01 00:20:00", "a", 2.0)) // windows 00:00 & 00:15
      .toDF("s", "k", "v").withColumn("ts", to_timestamp(col("s")))
    val out = TimeOps.slidingAgg(df, "ts", Seq("k"), "v",
      1800L * 1000000L, 900L * 1000000L)
      .orderBy("window_start_us")
      .select("window_start_us", "n", "sum_value")
      .as[(Long, Long, Double)].collect().toSeq
    def us(t: String) = java.sql.Timestamp.valueOf(t).getTime * 1000
    assert(out == Seq(
      (us("2023-12-31 23:45:00"), 1L, 1.0),
      (us("2024-01-01 00:00:00"), 2L, 3.0),
      (us("2024-01-01 00:15:00"), 1L, 2.0)))
  }

  test("resizeStub caps the max edge, preserves aspect") {
    val media = Multimodal.asMedia(Seq((1L, "payload")).toDF("id", "text"),
      "text", "image/png")
    val r = media.select(Multimodal.resizeStub(
        Multimodal.decodeImageStub(col("payload")), 512).as("d"))
      .select("d.width", "d.height").head()
    assert(r.getInt(0) <= 512 && r.getInt(1) <= 512)
    assert(r.getInt(0) > 0 && r.getInt(1) > 0)
  }

  test("frameSampleStub explodes strided frame indices") {
    val media = Multimodal.asMedia(Seq((1L, "vid")).toDF("id", "text"),
      "text", "video/mp4")
    val frames = Multimodal.frameSampleStub(media, stride = 10)
      .select("frame_idx").as[Int].collect().toSeq
    assert(frames.nonEmpty && frames.head == 0)
    assert(frames.forall(_ % 10 == 0))
    assert(frames == frames.sorted && frames.distinct == frames)
  }

  test("asMedia + extractFeatures batch plumbing") {
    val df = Seq((1L, "abc"), (2L, "")).toDF("doc_id", "text")
    val out = Multimodal.extractFeatures(
      Multimodal.asMedia(df, "text", "text/plain"))
    val rows = out.orderBy("doc_id")
      .select("feat_len", "feat_checksum").as[(Long, Long)].collect().toSeq
    assert(rows(0)._1 == 3L && rows(1)._1 == 0L)
    // checksum of "abc" utf8: ((97*31)+98)*31+99
    assert(rows(0)._2 == ((97L * 31 + 98) * 31 + 99))
    // metadata struct carries byte count + sha
    val meta = Multimodal.asMedia(df, "text", "text/plain")
      .select(col("media_meta.n_bytes")).as[Long].collect().toSeq
    assert(meta == Seq(3L, 0L))
  }

  test("extractFeatures runs a CUSTOM codec, open() once per partition") {
    val df = Seq.tabulate(8)(i => (i.toLong, s"payload$i"))
      .toDF("doc_id", "text").repartition(3)
    MiscOpsSpec.codecOpens.set(0)
    val fakeImageCodec = Multimodal.BatchCodec(
      features = Seq(
        org.apache.spark.sql.types.StructField("magic",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType, nullable = false)),
      open = () => {
        MiscOpsSpec.codecOpens.incrementAndGet() // the per-partition init
        bytes => Seq[Any](if (bytes.nonEmpty) bytes(0).toInt else -1,
          bytes.length.toLong)
      })
    val out = Multimodal.extractFeatures(
      Multimodal.asMedia(df, "text", "image/fake"), fakeImageCodec)
    val rows = out.select("magic", "n").as[(Int, Long)].collect()
    assert(rows.length == 8 && rows.forall(_._1 == 'p'.toInt))
    // local mode: executor == driver JVM, so the counter observes the
    // per-partition open calls directly
    assert(MiscOpsSpec.codecOpens.get() == 3)
  }
}

object MiscOpsSpec {
  val codecOpens = new java.util.concurrent.atomic.AtomicInteger(0)
}
