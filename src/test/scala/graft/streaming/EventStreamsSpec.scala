package graft.streaming

import graft.SparkSpec
import graft.operators.TimeOps
import org.apache.spark.sql.functions._
import java.nio.file.Files

class EventStreamsSpec extends SparkSpec {
  import sqlImplicits._

  test("streaming windowedCounts equals the batch tumbling agg") {
    val dir = Files.createTempDirectory("graft_stream").toString
    Seq(
      ("2024-01-01 00:01:00", "click", 1.0),
      ("2024-01-01 00:05:00", "click", 2.0),
      ("2024-01-01 00:20:00", "view", 3.5)
    ).toDF("s", "event_type", "value")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

    val streamed = EventStreams.windowedCounts(spark, s"$dir/events.parquet",
      fileGlob = "*.parquet", queryName = "graft_test_stream")
      .orderBy("window_start_us", "event_type")
      .as[(Long, String, Long, Double)].collect().toSeq
    val batch = TimeOps.tumblingAgg(
      spark.read.parquet(s"$dir/events.parquet"), "ts", Seq("event_type"),
      "value", 900L * 1000000L)
      .select(col("window_start_us"), col("event_type"), col("n"),
        col("sum_value"))
      .orderBy("window_start_us", "event_type")
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(streamed == batch)
    assert(streamed.size == 2)
  }

  test("streamStaticJoin enriches the stream, keeps dimension misses") {
    val dir = Files.createTempDirectory("graft_ssj").toString
    Seq(
      ("2024-01-01 00:01:00", 1L, 10.0),
      ("2024-01-01 00:05:00", 2L, 20.0),
      ("2024-01-01 00:05:30", 9L, 40.0) // no customer row → 'unknown'
    ).toDF("s", "user_id", "value")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    Seq((1L, "AUTO"), (2L, "AUTO"), (3L, "HOUSE"))
      .toDF("c_custkey", "c_mktsegment")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val out = EventStreams.streamStaticJoin(spark, s"$dir/events.parquet",
      fileGlob = "*.parquet", queryName = "graft_test_ssj", dimDir = dir)
      .orderBy("window_start_us", "segment")
      .as[(Long, String, Long, Double)].collect().toSeq
    def us(t: String) = java.sql.Timestamp.valueOf(t).getTime * 1000
    assert(out == Seq(
      (us("2024-01-01 00:00:00"), "AUTO", 2L, 30.0),
      (us("2024-01-01 00:00:00"), "unknown", 1L, 40.0)))
  }

  test("streamUpsertToTable merges keep-latest across micro-batches") {
    val dir = Files.createTempDirectory("graft_upsert").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    def write(name: String, rows: Seq[(Long, String, Long, Double)]): Unit = {
      val staging = s"$dir/staging_$name"
      rows.toDF("user_id", "s", "event_id", "value")
        .withColumn("ts", to_timestamp(col("s"))).drop("s")
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/in/$name"))
    }
    // generation 1: users 1, 2; generation 2 updates user 1, adds 3
    write("a.parquet", Seq(
      (1L, "2024-01-01 00:01:00", 10L, 1.0),
      (2L, "2024-01-01 00:02:00", 11L, 2.0)))
    write("b.parquet", Seq(
      (1L, "2024-01-01 00:09:00", 12L, 9.0),
      (3L, "2024-01-01 00:03:00", 13L, 3.0)))
    val out = EventStreams.streamUpsertToTable(spark, s"$dir/in",
      s"$dir/table", s"$dir/ckpt", fileGlob = "*",
      maxFilesPerTrigger = Some(1))
      .orderBy("user_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    def us(t: String) = java.sql.Timestamp.valueOf(t).getTime * 1000
    assert(out == Seq(
      (1L, 12L, us("2024-01-01 00:09:00"), 9.0), // updated by gen 2
      (2L, 11L, us("2024-01-01 00:02:00"), 2.0),
      (3L, 13L, us("2024-01-01 00:03:00"), 3.0)))
    // the atomic-swap scaffolding must clean up after itself: only
    // the live table remains, no .tmp-N / .prev leftovers
    val leftovers = new java.io.File(dir).listFiles()
      .map(_.getName).filter(n => n.contains(".tmp-") || n.endsWith(".prev"))
    assert(leftovers.isEmpty, s"swap leftovers: ${leftovers.mkString(",")}")
  }

  test("streamMergeToTable: keep-latest across OUT-OF-ORDER " +
    "micro-batches, bucket-incremental commits") {
    val dir = Files.createTempDirectory("graft_smerge").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    def write(name: String, rows: Seq[(Long, String, Long, Double)]): Unit = {
      val staging = s"$dir/staging_$name"
      rows.toDF("user_id", "s", "event_id", "value")
        .withColumn("ts", to_timestamp(col("s"))).drop("s")
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/in/$name"))
    }
    // batch 2 carries an OLDER event for user 1 (file order is not
    // ts order): the stored newer row must win over the replay
    write("a.parquet", Seq(
      (1L, "2024-01-01 00:09:00", 12L, 9.0),
      (2L, "2024-01-01 00:02:00", 11L, 2.0)))
    write("b.parquet", Seq(
      (1L, "2024-01-01 00:01:00", 10L, 1.0), // older: must lose
      (3L, "2024-01-01 00:03:00", 13L, 3.0)))
    val out = EventStreams.streamMergeToTable(spark, s"$dir/in",
      s"$dir/table", s"$dir/ckpt", fileGlob = "*",
      maxFilesPerTrigger = Some(1))
      .orderBy("user_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    def us(t: String) = java.sql.Timestamp.valueOf(t).getTime * 1000
    assert(out == Seq(
      (1L, 12L, us("2024-01-01 00:09:00"), 9.0), // newer row survived
      (2L, 11L, us("2024-01-01 00:02:00"), 2.0),
      (3L, 13L, us("2024-01-01 00:03:00"), 3.0)))
    // bucket-incremental: version 2's data dir holds only the
    // buckets batch 2 touched (users 1, 3), never a full rewrite
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v2 = fs.globStatus(
      new org.apache.hadoop.fs.Path(s"$dir/table/data/v2/kb=*"))
      .map(_.getPath.getName).toSet
    val allLive = fs.globStatus(
      new org.apache.hadoop.fs.Path(s"$dir/table/data/v*/kb=*"))
      .map(_.getPath.getName).toSet
    assert(v2.size < allLive.size,
      s"batch 2 rewrote every bucket: $v2 of $allLive")
    // batch replay is idempotent in effect: re-merging batch b's
    // winners against the merged table changes nothing
    val before = graft.operators.MergeTable.snapshot(spark, s"$dir/table")
      .select("user_id", "event_id", "value")
      .as[(Long, Long, Double)].collect().toSet
    val replay = Seq((1L, "2024-01-01 00:01:00", 10L, 1.0),
      (3L, "2024-01-01 00:03:00", 13L, 3.0))
      .toDF("user_id", "s", "event_id", "value")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
    val kb = pmod(xxhash64(col("user_id")), lit(16L)).cast("int")
    val touched = replay.select(kb.as("k")).distinct()
      .as[Int].collect().toSet
    val cur = graft.operators.MergeTable.snapshot(spark, s"$dir/table")
      .filter(col("kb").isin(touched.toSeq: _*))
      .select("user_id", "ts", "event_id", "value")
    val winners = cur.unionByName(replay)
      .groupBy("user_id")
      .agg(max(struct(col("ts"), col("event_id"), col("value"))).as("m"))
      .select(col("user_id"), col("m.ts").as("ts"),
        col("m.event_id").as("event_id"), col("m.value").as("value"))
    graft.operators.MergeTable.merge(spark, s"$dir/table", winners,
      Seq("user_id"), 16)
    val after = graft.operators.MergeTable.snapshot(spark, s"$dir/table")
      .select("user_id", "event_id", "value")
      .as[(Long, Long, Double)].collect().toSet
    assert(after == before, "replay changed the table")
  }

  test("streamingDedup drops within-watermark duplicate keys") {
    val dir = Files.createTempDirectory("graft_dedup").toString
    Seq(
      (1L, "2024-01-01 00:01:00", "a"),
      (1L, "2024-01-01 00:02:00", "b"), // dup key within watermark
      (2L, "2024-01-01 00:03:00", "c")
    ).toDF("k", "s", "v")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventStreams.streamingDedup(spark, s"$dir/events.parquet",
      Seq("k"), fileGlob = "*.parquet", queryName = "graft_dedup_test")
    assert(out.count() == 2)
    assert(out.select("k").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("streamingDedup runs identically on the RocksDB state backend") {
    val dir = Files.createTempDirectory("graft_rocks").toString
    Seq(
      (1L, "2024-01-01 00:01:00", "a"),
      (1L, "2024-01-01 00:02:00", "b"),
      (3L, "2024-01-01 00:04:00", "d")
    ).toDF("k", "s", "v")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventStreams.withRocksDbState(spark) {
      EventStreams.streamingDedup(spark, s"$dir/events.parquet",
        Seq("k"), fileGlob = "*.parquet", queryName = "graft_rocks_test")
        .collect()
    }
    assert(out.length == 2)
    // provider conf restored after the scoped run (getOption surfaces
    // the session default — the HDFS-backed provider — not None)
    assert(!spark.conf.get(
      "spark.sql.streaming.stateStore.providerClass").contains("RocksDB"))
  }

  test("stream-stream interval join matches the batch equivalent") {
    val dir = Files.createTempDirectory("graft_ssj").toString
    val events = Seq(
      (1L, "2024-01-01 00:00:00", "error", 10L),
      (2L, "2024-01-01 00:05:00", "click", 10L), // joins err 1 (5 min)
      (3L, "2024-01-01 00:20:00", "click", 10L), // err 1 too old (20 min)
      (4L, "2024-01-01 00:04:00", "click", 99L)) // other user: no error
      .map { case (id, s, t, u) => (id, s, t, u, 1.0, "{}") }
      .toDF("event_id", "s", "event_type", "user_id", "value", "props")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
    events.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val out = EventStreams.streamStreamJoin(spark, s"$dir/events.parquet",
        fileGlob = "*.parquet", queryName = "graft_ssj_test")
      .select("click_id", "err_id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((2L, 1L)))
  }

  test("append-mode file sink emits watermark-passed windows only") {
    val dir = Files.createTempDirectory("graft_stream2").toString
    // two windows 3 hours apart; 1h watermark ends at 02:00, so the
    // 00:00-block windows are closed and emitted, the 03:00 one is
    // withheld (correct append semantics on a finite run)
    Seq(
      ("2024-01-01 00:01:00", "click", 1.0),
      ("2024-01-01 00:05:00", "click", 2.0),
      ("2024-01-01 03:00:00", "view", 3.5)
    ).toDF("s", "event_type", "value")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    EventStreams.windowedCountsToFiles(spark, s"$dir/events.parquet",
      s"$dir/out", s"$dir/ckpt", fileGlob = "*.parquet")
    val out = spark.read.parquet(s"$dir/out")
      .select("event_type", "n", "sum_value")
      .as[(String, Long, Double)].collect().toSeq
    assert(out == Seq(("click", 2L, 3.0)))
  }
  test("streamLangId equals the batch transform bit-for-bit") {
    import sqlImplicits._
    val docs = Seq((10L, "qq", "qqq qqkk kqqk"), (11L, "qq", "kkqq qqq"),
      (20L, "aa", "aaa aab bba"), (21L, "aa", "bab aab"),
      (30L, "aa", "qqqq kkqq"), (40L, "aa", "x")) // model flips 30; 40 drops
      .toDF("doc_id", "lang", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_stream_langid").toString
    docs.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val m = graft.operators.Corpus.fitLangIdModel(docs)
    val streamed = EventStreams.streamLangId(spark,
      s"$dir/documents.parquet", m, fileGlob = "*.parquet")
      .as[(Long, String, String, Long)].collect().toSet
    val batch = graft.operators.Corpus.applyLangIdModel(docs, m)
      .as[(Long, String, String, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.map(_._1) == Set(10L, 11L, 20L, 21L, 30L))
    assert(streamed.find(_._1 == 30L).get._3 == "qq") // text wins
  }

  test("streamLangId file sink equals the memory sink and resumes " +
      "from its checkpoint") {
    import sqlImplicits._
    val docs = Seq((10L, "qq", "qqq qqkk kqqk"), (11L, "qq", "kkqq qqq"),
      (20L, "aa", "aaa aab bba"), (21L, "aa", "bab aab"))
      .toDF("doc_id", "lang", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_stream_langid_fs").toString
    // land each batch as ONE parquet FILE (the file stream ignores
    // non-partition subdirectories)
    def land(df: org.apache.spark.sql.DataFrame, dest: String): Unit = {
      val tmp = dest + ".tmpdir"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        new java.io.File(dest).toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
    new java.io.File(s"$dir/docs").mkdirs()
    land(docs.where($"doc_id" < 20), s"$dir/docs/a.parquet")
    land(docs.where($"doc_id" >= 20), s"$dir/docs/b.parquet")
    val m = graft.operators.Corpus.fitLangIdModel(docs)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "lang", "lang_pred", "score_fp")
      .as[(Long, String, String, Long)].collect().toSet
    val mem = rows(EventStreams.streamLangId(spark, s"$dir/docs", m,
      fileGlob = "*.parquet"))
    val file = rows(EventStreams.streamLangId(spark, s"$dir/docs", m,
      fileGlob = "*.parquet", sinkDir = Some(s"$dir/out"),
      checkpointDir = Some(s"$dir/ckpt")))
    assert(file == mem)
    // production resume: a new file lands, the SAME dirs score only
    // it — prior output files stay, rows accumulate exactly once
    val late = Seq((30L, "aa", "aaa bba")).toDF("doc_id", "lang", "text")
    land(late, s"$dir/docs/c.parquet")
    val resumed = rows(EventStreams.streamLangId(spark, s"$dir/docs", m,
      fileGlob = "*.parquet", sinkDir = Some(s"$dir/out"),
      checkpointDir = Some(s"$dir/ckpt")))
    assert(resumed == rows(
      graft.operators.Corpus.applyLangIdModel(docs.unionByName(late), m)))
  }

  test("streamDrift: per-batch rows equal the batch form; resume " +
      "scores only the new file") {
    import sqlImplicits._
    val sumCols = Seq("n_a", "n_b", "vocab_a", "vocab_b",
      "vocab_shared", "tv_fp", "oov_a_fp", "oov_b_fp")
    def vals(df: org.apache.spark.sql.DataFrame) =
      df.select(sumCols.map(col): _*).collect().map(_.toSeq).toSet
    val ref = Seq((1L, "x x y"), (2L, "x w")).toDF("doc_id", "text")
    val f1 = Seq((10L, "x x z")).toDF("doc_id", "text")
    val f2 = Seq((11L, "y y q q")).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_stream_drift").toString
    def land(df: org.apache.spark.sql.DataFrame, dest: String): Unit = {
      val tmp = dest + ".tmpdir"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        new java.io.File(dest).toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
    new java.io.File(s"$dir/docs").mkdirs()
    land(f1, s"$dir/docs/a.parquet")
    land(f2, s"$dir/docs/b.parquet")
    graft.operators.Corpus.saveDriftModel(
      graft.operators.Corpus.fitDriftModel(ref), s"$dir/model")
    val model = graft.operators.Corpus.loadDriftModel(spark, s"$dir/model")
    // one file per micro-batch: each row must equal the BATCH form
    // over that file alone (fit/apply ≡ corpusDivergence spec rides
    // driftAgainstModel's own contract)
    val streamed = EventStreams.streamDrift(spark, s"$dir/docs", model,
      s"$dir/out", s"$dir/ckpt", maxFilesPerTrigger = Some(1),
      reset = true)
    assert(vals(streamed) == vals(
      graft.operators.Corpus.driftAgainstModel(f1, model).union(
        graft.operators.Corpus.driftAgainstModel(f2, model))))
    assert(streamed.select("batch").as[Long].collect().toSet
      == Set(0L, 1L)) // one row per micro-batch
    // apply(fit) ≡ the two-corpus batch divergence, bit-for-bit
    assert(vals(graft.operators.Corpus.driftAgainstModel(f1, model))
      == vals(graft.operators.Corpus.corpusDivergence(f1, ref)))
    // resume: a third file lands; only IT is scored, prior batch
    // dirs stay committed
    val f3 = Seq((12L, "x")).toDF("doc_id", "text")
    land(f3, s"$dir/docs/c.parquet")
    val resumed = EventStreams.streamDrift(spark, s"$dir/docs", model,
      s"$dir/out", s"$dir/ckpt", maxFilesPerTrigger = Some(1))
    assert(resumed.count() == 3)
    assert(vals(resumed) -- vals(streamed) ==
      vals(graft.operators.Corpus.driftAgainstModel(f3, model)))
    // cold-start guards: foreign outDir and orphaned checkpoint fail
    val foreign = s"$dir/foreign"
    new java.io.File(foreign).mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$foreign/somefile"), "x".getBytes)
    intercept[IllegalArgumentException](
      EventStreams.streamDrift(spark, s"$dir/docs", model,
        foreign, s"$dir/ckpt2"))
    intercept[IllegalArgumentException](
      EventStreams.streamDrift(spark, s"$dir/docs", model,
        s"$dir/out_fresh", s"$dir/ckpt"))
    // model loader rejects a double-written (duplicate-term) table
    model.union(model).write.mode("overwrite").parquet(s"$dir/model_dup")
    intercept[IllegalArgumentException](
      graft.operators.Corpus.loadDriftModel(spark, s"$dir/model_dup"))
  }

  test("streamPiiGate: batch-equivalent scrub, exactly-once resume") {
    import sqlImplicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "write to bob@example.com about card 4532015112830366 now"),
      (2L, "order 123456789012345678 from alice@test.org"),
      (3L, "no pii here at all"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_stream_pii").toString
    def land(df: org.apache.spark.sql.DataFrame, dest: String): Unit = {
      val tmp = dest + ".tmpdir"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        new java.io.File(dest).toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
    new java.io.File(s"$dir/docs").mkdirs()
    land(docs.where($"doc_id" <= 2), s"$dir/docs/a.parquet")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "n_emails", "n_longnums", "n_candidates",
        "n_valid_cards", "scrubbed")
      .as[(Long, Long, Long, Long, Long, String)].collect().toSet
    val streamed = rows(EventStreams.streamPiiGate(spark, s"$dir/docs",
      fileGlob = "*.parquet", sinkDir = Some(s"$dir/out"),
      checkpointDir = Some(s"$dir/ckpt")))
    val batch = rows(graft.operators.Corpus.piiProfile(
      docs.where($"doc_id" <= 2)))
    assert(streamed == batch)
    // the valid test PAN checksum-passes; the 18-digit order id fails
    val byId = streamed.map(r => r._1 -> r).toMap
    assert(byId(1L)._5 == 1L && byId(2L)._5 == 0L)
    // nothing card-shaped or email-shaped survives into scrubbed
    assert(streamed.forall { r =>
      !r._6.contains("4532015112830366") && !r._6.contains("@") })
    // resume: only the late file lands new rows, exactly once
    land(docs.where($"doc_id" === 3), s"$dir/docs/b.parquet")
    val resumed = rows(EventStreams.streamPiiGate(spark, s"$dir/docs",
      fileGlob = "*.parquet", sinkDir = Some(s"$dir/out"),
      checkpointDir = Some(s"$dir/ckpt")))
    assert(resumed == rows(graft.operators.Corpus.piiProfile(docs)))
  }
}
