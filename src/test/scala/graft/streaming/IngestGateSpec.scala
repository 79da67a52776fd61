package graft.streaming

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

class IngestGateSpec extends SparkSpec {
  import sqlImplicits._

  /** Land `df` as ONE parquet file at `dest` with modification time
    * `mtime` — the file stream processes oldest-first, so distinct
    * mtimes make the batch order deterministic. */
  private def writeOneFile(df: DataFrame, dest: String, mtime: Long): Unit = {
    val tmp = dest + ".tmpdir"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val out = new java.io.File(dest)
    java.nio.file.Files.move(part.toPath, out.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    out.setLastModified(mtime)
    ()
  }

  test("near-dup gate: corpus dups quarantined, admitted docs extend the index") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_gate").toString
    val docsDir = s"$tmp/docs"
    new java.io.File(docsDir).mkdirs()
    def words(p: String) = (0 until 10).map(k => s"${p}_$k").mkString(" ")
    val corpusDocs = Seq(
      (1L, words("c1")), (2L, words("c2")), (3L, words("c3")))
      .toDF("doc_id", "text")
    val novelA = words("a")
    // day 1: 10 near-dups corpus doc 1; 11 is novel; 12 in-batch-dups 11
    val day1 = Seq(
      (10L, words("c1") + " tail10"),
      (11L, novelA),
      (12L, novelA + " tail12")).toDF("doc_id", "text")
    // day 2: 20 near-dups doc 11 — which exists only because day 1
    // ADMITTED it (the accumulated index, not the seed, must catch
    // this); 21 is novel
    val day2 = Seq(
      (20L, novelA + " tail20"),
      (21L, words("b"))).toDF("doc_id", "text")
    val t0 = System.currentTimeMillis() - 60000
    writeOneFile(day1, s"$docsDir/day1.parquet", t0)
    writeOneFile(day2, s"$docsDir/day2.parquet", t0 + 10000)

    val (admitted, quarantine) = IngestGate.nearDupGate(spark, docsDir,
      Dedup.minhashSketch(corpusDocs, numHashes = 16),
      s"$tmp/gate", s"$tmp/ckpt",
      threshold = 0.8, numHashes = 16, bands = 8)

    assert(admitted.select("doc_id").as[Long].collect().sorted.toSeq
      == Seq(11L, 21L))
    val pairs = quarantine.select("new_id", "corpus_id")
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((10L, 1L), (20L, 11L)))
  }

  test("kill-and-restart: a restarted gate resumes the checkpoint and the accumulated index") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_gate_rs").toString
    val docsDir = s"$tmp/docs"
    new java.io.File(docsDir).mkdirs()
    def words(p: String) = (0 until 10).map(k => s"${p}_$k").mkString(" ")
    val corpusDocs = Seq((1L, words("c1"))).toDF("doc_id", "text")
    val seed = Dedup.minhashSketch(corpusDocs, numHashes = 16)
    val novelA = words("a")
    val t0 = System.currentTimeMillis() - 60000
    // run 1: day1 only — 10 dups the seed corpus, 11 is novel
    writeOneFile(Seq((10L, words("c1") + " tail10"), (11L, novelA))
      .toDF("doc_id", "text"), s"$docsDir/day1.parquet", t0)
    IngestGate.nearDupGate(spark, docsDir, seed, s"$tmp/gate", s"$tmp/ckpt",
      threshold = 0.8, numHashes = 16, bands = 8)
    // the gate "dies" (availableNow drained); day2 lands: 20 dups doc
    // 11 — admitted by the PRE-restart run, so only the recovered
    // accumulated index can catch it. The seed argument is an empty
    // frame to prove resume ignores it.
    writeOneFile(Seq((20L, novelA + " tail20"), (21L, words("b")))
      .toDF("doc_id", "text"), s"$docsDir/day2.parquet", t0 + 10000)
    val (admitted, quarantine) = IngestGate.nearDupGate(spark, docsDir,
      seed.limit(0), s"$tmp/gate", s"$tmp/ckpt",
      threshold = 0.8, numHashes = 16, bands = 8)
    // had the checkpoint been wiped, day1 would re-run against an
    // index already containing doc 11 and quarantine 11 against
    // itself — admitted containing 11 proves the resume
    assert(admitted.select("doc_id").as[Long].collect().sorted.toSeq
      == Seq(11L, 21L))
    assert(quarantine.select("new_id", "corpus_id")
      .as[(Long, Long)].collect().toSet == Set((10L, 1L), (20L, 11L)))
  }

  test("lost checkpoint: replayed batches do not self-quarantine") {
    // the checkpoint volume dies but the gate state survives: every
    // batch replays against an index that already contains its own
    // admitted docs. The self-pair guard must re-admit them — without
    // it the whole corpus quarantines against itself at jaccard 1.0
    // and admitted/ is overwritten empty (permanent data loss).
    val tmp = java.nio.file.Files.createTempDirectory("graft_gate_sq").toString
    val docsDir = s"$tmp/docs"
    new java.io.File(docsDir).mkdirs()
    def words(p: String) = (0 until 10).map(k => s"${p}_$k").mkString(" ")
    val corpusDocs = Seq((1L, words("c1"))).toDF("doc_id", "text")
    val seed = Dedup.minhashSketch(corpusDocs, numHashes = 16)
    writeOneFile(Seq((10L, words("c1") + " tail10"), (11L, words("a")))
      .toDF("doc_id", "text"), s"$docsDir/day1.parquet",
      System.currentTimeMillis() - 60000)
    IngestGate.nearDupGate(spark, docsDir, seed, s"$tmp/gate", s"$tmp/ckpt",
      threshold = 0.8, numHashes = 16, bands = 8)
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$tmp/ckpt"))
    val (admitted, quarantine) = IngestGate.nearDupGate(spark, docsDir,
      seed.limit(0), s"$tmp/gate", s"$tmp/ckpt",
      threshold = 0.8, numHashes = 16, bands = 8)
    // doc 11 is in the index from run 1 — replay must not pair it
    // with itself; doc 10 still quarantines against corpus doc 1
    assert(admitted.select("doc_id").as[Long].collect().toSeq == Seq(11L))
    assert(quarantine.select("new_id", "corpus_id")
      .as[(Long, Long)].collect().toSet == Set((10L, 1L)))
  }

  test("stale checkpoint with a fresh outDir fails fast") {
    // the inverse hazard: outDir wiped, checkpoint kept — a cold
    // start would mark every input file already-committed and build
    // an index silently missing those documents
    val tmp = java.nio.file.Files.createTempDirectory("graft_gate_sc").toString
    val docsDir = s"$tmp/docs"
    new java.io.File(docsDir).mkdirs()
    def words(p: String) = (0 until 10).map(k => s"${p}_$k").mkString(" ")
    writeOneFile(Seq((1L, words("a"))).toDF("doc_id", "text"),
      s"$docsDir/d.parquet", System.currentTimeMillis() - 60000)
    val seed = Dedup.minhashSketch(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), numHashes = 16)
    IngestGate.nearDupGate(spark, docsDir, seed, s"$tmp/gate", s"$tmp/ckpt",
      threshold = 0.8, numHashes = 16, bands = 8)
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$tmp/gate"))
    intercept[IllegalArgumentException] {
      IngestGate.nearDupGate(spark, docsDir, seed, s"$tmp/gate",
        s"$tmp/ckpt", threshold = 0.8, numHashes = 16, bands = 8)
    }
    // reset = true clears both and reprocesses everything
    val (admitted, _) = IngestGate.nearDupGate(spark, docsDir, seed,
      s"$tmp/gate", s"$tmp/ckpt", threshold = 0.8, numHashes = 16,
      bands = 8, reset = true)
    assert(admitted.select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("a database-qualified indexTable is rejected at entry, not mid-stream") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_gate_it").toString
    intercept[IllegalArgumentException] {
      IngestGate.nearDupGate(spark, s"$tmp/docs",
        Dedup.minhashSketch(
          Seq.empty[(Long, String)].toDF("doc_id", "text"), numHashes = 16),
        s"$tmp/gate", s"$tmp/ckpt", indexTable = Some("mydb.gate_idx"))
    }
  }

  test("non-gate outDir fails fast without reset; reset=true overwrites") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_gate_ff").toString
    val docsDir = s"$tmp/docs"
    new java.io.File(docsDir).mkdirs()
    def words(p: String) = (0 until 10).map(k => s"${p}_$k").mkString(" ")
    writeOneFile(Seq((1L, words("a"))).toDF("doc_id", "text"),
      s"$docsDir/d.parquet", System.currentTimeMillis() - 60000)
    val outDir = s"$tmp/existing"
    new java.io.File(outDir).mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(outDir, "precious.txt"), "not gate state")
    val seed = Dedup.minhashSketch(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), numHashes = 16)
    intercept[IllegalArgumentException] {
      IngestGate.nearDupGate(spark, docsDir, seed, outDir, s"$tmp/ckpt",
        threshold = 0.8, numHashes = 16, bands = 8)
    }
    assert(new java.io.File(outDir, "precious.txt").exists())
    val (admitted, _) = IngestGate.nearDupGate(spark, docsDir, seed, outDir,
      s"$tmp/ckpt", threshold = 0.8, numHashes = 16, bands = 8, reset = true)
    assert(admitted.select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("compaction crash between index rebuild and rename self-heals") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_gate_f2").toString
    val docsDir = s"$tmp/docs"
    new java.io.File(docsDir).mkdirs()
    def words(p: String) = (0 until 10).map(k => s"${p}_$k").mkString(" ")
    val corpusDocs = Seq((1L, words("c1"))).toDF("doc_id", "text")
    val t0 = System.currentTimeMillis() - 60000
    writeOneFile(Seq((10L, words("c1") + " t10"), (11L, words("a")))
      .toDF("doc_id", "text"), s"$docsDir/day1.parquet", t0)
    writeOneFile(Seq((20L, words("b"))).toDF("doc_id", "text"),
      s"$docsDir/day2.parquet", t0 + 10000)
    IngestGate.nearDupGate(spark, docsDir,
      Dedup.minhashSketch(corpusDocs, numHashes = 16),
      s"$tmp/gate", s"$tmp/ckpt", threshold = 0.8, numHashes = 16,
      bands = 8, compactEvery = 99, indexTable = Some("graft_gate_f2_idx"))
    def sketchDirs = new java.io.File(s"$tmp/gate/sketch").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    def sketchIds = spark.read.parquet(s"$tmp/gate/sketch")
      .select("id").as[Long].collect().sorted.toSeq
    val crash = intercept[IllegalStateException] {
      IngestGate.compactSketchIndex(spark, s"$tmp/gate", 1L, 16, 8,
        Some("graft_gate_f2_idx"), 16, failAfter = 2)
    }
    assert(crash.getMessage.contains("failpoint 2"))
    // crash-window state: temp fold orphaned, originals untouched,
    // no index entry lost, and the rebuilt stored table already
    // covers the whole corpus
    assert(new java.io.File(s"$tmp/gate/sketch_compact_tmp").exists())
    assert(sketchDirs == Seq("batch=0", "batch=1", "batch=seed"))
    assert(sketchIds == Seq(1L, 11L, 20L))
    assert(spark.table("graft_gate_f2_idx").select("id").distinct()
      .as[Long].collect().sorted.toSeq == Seq(1L, 11L, 20L))
    // the next compaction heals: tmp cleared, one fold, ids exactly once
    IngestGate.compactSketchIndex(spark, s"$tmp/gate", 2L, 16, 8,
      Some("graft_gate_f2_idx"), 16)
    assert(!new java.io.File(s"$tmp/gate/sketch_compact_tmp").exists())
    assert(sketchDirs == Seq("batch=c2"))
    assert(sketchIds == Seq(1L, 11L, 20L))
  }

  test("compaction crash between rename and delete: duplicate evidence at worst, then heals") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_gate_f3").toString
    val docsDir = s"$tmp/docs"
    new java.io.File(docsDir).mkdirs()
    def words(p: String) = (0 until 10).map(k => s"${p}_$k").mkString(" ")
    val corpusDocs = Seq((1L, words("c1"))).toDF("doc_id", "text")
    val novelA = words("a")
    val t0 = System.currentTimeMillis() - 60000
    writeOneFile(Seq((10L, words("c1") + " t10"), (11L, novelA))
      .toDF("doc_id", "text"), s"$docsDir/day1.parquet", t0)
    writeOneFile(Seq((20L, words("b"))).toDF("doc_id", "text"),
      s"$docsDir/day2.parquet", t0 + 10000)
    IngestGate.nearDupGate(spark, docsDir,
      Dedup.minhashSketch(corpusDocs, numHashes = 16),
      s"$tmp/gate", s"$tmp/ckpt", threshold = 0.8, numHashes = 16,
      bands = 8, compactEvery = 99, indexTable = Some("graft_gate_f3_idx"))
    def sketchDirs = new java.io.File(s"$tmp/gate/sketch").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    def sketchIds = spark.read.parquet(s"$tmp/gate/sketch")
      .select("id").as[Long].collect().sorted.toSeq
    val crash = intercept[IllegalStateException] {
      IngestGate.compactSketchIndex(spark, s"$tmp/gate", 1L, 16, 8,
        Some("graft_gate_f3_idx"), 16, failAfter = 3)
    }
    assert(crash.getMessage.contains("failpoint 3"))
    // crash-window state: fold renamed in AND originals still there —
    // every id doubly represented, none lost
    assert(sketchDirs == Seq("batch=0", "batch=1", "batch=c1", "batch=seed"))
    assert(sketchIds == Seq(1L, 1L, 11L, 11L, 20L, 20L))
    // the gate keeps working over the doubled index: day3's near-dup
    // of an admitted doc is still caught (duplicate evidence at
    // worst), its novel doc still admitted
    writeOneFile(Seq((30L, novelA + " t30"), (31L, words("cc")))
      .toDF("doc_id", "text"), s"$docsDir/day3.parquet", t0 + 20000)
    val (admitted, quarantine) = IngestGate.nearDupGate(spark, docsDir,
      Dedup.minhashSketch(corpusDocs, numHashes = 16),
      s"$tmp/gate", s"$tmp/ckpt", threshold = 0.8, numHashes = 16,
      bands = 8, compactEvery = 99, indexTable = Some("graft_gate_f3_idx"))
    assert(admitted.select("doc_id").as[Long].collect().sorted.toSeq
      == Seq(11L, 20L, 31L))
    assert(quarantine.select("new_id", "corpus_id")
      .as[(Long, Long)].collect().toSet == Set((10L, 1L), (30L, 11L)))
    // the next compaction's id-dedup heals the double representation
    IngestGate.compactSketchIndex(spark, s"$tmp/gate", 3L, 16, 8,
      Some("graft_gate_f3_idx"), 16)
    assert(sketchDirs == Seq("batch=c3"))
    assert(sketchIds == Seq(1L, 11L, 20L, 31L))
    assert(spark.table("graft_gate_f3_idx").select("id").distinct()
      .as[Long].collect().sorted.toSeq == Seq(1L, 11L, 20L, 31L))
  }

  test("compaction bounds the sketch dirs and the stored bucketed index probes with one exchange") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_gate_cp").toString
    val docsDir = s"$tmp/docs"
    new java.io.File(docsDir).mkdirs()
    def words(p: String) = (0 until 10).map(k => s"${p}_$k").mkString(" ")
    val corpusDocs = Seq((1L, words("c1"))).toDF("doc_id", "text")
    val novelA = words("a"); val novelB = words("b"); val novelC = words("cc")
    val t0 = System.currentTimeMillis() - 60000
    // day1: 10 dups seed, 11 novel.   day2: 20 novel → then compaction
    // (dirs seed,0,1 = 3 ≥ compactEvery) folds the index + builds the
    // bucketed table.   day3: 30 dups 11 — only reachable through the
    // STORED index; 31 novel.   day4: 40 dups 31 (a NOT-yet-compacted
    // recent admit → the stored ∪ recent union), 41 dups 20 (stored).
    writeOneFile(Seq((10L, words("c1") + " t10"), (11L, novelA))
      .toDF("doc_id", "text"), s"$docsDir/day1.parquet", t0)
    writeOneFile(Seq((20L, novelB)).toDF("doc_id", "text"),
      s"$docsDir/day2.parquet", t0 + 10000)
    writeOneFile(Seq((30L, novelA + " t30"), (31L, novelC))
      .toDF("doc_id", "text"), s"$docsDir/day3.parquet", t0 + 20000)
    writeOneFile(Seq((40L, novelC + " t40"), (41L, novelB + " t41"))
      .toDF("doc_id", "text"), s"$docsDir/day4.parquet", t0 + 30000)

    val (admitted, quarantine) = IngestGate.nearDupGate(spark, docsDir,
      Dedup.minhashSketch(corpusDocs, numHashes = 16),
      s"$tmp/gate", s"$tmp/ckpt", threshold = 0.8, numHashes = 16, bands = 8,
      compactEvery = 3, indexTable = Some("graft_gate_idx"))

    assert(admitted.select("doc_id").as[Long].collect().sorted.toSeq
      == Seq(11L, 20L, 31L))
    assert(quarantine.select("new_id", "corpus_id")
      .as[(Long, Long)].collect().toSet
      == Set((10L, 1L), (30L, 11L), (40L, 31L), (41L, 20L)))
    // dir growth is bounded: batch3's post-write compaction folded
    // everything into the single batch=c3 directory
    val sketchDirs = new java.io.File(s"$tmp/gate/sketch").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(sketchDirs == Seq("batch=c3"))
    // the compacted index covers every admitted doc + the seed corpus
    assert(spark.read.parquet(s"$tmp/gate/sketch").select("id")
      .as[Long].collect().sorted.toSeq == Seq(1L, 11L, 20L, 31L))
    // the 100 TB plan pin (DedupSpec's shape, against the table the
    // GATE built): probing the stored bucketed index exchanges only
    // the batch side
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val probe = Dedup.sketchBandIndex(
        Dedup.minhashSketch(Seq((100L, novelA + " t100"))
          .toDF("doc_id", "text"), numHashes = 16), numHashes = 16, bands = 8)
      val cands = spark.table("graft_gate_idx").alias("c")
        .join(probe.alias("n"), col("c.bandkey") === col("n.bandkey"))
        .select(col("n.id").as("new_id"), col("c.id").as("corpus_id"))
      assert(cands.count() >= 1)
      val exchanges = "Exchange hashpartitioning".r
        .findAllIn(cands.queryExecution.executedPlan.toString).length
      assert(exchanges == 1,
        s"expected only the batch-side exchange, got $exchanges:\n" +
          cands.queryExecution.executedPlan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }
}
