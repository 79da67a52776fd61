package graft.streaming

import graft.SparkSpec
import graft.sources.Warc
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class WarcIngestSpec extends SparkSpec {
  import sqlImplicits._

  private def docs(ids: Seq[Long], tag: String): DataFrame =
    ids.map(i => (s"https://x.org/$i", "2026-01-01T00:00:00Z",
        s"payload $tag $i".getBytes("UTF-8")))
      .toDF("uri", "date", "payload")

  private def idsOf(rec: DataFrame): Set[Long] =
    rec.select(regexp_extract(col("target_uri"), "([0-9]+)$", 1)
      .cast("long")).as[Long].collect().toSet

  test("WarcIngest: two triggers — only new files parsed, exactly-once rows") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_wi").toString
    val landing = s"$tmp/landing"
    val out = s"$tmp/ingest"

    Warc.write(docs(Seq(1L, 2L, 3L), "w1").repartition(2), s"$landing/w1")
    val s1 = WarcIngest.ingestOnce(spark, landing, out)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(s1.map(_._4).sum == 3)          // 3 records over the 2 files
    assert(s1.forall(_._5 == 1L))          // all batch 1

    Warc.write(docs(Seq(4L, 5L), "w2").repartition(1), s"$landing/w2")
    val s2 = WarcIngest.ingestOnce(spark, landing, out)
      .as[(String, Long, Long, Long, Long)].collect()
    // only the new file is in the trigger summary
    assert(s2.length == 1 && s2.head._4 == 2 && s2.head._5 == 2L)

    val rec = WarcIngest.records(spark, out)
    assert(rec.count() == 5)               // exactly-once across triggers
    assert(idsOf(rec) == Set(1L, 2L, 3L, 4L, 5L))
    assert(rec.where(col("batch") === 1).count() == 3)
    assert(rec.where(col("batch") === 2).count() == 2)

    // no-op trigger: empty summary, no batch consumed
    val s3 = WarcIngest.ingestOnce(spark, landing, out)
    assert(s3.isEmpty)
    Warc.write(docs(Seq(6L), "w3").repartition(1), s"$landing/w3")
    val s4 = WarcIngest.ingestOnce(spark, landing, out)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(s4.head._5 == 3L)               // not 4 — the no-op didn't commit
  }

  test("WarcIngest: a changed file is reprocessed, replacing its rows") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_wi").toString
    val landing = s"$tmp/landing"
    val out = s"$tmp/ingest"

    Warc.write(docs(Seq(1L, 2L), "v1").repartition(1), s"$landing/w")
    WarcIngest.ingestOnce(spark, landing, out)
    // same path, different content (size changes → detected)
    Warc.write(docs(Seq(1L, 2L, 3L), "v2longer").repartition(1), s"$landing/w")
    val s2 = WarcIngest.ingestOnce(spark, landing, out)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(s2.length == 1 && s2.head._4 == 3 && s2.head._5 == 2L)

    val rec = WarcIngest.records(spark, out)
    // the file's partition was REPLACED: 3 rows, not 2 + 3
    assert(rec.count() == 3)
    assert(rec.where(col("batch") === 1).count() == 0)
    assert(rec.select(col("payload").cast("string")).as[String]
      .collect().forall(_.contains("v2longer")))
  }

  test("WarcIngest: crash before manifest commit self-heals without dup rows") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_wi").toString
    val landing = s"$tmp/landing"
    val out = s"$tmp/ingest"
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    Warc.write(docs(Seq(1L, 2L), "w1").repartition(1), s"$landing/w1")
    WarcIngest.ingestOnce(spark, landing, out)
    Warc.write(docs(Seq(3L, 4L), "w2").repartition(1), s"$landing/w2")
    WarcIngest.ingestOnce(spark, landing, out)

    // simulate a crash in the window between the records write and
    // the manifest rename: trigger 2's records are durable but its
    // manifest commit is gone (plus a stale temp left behind)
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$out/manifest/b2"), true))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$out/manifest_tmp_2"))

    val healed = WarcIngest.ingestOnce(spark, landing, out)
      .as[(String, Long, Long, Long, Long)].collect()
    // the uncommitted file is re-listed as fresh and re-ingested
    assert(healed.length == 1 && healed.head._4 == 2)
    val rec = WarcIngest.records(spark, out)
    assert(rec.count() == 4)               // replaced, never appended twice
    assert(idsOf(rec) == Set(1L, 2L, 3L, 4L))
  }

  test("WarcIngest plan guards: shuffle-free parse, pruned count read-back") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_wi").toString
    val landing = s"$tmp/landing"
    val out = s"$tmp/ingest"
    Warc.write(docs(Seq(1L, 2L), "w1").repartition(1), s"$landing/w1")
    Warc.write(docs(Seq(3L, 4L), "w2").repartition(1), s"$landing/w2")
    WarcIngest.ingestOnce(spark, landing, out)

    // the parse leg is scan → mapPartitions: ZERO exchanges (one
    // task per WARC file is the whole scale model)
    val files = new java.io.File(s"$landing/w1").listFiles()
      .filter(_.getName.endsWith(".warc")).map(_.toURI.toString).toIndexedSeq
    val parsePlan = Warc.read(spark, files)
      .queryExecution.executedPlan.toString
    assert(!parsePlan.contains("Exchange"),
      s"parse leg shuffles:\n$parsePlan")

    // the per-file count read-back prunes to the delta's partitions:
    // the src_hash predicate must land in PartitionFilters (pruned
    // at planning), not survive as a post-scan data filter
    val someHash = WarcIngest.records(spark, out)
      .select("src_hash").head().getString(0)
    val probe = WarcIngest.records(spark, out)
      .where(col("src_hash").isin(someHash))
    val probePlan = probe.queryExecution.executedPlan.toString
    assert(probePlan.contains("PartitionFilters") &&
      probePlan.contains("src_hash"), s"not pruned:\n$probePlan")
  }

  test("WarcIngest: records() before any trigger is empty, full schema") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_wi").toString
    val rec = WarcIngest.records(spark, s"$tmp/ingest")
    assert(rec.isEmpty)
    assert(rec.columns.toSet == Set("file", "record_idx", "warc_type",
      "target_uri", "warc_date", "content_length", "payload", "batch",
      "src_hash"))
    // and the empty-landing facade chain composes instead of crashing
    val out = graft.operators.CorpusPipeline.warcToCorpus(spark,
      s"$tmp/landing", s"$tmp/ingest",
      Seq("bad.net").toDF("domain"))
    assert(out.isEmpty)
  }

  test("WarcIngest: a corrupt .warc.gz quarantines as 0 records, not a crash") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_wi").toString
    val landing = s"$tmp/landing"
    val out = s"$tmp/ingest"
    Warc.write(docs(Seq(1L, 2L), "good").repartition(1), s"$landing/w")
    // not a gzip stream at all — bad magic bytes
    new java.io.File(landing).mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$landing/bad.warc.gz"),
      "this is not gzip".getBytes("UTF-8"))
    val s1 = WarcIngest.ingestOnce(spark, landing, out)
      .as[(String, Long, Long, Long, Long)].collect()
    // the trigger SUCCEEDS; the corrupt file commits with 0 records
    // (visible quarantine) and is not re-scanned on the next trigger
    assert(s1.length == 2)
    assert(s1.find(_._1.endsWith("bad.warc.gz")).get._4 == 0)
    assert(s1.map(_._4).sum == 2)
    assert(WarcIngest.ingestOnce(spark, landing, out).isEmpty)
    assert(idsOf(WarcIngest.records(spark, out)) == Set(1L, 2L))
  }

  test("WarcIngest: a re-ingested file that now parses to 0 records " +
      "overwrites (empties) its old partition") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_wi").toString
    val landing = s"$tmp/landing"
    val out = s"$tmp/ingest"
    Warc.write(docs(Seq(1L, 2L), "v1").repartition(1), s"$landing/w")
    val s1 = WarcIngest.ingestOnce(spark, landing, out)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(s1.length == 1 && s1.head._4 == 2)
    val path = s1.head._1

    // overwrite the SAME landing file with gzip-invalid bytes of a
    // different size: fresh (size changed) but parses to 0 records —
    // dynamic partition overwrite writes nothing for it, so without
    // the explicit stale-partition delete the old v1 rows would
    // linger and be attributed to the fresh file
    val local = new java.io.File(new java.net.URI(path))
    java.nio.file.Files.write(local.toPath,
      "WARC/0.0 corrupt rewrite, much longer than before".getBytes("UTF-8"))
    // drop the Hadoop LocalFileSystem checksum sidecar the original
    // write created — the rewrite above bypassed it
    new java.io.File(local.getParentFile, s".${local.getName}.crc").delete()

    val s2 = WarcIngest.ingestOnce(spark, landing, out)
      .as[(String, Long, Long, Long, Long)].collect()
    // the fresh file commits 0 records (NOT the stale count of 2)
    assert(s2.length == 1 && s2.head._1 == path && s2.head._4 == 0)
    // and its old rows are gone from the durable table
    assert(WarcIngest.records(spark, out).count() == 0)
    // quarantine is sticky: unchanged on the next trigger
    assert(WarcIngest.ingestOnce(spark, landing, out).isEmpty)
  }

  test("WarcIngest: driver-side md5 prune key equals Spark's md5()") {
    // the count read-back prunes partitions with DRIVER-computed md5
    // hex of the path against partitions written with the EXECUTOR
    // md5() column — a divergence would silently zero the manifest
    // counts. Pin byte-equality over tricky strings (non-ASCII,
    // URL-ish, empty-ish).
    val samples = Seq("file:/tmp/a.warc", "file:/tmp/ü ñ/β.warc.gz",
      "s3a://bucket/crawl/seg=2026-08/part-00001.warc.gz", "x")
    val sparkSide = samples.toDF("p")
      .select(md5(col("p"))).as[String].collect()
    val driverSide = samples.map { s =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    }
    assert(sparkSide.toSeq == driverSide)
  }

  test("WarcIngest: gzipped WARC files ingest through the same loop") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_wi").toString
    val landing = s"$tmp/landing"
    val out = s"$tmp/ingest"
    new java.io.File(landing).mkdirs()

    // hand-build a .warc.gz of two records
    val body = Seq(5L, 6L).map { i =>
      val p = s"gz payload $i".getBytes("UTF-8")
      (s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Target-URI: https://x.org/$i\r\n" +
        s"WARC-Date: 2026-01-01T00:00:00Z\r\n" +
        s"Content-Length: ${p.length}\r\n\r\n").getBytes("UTF-8") ++
        p ++ "\r\n\r\n".getBytes("UTF-8")
    }.reduce(_ ++ _)
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(body); gz.close()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$landing/a.warc.gz"), bos.toByteArray)

    val s1 = WarcIngest.ingestOnce(spark, landing, out)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(s1.length == 1 && s1.head._4 == 2)
    assert(idsOf(WarcIngest.records(spark, out)) == Set(5L, 6L))
  }
}
