package graft.streaming

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.DataFrame

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
}
