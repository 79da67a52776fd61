package graft.streaming

import graft.SparkSpec
import graft.operators.Corpus
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class QualityGateSpec extends SparkSpec {
  import sqlImplicits._

  /** Land `df` as ONE parquet file at `dest` with modification time
    * `mtime` (the IngestGateSpec fixture — distinct mtimes make the
    * file-stream batch order deterministic). */
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

  // a gopher-passing sentence shape: >= 30 tokens, mean length in
  // [3, 10], all-alpha, >= 2 required stopwords
  private def sentence(vocab: Seq[String]): String =
    (0 until 4).flatMap(_ =>
      Seq("the", "and") ++ vocab :+ "with").mkString(" ")
  private val goodVocab = Seq("signal", "clean", "curated",
    "quality", "corpus", "tokens")
  private val badVocab = Seq("spam", "junk", "noise",
    "click", "banner", "advert")

  // labeled fit corpus: lang by char distribution, source by vocab
  private def fitDocs = Seq(
    (100L, "en", "src0", sentence(goodVocab)),
    (101L, "en", "src1", sentence(goodVocab)),
    (102L, "de", "src0", sentence(goodVocab.map(_.toUpperCase))),
    (103L, "de", "src9", sentence(badVocab.map(_.toUpperCase))),
    (104L, "en", "src9", sentence(badVocab)),
    (105L, "en", "src9", sentence(badVocab)))
    .toDF("doc_id", "lang", "source", "text")

  private def models = (
    Corpus.fitLangIdModel(fitDocs),
    Corpus.fitQualityModel(fitDocs,
      col("source").isin("src0", "src1", "src2", "src3")))

  test("gateVerdict: the three scorers compose into one verdict row per doc") {
    val (lm, qm) = models
    val docs = Seq(
      (1L, sentence(goodVocab)),           // passes everything
      (2L, sentence(badVocab)),            // gopher ok, classifier no
      (3L, "too short"),                   // fails gopher minTokens
      (4L, "x"))                           // 1 char: langid null too
      .toDF("doc_id", "text")
    val v = QualityGate.gateVerdict(docs, lm, qm)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(v.size == 4)
    assert(v(1L).getBoolean(v(1L).fieldIndex("keep")))
    assert(!v(2L).getBoolean(v(2L).fieldIndex("keep")) &&
      v(2L).getBoolean(v(2L).fieldIndex("gopher_keep")) &&
      !v(2L).getBoolean(v(2L).fieldIndex("clf_keep")))
    assert(!v(3L).getBoolean(v(3L).fieldIndex("gopher_keep")))
    assert(v(4L).isNullAt(v(4L).fieldIndex("lang_pred")))
    // lang routing: the de-shaped doc predicts de
    val de = QualityGate.gateVerdict(
      Seq((5L, sentence(goodVocab.map(_.toUpperCase))))
        .toDF("doc_id", "text"), lm, qm).collect().head
    assert(de.getString(de.fieldIndex("lang_pred")) == "de")
  }

  test("streamed verdict equals the batch gateVerdict over the same files") {
    val (lm, qm) = models
    val tmp = java.nio.file.Files.createTempDirectory("graft_qg").toString
    val docsDir = s"$tmp/docs"
    new java.io.File(docsDir).mkdirs()
    val t0 = System.currentTimeMillis() - 60000
    val f1 = Seq((1L, sentence(goodVocab)), (2L, sentence(badVocab)))
      .toDF("doc_id", "text")
    val f2 = Seq((3L, "too short"), (4L, sentence(goodVocab)))
      .toDF("doc_id", "text")
    val f3 = Seq((5L, sentence(badVocab)), (6L, "x"))
      .toDF("doc_id", "text")
    writeOneFile(f1, s"$docsDir/a.parquet", t0)
    writeOneFile(f2, s"$docsDir/b.parquet", t0 + 5000)
    writeOneFile(f3, s"$docsDir/c.parquet", t0 + 10000)

    val (verdict, admitted, rejected) = QualityGate.qualityGate(
      spark, docsDir, lm, qm, s"$tmp/gate", s"$tmp/ckpt")
    val want = QualityGate.gateVerdict(
      f1.unionByName(f2).unionByName(f3), lm, qm)

    def rows(df: DataFrame) = df
      .select("doc_id", "lang_pred", "n_tokens", "gopher_keep",
        "clf_n_tokens", "clf_score_fp", "clf_keep", "keep")
      .collect().map(_.toSeq).toSet
    assert(rows(verdict) == rows(want))
    // admitted = full input rows of kept docs, plus the routing col
    assert(admitted.columns.toSeq == Seq("doc_id", "text", "lang_pred"))
    assert(admitted.select("doc_id").as[Long].collect().sorted.toSeq
      == Seq(1L, 4L))
    // rejected = the verdict evidence of refused docs
    assert(rejected.select("doc_id").as[Long].collect().sorted.toSeq
      == Seq(2L, 3L, 5L, 6L))
    // one exactly-once batch dir per input file
    val vdirs = new java.io.File(s"$tmp/gate/verdict").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(vdirs.length == 3 && vdirs.forall(_.startsWith("batch=")))
  }

  test("kill-and-restart: resumed gate skips committed files, gates only the new one") {
    val (lm, qm) = models
    val tmp = java.nio.file.Files.createTempDirectory("graft_qg_rs").toString
    val docsDir = s"$tmp/docs"
    new java.io.File(docsDir).mkdirs()
    val t0 = System.currentTimeMillis() - 60000
    val f1 = Seq((1L, sentence(goodVocab))).toDF("doc_id", "text")
    val f2 = Seq((2L, sentence(badVocab))).toDF("doc_id", "text")
    writeOneFile(f1, s"$docsDir/a.parquet", t0)
    writeOneFile(f2, s"$docsDir/b.parquet", t0 + 5000)
    QualityGate.qualityGate(spark, docsDir, lm, qm,
      s"$tmp/gate", s"$tmp/ckpt")
    val committed = new java.io.File(s"$tmp/gate/verdict").listFiles()
      .filter(_.isDirectory).map(f => f.getName -> f.lastModified()).toMap
    assert(committed.size == 2)

    // a third file lands; the resumed gate must process ONLY it
    val f3 = Seq((3L, sentence(goodVocab))).toDF("doc_id", "text")
    writeOneFile(f3, s"$docsDir/c.parquet", t0 + 10000)
    val (verdict, admitted, _) = QualityGate.qualityGate(
      spark, docsDir, lm, qm, s"$tmp/gate", s"$tmp/ckpt")
    assert(verdict.select("doc_id").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 3L))
    assert(admitted.select("doc_id").as[Long].collect().sorted.toSeq
      == Seq(1L, 3L))
    val after = new java.io.File(s"$tmp/gate/verdict").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(after.size == 3 && committed.keySet.subsetOf(after))
    // the committed batch dirs were not rewritten by the resume
    for ((name, mt) <- committed)
      assert(new java.io.File(s"$tmp/gate/verdict/$name")
        .lastModified() == mt, s"$name was re-gated on resume")
  }

  test("E13 -> E11 chaining: quality-admitted batches feed the " +
      "near-dup gate by directory") {
    // the production composition: the quality gate's admitted/
    // layout IS a landing zone for the near-dup gate — no glue code,
    // the second stream just watches admitted/batch=*
    val (lm, qm) = models
    val tmp = java.nio.file.Files.createTempDirectory("graft_qg_ch").toString
    val docsDir = s"$tmp/landing"
    new java.io.File(docsDir).mkdirs()
    val t0 = System.currentTimeMillis() - 60000
    val goodA = sentence(goodVocab)
    // f1: 1 passes quality; 2 fails the classifier
    writeOneFile(Seq((1L, goodA), (2L, sentence(badVocab)))
      .toDF("doc_id", "text"), s"$docsDir/a.parquet", t0)
    // f2: 3 passes quality but near-dups 1; 4 passes and is distinct
    // (same vocabulary, different shingle ORDER)
    writeOneFile(Seq((3L, goodA + " trailer"),
        (4L, sentence(goodVocab.reverse)))
      .toDF("doc_id", "text"), s"$docsDir/b.parquet", t0 + 5000)

    QualityGate.qualityGate(spark, docsDir, lm, qm,
      s"$tmp/qg", s"$tmp/qg_ckpt")
    // quality verdicts: 2 rejected, 1/3/4 admitted (3 is a DUP but
    // dup-ness is not quality's job)
    assert(spark.read.parquet(s"$tmp/qg/admitted")
      .select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L, 4L))

    val emptySeed = graft.operators.Dedup.minhashSketch(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), numHashes = 16)
    val (admitted, quarantine) = IngestGate.nearDupGate(spark,
      s"$tmp/qg/admitted/batch=*", emptySeed,
      s"$tmp/ndg", s"$tmp/ndg_ckpt",
      threshold = 0.7, numHashes = 16, bands = 8)
    // the near-dup gate catches 3 against 1 — which it only can
    // because 1 flowed through quality's batch=0 BEFORE 3's batch=1
    assert(admitted.select("doc_id").as[Long].collect().sorted.toSeq
      == Seq(1L, 4L))
    assert(quarantine.select("new_id", "corpus_id")
      .as[(Long, Long)].collect().toSet == Set((3L, 1L)))
  }

  test("cold-start guards: foreign outDir and stale checkpoint both fail fast") {
    val (lm, qm) = models
    val tmp = java.nio.file.Files.createTempDirectory("graft_qg_gd").toString
    val docsDir = s"$tmp/docs"
    new java.io.File(docsDir).mkdirs()
    writeOneFile(Seq((1L, sentence(goodVocab))).toDF("doc_id", "text"),
      s"$docsDir/a.parquet", System.currentTimeMillis() - 60000)
    // outDir holds unrelated data (no verdict/): refuse to overwrite
    new java.io.File(s"$tmp/gate").mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$tmp/gate/precious.txt"),
      "not gate state".getBytes("UTF-8"))
    val e1 = intercept[IllegalArgumentException] {
      QualityGate.qualityGate(spark, docsDir, lm, qm,
        s"$tmp/gate", s"$tmp/ckpt")
    }
    assert(e1.getMessage.contains("non-empty"))
    // stale checkpoint + fresh outDir: would silently skip everything
    new java.io.File(s"$tmp/ckpt2/offsets").mkdirs()
    val e2 = intercept[IllegalArgumentException] {
      QualityGate.qualityGate(spark, docsDir, lm, qm,
        s"$tmp/gate2", s"$tmp/ckpt2")
    }
    assert(e2.getMessage.contains("streaming state"))
  }
}
