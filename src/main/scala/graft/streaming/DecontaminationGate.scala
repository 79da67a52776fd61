package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming DECONTAMINATION gate — fuzzy eval-set leakage removal
  * ([[Dedup.fuzzyDecontaminate]]) as an always-on ingest stage: each
  * arriving micro-batch of documents is sketched and probed against
  * the STATIC benchmark index; documents whose max jaccard against
  * any eval doc clears the threshold are quarantined (with the
  * matched bench id and the score as evidence), the rest pass. The
  * natural chain position is AFTER the [[IngestGate]] near-dup gate:
  * admitted/ of that gate is docsDir of this one — a crawl ingest
  * then lands only documents that are both novel AND eval-clean.
  *
  * Unlike [[IngestGate]] the index never grows — the eval set is a
  * fixed artifact — so the verdict for a document is INDEPENDENT of
  * how the stream is batched: the streamed verdict table over any
  * file arrival order equals the batch [[Dedup.fuzzyDecontaminate]]
  * over the union, row for row (the oracle hash-checks exactly
  * that; batch-equivalence by construction, not by test vector).
  *
  * The bench index is the train-once / stream-forever artifact:
  * [[saveBenchIndex]] persists the (id, sh, sig) sketch once,
  * every gate session [[loadBenchIndex]]s it — the model-artifact
  * discipline every streaming model family here uses. The sketch
  * FAMILY is the caller's (`sketch` maps a doc batch to its
  * (id, sh, sig) table): production passes the codegen'd xxhash64
  * [[Dedup.minhashSketch]]; the hash-checked driver query passes
  * the md5-portable family so DuckDB replays the whole gate.
  *
  * foreachBatch (the [[QualityGate]] harness): three exactly-once
  * outputs per batch — verdict, admitted docs (full input schema),
  * quarantine evidence — each under `batch=<id>/` with overwrite
  * mode so a crashed-and-retried micro-batch rewrites the same
  * paths. Restart-safe: same outDir + checkpointDir resumes,
  * committed files are skipped; `reset = true` destroys prior
  * state; a non-empty outDir that is not prior gate state fails
  * fast (the shared guards).
  *
  * Scale shape: per batch everything is batch-local — the bench
  * side broadcasts twice inside [[Dedup.fuzzyDecontaminate]] (band
  * keys + verify fetch), the batch is never shuffle-joined, and no
  * state store or watermark exists; an always-on 100 TB ingest runs
  * one such broadcast-probe plan per arriving file. */
object DecontaminationGate {

  /** Persist a benchmark sketch (id, sh, sig) as the gate's static
    * index artifact. */
  def saveBenchIndex(sketch: DataFrame, dir: String): Unit =
    sketch.select("id", "sh", "sig")
      .write.mode("overwrite").parquet(dir)

  def loadBenchIndex(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Drive every parquet file under `docsDir` through the gate, one
    * micro-batch per file (availableNow).
    *
    * Output layout under `outDir`:
    *  - `verdict/batch=<id>/`    — (doc_id, max_jaccard, bench_id,
    *    contaminated) for every sketchable doc of the batch
    *  - `admitted/batch=<id>/`   — clean docs, full input schema
    *  - `quarantine/batch=<id>/` — verdict rows of contaminated docs
    *
    * @param sketch   doc batch → (id, sh, sig) sketch (the hash
    *                 family choice; `id` must be the doc id)
    * @return (verdict, admitted, quarantine) as batch reads */
  def decontaminationGate(spark: SparkSession, docsDir: String,
                          benchIndex: DataFrame,
                          sketch: DataFrame => DataFrame,
                          outDir: String, checkpointDir: String,
                          threshold: Double, numHashes: Int = 32,
                          bands: Int = 2,
                          idCol: String = "doc_id",
                          fileGlob: String = "*.parquet",
                          reset: Boolean = false)
  : (DataFrame, DataFrame, DataFrame) = {
    val fs = new org.apache.hadoop.fs.Path(outDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    val verdictDir = s"$outDir/verdict"
    if (reset) {
      Seq(outDir, checkpointDir).foreach { p =>
        val hp = new org.apache.hadoop.fs.Path(p)
        if (fs.exists(hp)) fs.delete(hp, true)
      }
    }
    val resuming = fs.exists(new org.apache.hadoop.fs.Path(verdictDir))
    if (!resuming) {
      if (fs.exists(outPath) && fs.listStatus(outPath).nonEmpty)
        throw new IllegalArgumentException(
          s"outDir '$outDir' is non-empty and not prior gate state " +
            "(no verdict/ table); pass reset = true to overwrite it")
      val ckptPath = new org.apache.hadoop.fs.Path(checkpointDir)
      val ckptFs = ckptPath.getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      if (ckptFs.exists(ckptPath) && ckptFs.listStatus(ckptPath).nonEmpty)
        throw new IllegalArgumentException(
          s"checkpointDir '$checkpointDir' has streaming state but " +
            s"outDir '$outDir' has no verdict table — a cold start " +
            "here would skip every already-committed input file; " +
            "pass reset = true to start clean")
    }
    val bench = benchIndex
    val schema = spark.read
      .option("pathGlobFilter", fileGlob).parquet(docsDir).schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", fileGlob)
      .option("maxFilesPerTrigger", "1")
      .parquet(docsDir)
    EventStreams.withStatefulShuffle(spark) {
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val docs = batch.persist()
          // materialize the batch sketch ONCE: the probe references
          // it three times (band keys, verify fetch, report ids) and
          // the signature tree is the expensive part — the same
          // localCheckpoint discipline the batch query uses
          val batchSketch = sketch(docs).localCheckpoint()
          val verdict = Dedup.fuzzyDecontaminate(
            batchSketch, bench, threshold, numHashes, bands)
          verdict.write.mode("overwrite")
            .parquet(s"$verdictDir/batch=$batchId")
          // re-read the committed verdict rather than recompute: the
          // band/verify/argmax pipeline ran once
          val v = spark.read.parquet(s"$verdictDir/batch=$batchId")
          docs.join(
              v.filter(col("contaminated"))
                .select(col("id").as("__cid")),
              docs(idCol) === col("__cid"), "left_anti")
            .write.mode("overwrite")
            .parquet(s"$outDir/admitted/batch=$batchId")
          v.filter(col("contaminated"))
            .write.mode("overwrite")
            .parquet(s"$outDir/quarantine/batch=$batchId")
          docs.unpersist()
          ()
        }
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    (spark.read.parquet(verdictDir).drop("batch"),
      spark.read.parquet(s"$outDir/admitted").drop("batch"),
      spark.read.parquet(s"$outDir/quarantine").drop("batch"))
  }
}
