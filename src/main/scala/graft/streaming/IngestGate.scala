package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming ingest near-dup gate — the incremental MinHash probe
  * ([[graft.operators.Dedup.incrementalMinhashPairs]]) as an
  * always-on ingest stage: each arriving micro-batch of documents is
  * first deduplicated WITHIN the batch, then probed against the
  * accumulated corpus sketch; documents with a verified
  * near-duplicate already in the corpus are quarantined (with the
  * pair evidence), the rest pass the gate AND their sketches are
  * appended to the index — so later batches are deduped against what
  * earlier batches admitted. This is the crawl-ingest shape: the
  * corpus only ever grows by documents that cleared the gate.
  *
  * foreachBatch is the right streaming construct here, not a
  * stream-static join chain: the probe is a multi-join batch
  * pipeline with its own persist/release discipline, and the index
  * must be APPENDED to between micro-batches — a static-side
  * mutation stream-static joins don't model. foreachBatch hands each
  * micro-batch to the exact batch operator the driver's oracle
  * certifies (q_dedup_incremental), and the per-batch index append
  * is a parquet write the next batch's probe scans.
  *
  * Exactly-once: every per-batch output lands under a
  * `batch=<batchId>/` directory written with overwrite mode, so a
  * crashed-and-retried micro-batch rewrites the same paths instead
  * of double-appending.
  *
  * Scale notes (100 TB corpus, GB-scale daily batches):
  *  - per batch the corpus side costs pruned columnar scans of the
  *    stored sketch, never a re-shingle (see
  *    [[graft.operators.Dedup.minhashSketch]]); at corpus scale the
  *    index lives bucketed by band key so the probe shuffles only
  *    the batch side (DedupSpec pins that plan);
  *  - in-batch dedup uses the conservative greedy rule — any doc
  *    paired with a smaller in-batch id is dropped. On A~B~C chains
  *    this may over-drop (C falls even if its only dup B fell
  *    first); the gate prefers admitting a guaranteed dup-free set
  *    over chain-precision. The full connected-components treatment
  *    is [[graft.operators.Dedup.deduplicate]].
  */
object IngestGate {

  /** Drive every parquet file under `docsDir` through the gate one
    * micro-batch per file (availableNow). `seedSketch` is the
    * pre-existing corpus index — pass a sketch of the current corpus,
    * or an empty sketch for a cold start.
    *
    * Output layout under `outDir`:
    *  - `admitted/batch=<id>/`  — gated documents, full input schema
    *  - `quarantine/batch=<id>/` — (new_id, corpus_id, jaccard) pair
    *    evidence for every rejected document
    *  - `sketch/batch=<id>/`   — admitted docs' (id, sh, sig), the
    *    index later batches probe (seeded from `seedSketch`)
    *
    * Returns (admitted, quarantine) as batch DataFrames. */
  def nearDupGate(spark: SparkSession, docsDir: String,
                  seedSketch: DataFrame, outDir: String,
                  checkpointDir: String, threshold: Double = 0.9,
                  numHashes: Int = 16, bands: Int = 4, shingleN: Int = 3,
                  idCol: String = "doc_id", textCol: String = "text",
                  fileGlob: String = "*.parquet"): (DataFrame, DataFrame) = {
    val fs = new org.apache.hadoop.fs.Path(outDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    Seq(outDir, checkpointDir).foreach { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      if (fs.exists(hp)) fs.delete(hp, true)
    }
    val admittedDir = s"$outDir/admitted"
    val quarantineDir = s"$outDir/quarantine"
    val sketchDir = s"$outDir/sketch"
    seedSketch.write.parquet(s"$sketchDir/batch=seed")

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
          val sketch = Dedup
            .minhashSketch(docs, numHashes, shingleN, idCol, textCol)
          // 1. in-batch dedup (greedy: larger id of any pair falls)
          val inBatchPairs = Dedup
            .minhashPairsFromSketch(sketch, threshold, numHashes, bands)
          // localCheckpoint: the probe, the admit semi-join and the
          // index append below all reuse the surviving sketch; the
          // checkpoint materializes it ONCE (the operator releases
          // its own cache before the later consumers run)
          val batchSketch = sketch.join(
            inBatchPairs.select(col("b_id").as("id")).distinct(),
            Seq("id"), "left_anti").localCheckpoint()
          // 2. probe the survivors against the accumulated index;
          //    `batch` is a partition-discovery column, not sketch data
          val corpus = spark.read.parquet(sketchDir).drop("batch")
          val dupPairs = Dedup.incrementalMinhashPairs(
            batchSketch, corpus, threshold, numHashes, bands)
          dupPairs.write.mode("overwrite")
            .parquet(s"$quarantineDir/batch=$batchId")
          // the two operators cache their (small) pair results for
          // reuse; an always-on gate must drop them per batch or the
          // executor cache grows by two tables every micro-batch
          inBatchPairs.unpersist(false)
          dupPairs.unpersist(false)
          // 3. admit everything not quarantined; grow the index.
          //    The quarantine parquet just written is re-read rather
          //    than recomputed: the probe pipeline ran once.
          val rejected = spark.read
            .parquet(s"$quarantineDir/batch=$batchId")
            .select(col("new_id").as("id")).distinct()
          val keptIds = batchSketch.select("id")
            .join(rejected, Seq("id"), "left_anti")
          docs.join(keptIds, docs(idCol) === keptIds("id"), "left_semi")
            .write.mode("overwrite").parquet(s"$admittedDir/batch=$batchId")
          batchSketch
            .join(rejected, Seq("id"), "left_anti")
            .write.mode("overwrite").parquet(s"$sketchDir/batch=$batchId")
          docs.unpersist()
          ()
        }
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    (spark.read.parquet(admittedDir).drop("batch"),
      spark.read.parquet(quarantineDir).drop("batch"))
  }
}
