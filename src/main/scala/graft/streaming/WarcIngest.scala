package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Warc

/** Incremental WARC ingest — the file-trigger loop OSS Spark's
  * Structured Streaming cannot express directly (`binaryFile` is a
  * batch-only source), built the way production crawl landing zones
  * are actually drained: each [[ingestOnce]] call is one trigger;
  * WARC files that appeared (or changed) since the last committed
  * trigger are parsed and added to a cumulative record table,
  * everything already ingested is skipped, and a crash at ANY point
  * costs duplicate work, never duplicate rows.
  *
  * Layout under `outDir`:
  *   - `records/` — cumulative [[Warc.recordSchema]] rows plus
  *     (`src_hash`, `batch`), PARTITIONED BY `src_hash` = md5 of the
  *     source file path. The partition unit is the source FILE,
  *     which is what makes replays idempotent: a re-ingested file
  *     dynamically overwrites its own partition and no other.
  *   - `manifest/b<N>/` — append-only per-trigger manifest
  *     directories (file, size, mtime, n_records, batch), each
  *     written to a temp dir and atomically RENAMED in: the rename
  *     is the commit point, after which the trigger's files stop
  *     being "new".
  *
  * Crash-window argument (the IngestGate compaction discipline,
  * steps ordered so every window self-heals):
  *   1. dynamic-partition-overwrite the fresh files' records,
  *   2. read per-file counts back from the DURABLE records table
  *      (the manifest reports what is actually on disk),
  *   3. write the manifest to `manifest_tmp_<N>`, 4. rename to
  *      `manifest/b<N>`.
  * A crash before 4 leaves the trigger uncommitted: the next call
  * re-lists the same files as fresh and step 1 replaces their
  * partitions byte-for-byte. Stale temp dirs are swept at entry.
  * Single-writer, like a Structured Streaming checkpoint dir —
  * concurrent triggers on one `outDir` are not supported.
  *
  * Scale shape: the listing is METADATA-ONLY — `binaryFile` prunes
  * the `content` column when only (path, length, modificationTime)
  * are selected — and the manifest diff is a driver-side map over
  * file COUNT (~1e5 entries per Common Crawl snapshot; bytes never
  * touch the driver). Parsing runs one task per fresh file
  * ([[Warc.read]]'s model); the count read-back prunes to the fresh
  * files' partitions only. Nothing here shuffles.
  */
object WarcIngest {

  /** One ingest trigger. Returns the per-file summary of what THIS
    * call ingested: (file, size, mtime, n_records, batch) — empty
    * (zero rows, same schema) when the landing dir holds nothing
    * new. `batch` increments per committed trigger; re-ingested
    * (changed) files move to the new batch.
    *
    * Freshness contract: a file is "already ingested" iff its
    * (path, size, mtime) triple matches the manifest. Two
    * consequences callers must accept (or pre-process around):
    * a landing file OVERWRITTEN IN PLACE with different content of
    * identical byte length within the filesystem's mtime granularity
    * is treated as unchanged and silently skipped; and a gzip-corrupt
    * file commits with n_records = 0 (the visible quarantine) and is
    * NOT retried if later fixed in place with the same size and
    * mtime. Both are the standard object-store trade — crawl landing
    * zones write immutable, uniquely-named files, where (size,
    * mtime) equality is exact. A landing zone that rewrites files in
    * place needs a content-hash column in the manifest (one
    * full-file digest pass per trigger — deliberately not paid
    * here). */
  def ingestOnce(spark: SparkSession, warcDir: String,
                 outDir: String): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(outDir).getFileSystem(conf)
    fs.mkdirs(new Path(outDir, "manifest"))
    // sweep uncommitted temp manifests from a crashed prior trigger
    Option(fs.globStatus(new Path(outDir, "manifest_tmp_*")))
      .getOrElse(Array.empty)
      .foreach(s => fs.delete(s.getPath, true))

    val empty = Seq.empty[(String, Long, Long, Long, Long)]
      .toDF("file", "size", "mtime", "n_records", "batch")
    val landing = new Path(warcDir)
    if (!landing.getFileSystem(conf).exists(landing)) return empty

    // list through binaryFile (not fs.listStatus) so the path
    // STRINGS are rendered by the same code that later stamps the
    // records' `file` column — the manifest diff and the md5
    // partition key both depend on byte-equal paths
    val listed = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true").load(warcDir)
      .select(col("path"), col("length"),
        unix_micros(col("modificationTime")).as("mtime"))
      .where(col("path").endsWith(".warc") ||
        col("path").endsWith(".warc.gz"))
      .as[(String, Long, Long)].collect()

    val committed = Option(fs.globStatus(new Path(outDir, "manifest/b*")))
      .getOrElse(Array.empty).map(_.getPath.toString)
    val (seen, maxBatch) =
      if (committed.isEmpty) (Map.empty[String, (Long, Long)], 0L)
      else {
        val m = spark.read.parquet(committed.toIndexedSeq: _*)
          .select("file", "size", "mtime", "batch")
          .as[(String, Long, Long, Long)].collect()
        // a re-ingested file appears in several batches: the LATEST
        // batch's row is its committed state
        (m.groupBy(_._1).map { case (f, rs) =>
          val r = rs.maxBy(_._4); f -> (r._2, r._3)
        }, m.iterator.map(_._4).max)
      }
    val fresh = listed.filter { case (p, sz, mt) =>
      !seen.get(p).contains((sz, mt))
    }
    if (fresh.isEmpty) return empty

    val batch = maxBatch + 1
    val recDir = s"$outDir/records"
    Warc.read(spark, fresh.map(_._1).toIndexedSeq)
      .withColumn("src_hash", md5(col("file")))
      .withColumn("batch", lit(batch))
      .write.partitionBy("src_hash")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(recDir)

    // counts from the durable table, read back by EXPLICIT fresh
    // partition paths: a plain read of recDir would re-discover every
    // src_hash partition directory ever ingested (measured LINEAR in
    // total file count — 3.0 s at 1k files, 14.6 s at 10k, even with
    // an isin prune, because discovery lists before pruning), while
    // the path list here is O(delta). A zero-record fresh file (the
    // gzip quarantine) writes no partition dir — existence-filter the
    // paths and let getOrElse record its 0. The batch filter keeps
    // only rows THIS trigger wrote: a re-ingested file that now
    // parses to 0 records writes nothing, so its partition dir still
    // holds the PREVIOUS batch's rows — without the filter those
    // stale rows would be attributed to the fresh file.
    val freshPaths = fresh
      .map(f => (f._1, s"$recDir/src_hash=${md5Hex(f._1)}"))
      .filter(p => fs.exists(new Path(p._2)))
    val counts =
      if (freshPaths.isEmpty) Map.empty[String, Long]
      else spark.read.option("basePath", recDir)
        .parquet(freshPaths.map(_._2).toIndexedSeq: _*)
        .where(col("batch") === batch)
        .groupBy("file").count()
        .as[(String, Long)].collect().toMap
    // honor the "re-ingest overwrites its own partition" contract for
    // the zero-record case dynamic overwrite can't express: delete
    // the stale partition of any fresh file that produced no rows.
    // Crash between this delete and the manifest rename self-heals —
    // the file is still fresh to the next trigger, which re-parses
    // it to 0 records and commits the 0.
    freshPaths.foreach { case (f, p) =>
      if (counts.getOrElse(f, 0L) == 0L) fs.delete(new Path(p), true)
    }
    val summary = fresh.toIndexedSeq.map { case (p, sz, mt) =>
      (p, sz, mt, counts.getOrElse(p, 0L), batch)
    }.toDF("file", "size", "mtime", "n_records", "batch")

    val tmp = new Path(outDir, s"manifest_tmp_$batch")
    summary.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val dest = new Path(outDir, s"manifest/b$batch")
    if (!fs.rename(tmp, dest))
      throw new IllegalStateException(
        s"manifest commit rename failed: $tmp -> $dest " +
          "(concurrent trigger on the same outDir?)")
    summary
  }

  /** The cumulative record table: [[Warc.recordSchema]] columns plus
    * `batch` (the trigger that ingested each row) and the `src_hash`
    * partition key. Empty (with the full schema) before the first
    * non-empty trigger — so a caller chaining ingest → prepare over
    * a still-empty landing zone composes instead of crashing. */
  def records(spark: SparkSession, outDir: String): DataFrame = {
    val recPath = new Path(s"$outDir/records")
    val fs = recPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // partition dirs, not just the root: a records dir whose every
    // partition was quarantine-deleted has nothing to infer a schema
    // from and must compose as empty, same as the never-written case
    val hasParts = fs.exists(recPath) &&
      Option(fs.globStatus(new Path(recPath, "src_hash=*")))
        .getOrElse(Array.empty).nonEmpty
    if (hasParts) spark.read.parquet(recPath.toString)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(
        Warc.recordSchema.fields ++ Seq(
          org.apache.spark.sql.types.StructField("batch",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("src_hash",
            org.apache.spark.sql.types.StringType, nullable = true))))
  }

  /** Driver-side md5 hex, byte-equal to Spark's `md5()` of the same
    * UTF-8 string — the partition-prune key must match the value the
    * executor-side `md5(col("file"))` wrote. */
  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
}
