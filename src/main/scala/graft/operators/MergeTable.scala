package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** KEYED MERGE (upsert / delete) into a bucket-partitioned table
  * with a commit manifest — the one operator a large-scale corpus
  * pipeline needs to "apply this day's admitted/quarantined delta to
  * the corpus table" with snapshot isolation, instead of hand-rolling
  * exactly-once per call site (the E9 foreachBatch upsert, the J41
  * ingest manifest and the L27 dir-swap each solved a slice of this;
  * this is the generalized table).
  *
  * reference analog: the reference's `merge_tables`/update flows
  * (proteofav/structures.py table merging) mutate in-memory pandas
  * frames; at 100 TB "update the table" must be an incremental
  * rewrite of only the touched fraction of a durable table, with
  * readers never observing a half-applied batch.
  *
  * Layout under `tableDir` (a miniature of the Delta/Iceberg commit
  * model, built from the J41 temp-write + atomic-rename commit
  * point):
  *   - `data/v<N>/kb=<bucket>/` parquet — immutable version-stamped
  *     bucket data. `kb` = pmod(xxhash64(key columns), nBuckets): the
  *     HASH-BUCKET partitioning that makes a delta touch O(delta
  *     buckets), never the full table.
  *   - `manifest/v<N>/` — the committed per-bucket pointer map
  *     (`kb` → version whose dir holds that bucket's CURRENT rows;
  *     ≤ nBuckets rows, driver-scale by construction). Written to
  *     `manifest_tmp_<N>` and atomically RENAMED in — the rename is
  *     the commit point and the ONLY mutation readers can observe.
  *
  * Snapshot isolation: [[snapshot]] resolves the LATEST committed
  * manifest and reads exactly the files it names. A merge in flight
  * writes only `data/v<N+1>/` (a dir no committed manifest
  * references), so concurrent readers keep seeing version N — the
  * pointer flip is atomic. Crash anywhere before the rename leaves
  * an ORPHAN data dir that no reader resolves; the next merge sweeps
  * every data/manifest-tmp dir above the committed version and
  * re-applies (duplicate work, never duplicate or torn rows — the
  * J41 crash-window discipline, spec-proven). Single-writer per
  * `tableDir`, like a Structured Streaming checkpoint dir.
  *
  * Merge semantics per delta row, MERGE-standard: key present in the
  * table → replaced (or deleted when the delete flag is set); key
  * absent → inserted (delete of an absent key is a no-op). Delta
  * keys must be UNIQUE — guarded loudly with the measured duplicate
  * count (the boundedGroupRows discipline): "last writer wins within
  * one batch" is a silent-corruption generator, not a semantics.
  *
  * Scale shape: the delta is bucketed by the SAME hash as the table,
  * touched buckets are its distinct `kb` values (≤ nBuckets longs to
  * the driver — bounded by construction), and the rewrite reads ONLY
  * those buckets' current files. The anti-join (survivors) + union
  * shuffles at most |touched buckets' data| + |delta| rows on the
  * key; untouched buckets move ZERO bytes — their pointers carry
  * over. nBuckets trades rewrite amplification (rows moved per
  * delta row ≈ bucket size) against small-file pressure; [[compact]]
  * folds a version-fragmented bucket's files back together through
  * the SAME commit path, and [[vacuum]] deletes version dirs no
  * current pointer references.
  */
object MergeTable {

  private def fsOf(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed versions, ascending (empty for a not-yet-created
    * table). */
  private def committedVersions(spark: SparkSession, tableDir: String)
  : Seq[Long] = {
    val fs = fsOf(spark, tableDir)
    Option(fs.globStatus(new Path(tableDir, "manifest/v*")))
      .getOrElse(Array.empty).toIndexedSeq
      .map(_.getPath.getName.stripPrefix("v").toLong).sorted
  }

  /** The latest committed per-bucket pointer map: kb → version. */
  private def pointerMap(spark: SparkSession, tableDir: String)
  : Map[Int, Long] = committedVersions(spark, tableDir).lastOption match {
    case None => Map.empty
    case Some(v) =>
      import spark.implicits._
      spark.read.parquet(s"$tableDir/manifest/v$v")
        .select(col("kb").cast("int"), col("version").cast("long"))
        .as[(Int, Long)].collect().toMap
  }

  /** Read the buckets named by `pointers` — grouped by version so
    * each group reads under its own basePath and `kb` comes back as
    * a partition column. */
  private def readBuckets(spark: SparkSession, tableDir: String,
                          pointers: Map[Int, Long]): Option[DataFrame] = {
    val byVersion = pointers.groupBy(_._2).toSeq.sortBy(_._1)
    val parts = byVersion.map { case (v, kbs) =>
      spark.read.option("basePath", s"$tableDir/data/v$v")
        .parquet(kbs.keys.toSeq.sorted
          .map(b => s"$tableDir/data/v$v/kb=$b"): _*)
    }
    parts.reduceOption(_ unionByName _)
  }

  /** The table's current committed contents (with the `kb` bucket
    * column). Fails loudly on a table with no committed version —
    * creation IS the first [[merge]]. */
  def snapshot(spark: SparkSession, tableDir: String): DataFrame = {
    val ptrs = pointerMap(spark, tableDir)
    require(ptrs.nonEmpty || committedVersions(spark, tableDir).nonEmpty,
      s"MergeTable at '$tableDir' has no committed version — " +
        "the first merge() creates the table")
    readBuckets(spark, tableDir, ptrs).getOrElse {
      // a committed but fully-deleted table: empty, manifest schema
      // has no data columns to offer — zero-row, zero-column frame
      spark.emptyDataFrame
    }
  }

  /** Sweep every data dir / manifest temp above the committed
    * version — the self-heal step a crashed merge left behind. */
  private def sweepOrphans(spark: SparkSession, tableDir: String,
                           committedMax: Long): Unit = {
    val fs = fsOf(spark, tableDir)
    Option(fs.globStatus(new Path(tableDir, "data/v*")))
      .getOrElse(Array.empty)
      .filter(_.getPath.getName.stripPrefix("v").toLong > committedMax)
      .foreach(s => fs.delete(s.getPath, true))
    Option(fs.globStatus(new Path(tableDir, "manifest_tmp_*")))
      .getOrElse(Array.empty)
      .foreach(s => fs.delete(s.getPath, true))
  }

  /** Atomically commit `pointers` as version `v`. */
  private def commitManifest(spark: SparkSession, tableDir: String,
                             v: Long, pointers: Map[Int, Long]): Unit = {
    import spark.implicits._
    val fs = fsOf(spark, tableDir)
    fs.mkdirs(new Path(tableDir, "manifest"))
    val tmp = new Path(tableDir, s"manifest_tmp_$v")
    pointers.toSeq.sortBy(_._1).toDF("kb", "version")
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val dest = new Path(tableDir, s"manifest/v$v")
    if (!fs.rename(tmp, dest))
      throw new IllegalStateException(
        s"manifest commit rename failed: $tmp -> $dest " +
          "(concurrent writer on the same tableDir?)")
  }

  /** Apply one delta batch. `delta`'s columns are the table schema;
    * when `deleteCol` is set, that boolean column marks delete rows
    * and is NOT stored. Returns a one-row report:
    * (version, n_upserts, n_deletes, n_buckets_touched,
    * n_buckets_live). */
  def merge(spark: SparkSession, tableDir: String, delta: DataFrame,
            keyCols: Seq[String], nBuckets: Int = 64,
            deleteCol: Option[String] = None): DataFrame = {
    import spark.implicits._
    require(keyCols.nonEmpty, "merge needs at least one key column")
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    keyCols.foreach(k => require(delta.columns.contains(k),
      s"delta is missing key column '$k'"))
    deleteCol.foreach(c => require(delta.columns.contains(c),
      s"delta is missing delete column '$c'"))

    val committed = committedVersions(spark, tableDir)
    val committedMax = committed.lastOption.getOrElse(0L)
    sweepOrphans(spark, tableDir, committedMax)
    val ptrs = pointerMap(spark, tableDir)
    require(ptrs.isEmpty || committed.nonEmpty, "inconsistent manifest")

    val kb = pmod(xxhash64(keyCols.map(col): _*), lit(nBuckets.toLong))
      .cast("int")
    val isDel = deleteCol.map(col(_).cast("boolean"))
      .getOrElse(lit(false))
    val d = delta.withColumn("__kb", kb).withColumn("__del", isDel)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE delta pass for every admission stat (r17 — this ran as four
    // jobs: dup-key count, touched-bucket collect, upsert count,
    // total count): per-key rollup first (also materializes the
    // persist), then a single bounded second aggregate — collect_set
    // over <= nBuckets ints and first(__kb) is key-deterministic
    // (the bucket is a pure key hash).
    val st = d.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__del"), 1L).otherwise(0L)).as("__nd"),
        first(col("__kb")).as("__kb1"))
      .agg(coalesce(sum(when(col("__n") > 1L, 1L).otherwise(0L)), lit(0L))
          .as("dup"),
        coalesce(sum(col("__n")), lit(0L)).as("total"),
        coalesce(sum(col("__nd")), lit(0L)).as("ndel"),
        collect_set(col("__kb1")).as("bks"))
      .head()
    // unique-key contract, guarded with the measured count: a delta
    // carrying two rows for one key has no defined winner
    val dupKeys = st.getLong(0)
    require(dupKeys == 0L,
      s"merge delta has $dupKeys duplicate key(s) on " +
        s"(${keyCols.mkString(", ")}) — deltas must be key-unique")
    val touched = st.getSeq[Int](3).toSet // <= nBuckets ints
    val nDeletes = st.getLong(2)
    val nUpserts = st.getLong(1) - nDeletes

    val dataCols = delta.columns.filterNot(deleteCol.contains).toSeq
    val upserts = d.filter(!col("__del"))
      .select((dataCols.map(col) :+ col("__kb").as("kb")): _*)
    val basePtrs = ptrs.filter { case (b, _) => touched.contains(b) }
    val survivors = readBuckets(spark, tableDir, basePtrs) match {
      case None => upserts
      case Some(base) =>
        // survivors = current rows of touched buckets whose key is
        // NOT in the delta (upsert replaces, delete removes — both
        // are "old row drops out"); then the upserts come in
        base.select((dataCols.map(col) :+ col("kb").cast("int").as("kb")): _*)
          .join(d.select(keyCols.map(col): _*), keyCols, "left_anti")
          .unionByName(upserts)
    }

    val newV = committedMax + 1
    // cluster by bucket before the partitioned write (r17): without
    // it every upstream task writes a file into every touched kb=
    // dir — nTasks × nBuckets small files per version, which the
    // next merge's bucket reads then pay for; one exchange on kb
    // keeps it to one file per bucket per writing task-slot
    // (guide §6 output sizing)
    survivors.repartition(col("kb")).write.partitionBy("kb")
      .mode("overwrite").parquet(s"$tableDir/data/v$newV")
    d.unpersist(false)

    // buckets that still exist after the rewrite (a fully-deleted
    // bucket writes no dir and leaves the map)
    val fs = fsOf(spark, tableDir)
    val written = Option(fs.globStatus(
        new Path(s"$tableDir/data/v$newV", "kb=*")))
      .getOrElse(Array.empty)
      .map(_.getPath.getName.stripPrefix("kb=").toInt).toSet
    val newPtrs = (ptrs -- touched) ++ written.map(_ -> newV)
    commitManifest(spark, tableDir, newV, newPtrs)

    Seq((newV, nUpserts, nDeletes, touched.size.toLong,
      newPtrs.size.toLong))
      .toDF("version", "n_upserts", "n_deletes",
        "n_buckets_touched", "n_buckets_live")
  }

  /** Fold each live bucket's files back to ≈`targetBytes` through
    * the SAME commit path as [[merge]] — the L27 compaction composed
    * against the manifest instead of raw dir listings: only buckets
    * that are actually fragmented (file count above their size
    * target) rewrite; every other pointer carries over untouched, and
    * the rewrite is per-bucket `coalesce` — split-merge without a
    * shuffle. Returns one row per live bucket:
    * (kb, files_before, bytes_before, files_after, rewritten). */
  def compact(spark: SparkSession, tableDir: String,
              targetBytes: Long = 128L << 20): DataFrame = {
    import spark.implicits._
    require(targetBytes >= 1L, s"targetBytes must be >= 1, got $targetBytes")
    val committed = committedVersions(spark, tableDir)
    require(committed.nonEmpty,
      s"MergeTable at '$tableDir' has no committed version")
    sweepOrphans(spark, tableDir, committed.last)
    val ptrs = pointerMap(spark, tableDir)
    val fs = fsOf(spark, tableDir)

    val stats = ptrs.toSeq.sortBy(_._1).map { case (b, v) =>
      val dir = new Path(s"$tableDir/data/v$v/kb=$b")
      val files = fs.listStatus(dir).filter(s => s.isFile &&
        !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      val bytes = files.map(_.getLen).sum
      val nOut = math.max(1L, (bytes + targetBytes - 1L) / targetBytes)
      (b, v, files.length.toLong, bytes, nOut)
    }
    val toRewrite = stats.filter { case (_, _, nf, _, nOut) => nf > nOut }
    if (toRewrite.isEmpty) {
      return stats.map { case (b, _, nf, bytes, _) =>
        (b, nf, bytes, nf, false)
      }.toDF("kb", "files_before", "bytes_before", "files_after",
        "rewritten")
    }
    val newV = committed.last + 1
    toRewrite.foreach { case (b, v, _, _, nOut) =>
      spark.read.parquet(s"$tableDir/data/v$v/kb=$b")
        .coalesce(nOut.toInt)
        .write.mode("overwrite")
        .parquet(s"$tableDir/data/v$newV/kb=$b")
    }
    val newPtrs = ptrs ++ toRewrite.map(r => r._1 -> newV)
    commitManifest(spark, tableDir, newV, newPtrs)
    val after = toRewrite.map { case (b, _, _, _, _) =>
      b -> fs.listStatus(new Path(s"$tableDir/data/v$newV/kb=$b"))
        .count(s => s.isFile && !s.getPath.getName.startsWith("_") &&
          !s.getPath.getName.startsWith("."))
        .toLong
    }.toMap
    stats.map { case (b, _, nf, bytes, _) =>
      (b, nf, bytes, after.getOrElse(b, nf), after.contains(b))
    }.toDF("kb", "files_before", "bytes_before", "files_after",
      "rewritten")
  }

  /** Delete every data version dir no CURRENT pointer references —
    * the GC that keeps a long-lived merge table from accumulating
    * one orphaned version per superseded bucket write. Time travel
    * is deliberately out of scope (only the latest manifest is ever
    * resolved), so reclamation is safe the moment the manifest
    * rename lands. Returns the reclaimed version numbers. */
  def vacuum(spark: SparkSession, tableDir: String): Seq[Long] = {
    val committed = committedVersions(spark, tableDir)
    require(committed.nonEmpty,
      s"MergeTable at '$tableDir' has no committed version")
    sweepOrphans(spark, tableDir, committed.last)
    val live = pointerMap(spark, tableDir).values.toSet
    val fs = fsOf(spark, tableDir)
    val dead = Option(fs.globStatus(new Path(tableDir, "data/v*")))
      .getOrElse(Array.empty).toIndexedSeq
      .map(_.getPath.getName.stripPrefix("v").toLong)
      .filterNot(live.contains).sorted
    dead.foreach(v => fs.delete(new Path(s"$tableDir/data/v$v"), true))
    // superseded manifests (all but the latest) go with them
    committed.dropRight(1).foreach(v =>
      fs.delete(new Path(s"$tableDir/manifest/v$v"), true))
    dead
  }
}
