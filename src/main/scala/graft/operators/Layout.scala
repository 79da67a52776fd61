package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT for scan pruning — the Z-order
  * (Morton) clustering Delta/Iceberg expose as OPTIMIZE ZORDER BY.
  *
  * Why a layout operator belongs in a 100 TB engine: parquet
  * min/max footer stats prune files only along the sort order. A
  * corpus sorted by x answers x-range probes with few files but
  * y-range probes with ALL files; interleaving the bits of both
  * keys (z = x₀y₀x₁y₁…) makes every file a near-square RECTANGLE in
  * (x, y) space, so range probes on EITHER dimension touch
  * ~2^tileBits of 4^tileBits tiles instead of all of them. The
  * curve is computed with exact integer arithmetic end to end —
  * grid normalization is one integer range-scale, the interleave a
  * fixed fold of shift/and/or — so any engine replays the
  * assignment bit-identically.
  */
object Layout {

  /** Exact integer range-normalization of `v` onto [0, 2^bits):
    * floor((v − min) · 2^bits / (max − min + 1)). All-long
    * arithmetic (`div`, not `/` — the double divide misrounds past
    * 2^53); a range wide enough to overflow the scale product fails
    * loudly instead of wrapping. Degenerate min == max maps to 0. */
  def normalizeToGrid(v: Column, minV: Column, maxV: Column, bits: Int)
  : Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val range = maxV.cast("long") - minV.cast("long") + 1L
    val guarded = when(range > lit(Long.MaxValue >> bits),
      raise_error(lit(s"normalizeToGrid: value range overflows the " +
        s"2^$bits grid scale"))).otherwise(range)
    call_function("div",
      (v.cast("long") - minV.cast("long")) * (1L << bits), guarded)
  }

  /** Morton interleave of two grid coordinates in [0, 2^bits):
    * bit b of x lands at z-bit 2b, bit b of y at 2b+1. A fixed
    * shift/and/sum fold — whole-stage-codegen, zero data movement. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { b =>
      shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b) +
        shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1)
    }.reduce(_ + _)
  }

  /** Adds the z-curve columns to `df`: grid coords (`zx`, `zy` in
    * [0, 2^bits)), the full z-value `zval`, and `tile_id` = the top
    * 2·tileBits z-bits — i.e. the interleave of the top tileBits of
    * each grid coordinate, which makes every tile an EXACT
    * axis-aligned rectangle of the grid (2^(bits−tileBits) cells a
    * side; the property the pruning claim rests on, spec-pinned).
    * The min/max normalization bounds come from one 1-row aggregate
    * broadcast back onto the scan — no shuffle of `df` itself. */
  def withZOrder(df: DataFrame, xCol: String, yCol: String,
                 bits: Int = 16, tileBits: Int = 4): DataFrame = {
    require(tileBits >= 1 && tileBits <= bits,
      s"tileBits must be in [1,bits], got $tileBits (bits=$bits)")
    val reserved = df.columns.toSet
      .intersect(Set("zx", "zy", "zval", "tile_id",
        "__xmin", "__xmax", "__ymin", "__ymax"))
    require(reserved.isEmpty,
      s"withZOrder reserves column name(s) ${reserved.mkString(", ")}")
    val mm = df.agg(
      min(col(xCol)).cast("long").as("__xmin"),
      max(col(xCol)).cast("long").as("__xmax"),
      min(col(yCol)).cast("long").as("__ymin"),
      max(col(yCol)).cast("long").as("__ymax"))
    df.crossJoin(broadcast(mm))
      .withColumn("zx",
        normalizeToGrid(col(xCol), col("__xmin"), col("__xmax"), bits))
      .withColumn("zy",
        normalizeToGrid(col(yCol), col("__ymin"), col("__ymax"), bits))
      .withColumn("zval", zValue(col("zx"), col("zy"), bits))
      .withColumn("tile_id",
        shiftright(col("zval"), 2 * (bits - tileBits)))
      .drop("__xmin", "__xmax", "__ymin", "__ymax")
  }

  /** Per-tile layout statistics — the table a file-skipping planner
    * reads (one row per would-be file): row count, raw min/max of
    * both dimensions, and the de-interleaved tile grid coordinates
    * (`gx`, `gy`) that name the tile's rectangle. One map-side-
    * combined aggregation over ≤ 4^tileBits keys. */
  def zorderStats(df: DataFrame, xCol: String, yCol: String,
                  bits: Int = 16, tileBits: Int = 4): DataFrame = {
    val deinterleave = (src: Column, phase: Int) =>
      (0 until tileBits).map { b =>
        shiftleft(shiftright(src, 2 * b + phase).bitwiseAND(lit(1L)), b)
      }.reduce(_ + _)
    withZOrder(df, xCol, yCol, bits, tileBits)
      .groupBy("tile_id")
      .agg(
        count(lit(1)).as("n_rows"),
        min(col(xCol)).cast("long").as("min_x"),
        max(col(xCol)).cast("long").as("max_x"),
        min(col(yCol)).cast("long").as("min_y"),
        max(col(yCol)).cast("long").as("max_y"))
      .withColumn("gx", deinterleave(col("tile_id"), 0))
      .withColumn("gy", deinterleave(col("tile_id"), 1))
  }

  /** Physically lay the data down in z order: range-partition on
    * `zval` into nFiles tasks (contiguous z ranges → contiguous
    * tiles per file), sort within each, one parquet file per task.
    * Every file's footer then carries TIGHT min/max on BOTH
    * dimensions — the on-disk form of [[zorderStats]]'s rectangles.
    * The z columns are dropped before the write: they are layout,
    * not data, and re-deriving them is one scan-stage expression. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
                    path: String, nFiles: Int, bits: Int = 16): Unit = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    withZOrder(df, xCol, yCol, bits, tileBits = 1)
      .repartitionByRange(nFiles, col("zval"))
      .sortWithinPartitions("zval")
      .drop("zx", "zy", "zval", "tile_id")
      .write.mode("overwrite").parquet(path)
  }

  /** SMALL-FILE COMPACTION (the other half of OPTIMIZE next to
    * Z-order): rewrite a parquet table dir — flat or hive-partitioned
    * (`key=value` subdirs) — into ≈`targetBytes` files, contents
    * identical, partition layout preserved. The small-files problem
    * is THE operational tax of incremental ingest at 100 TB: every
    * streaming trigger and every dynamic-partition overwrite lands
    * another handful of KB–MB files, and a year later the scan
    * planner spends longer listing/opening footers than reading data.
    *
    * Shape (the Delta/Iceberg OPTIMIZE discipline): the driver lists
    * file sizes per partition dir (metadata-only, O(files) names —
    * the WarcIngest listing precedent), computes each partition's
    * output count n_p = ceil(bytes_p / targetBytes), and schedules
    * one tiny job per partition, `maxConcurrent` at a time (Delta
    * runs per-partition compaction bins exactly this way — job count
    * O(partitions), each job reads only that partition's files). Each
    * job is read → `coalesce(n_p)` → overwrite-into-`dstDir`:
    * coalesce merges read splits WITHOUT a shuffle — compaction moves
    * every byte once, network-free. Reading a leaf dir directly drops
    * the hive column from the data, and writing the same relative dir
    * under `dstDir` reconstructs it — so reading dstDir's ROOT
    * re-derives partition columns exactly as srcDir did.
    *
    * NOT in-place: compacting a live table under readers is a
    * transaction-log problem (Delta's job); this produces a new dir
    * the caller swaps in. `dstDir` is wiped first (rerun-safe, and a
    * half-written prior attempt can never mix with a fresh one).
    *
    * @return one report row per partition:
    *         (partition, files_before, bytes_before, files_after) —
    *         "" is the flat-table partition
    */
  def compactTable(spark: org.apache.spark.sql.SparkSession,
                   srcDir: String, dstDir: String, targetBytes: Long,
                   maxConcurrent: Int = 8): DataFrame = {
    require(targetBytes >= 1L, s"targetBytes must be >= 1, got $targetBytes")
    require(maxConcurrent >= 1,
      s"maxConcurrent must be >= 1, got $maxConcurrent")
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(srcDir)
    val fs = src.getFileSystem(conf)
    require(fs.exists(src), s"srcDir '$srcDir' does not exist")
    val dst = new org.apache.hadoop.fs.Path(dstDir)
    require(fs.makeQualified(dst) != fs.makeQualified(src),
      "compaction is not in-place: dstDir must differ from srcDir")
    if (fs.exists(dst)) fs.delete(dst, true)
    // partition dir -> its data files (driver-side, metadata-only)
    def dataFiles(rootDir: String): Seq[(String, Long)] = {
      val root = new org.apache.hadoop.fs.Path(rootDir)
      val rootUri = fs.makeQualified(root).toString
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      val it = fs.listFiles(root, true)
      while (it.hasNext) {
        val st = it.next()
        val name = st.getPath.getName
        // skip commit markers and hidden files, keep data files
        if (st.isFile && !name.startsWith("_") && !name.startsWith(".")) {
          out += ((fs.makeQualified(st.getPath).toString
            .stripPrefix(rootUri).stripPrefix("/"), st.getLen))
        }
      }
      out.toSeq
    }
    def byDir(fls: Seq[(String, Long)]): Map[String, Seq[(String, Long)]] =
      fls.groupBy { case (rel, _) =>
        val cut = rel.lastIndexOf('/')
        if (cut < 0) "" else rel.substring(0, cut)
      }
    val byPart = byDir(dataFiles(srcDir)).toSeq.sortBy(_._1)
    val plan = byPart.map { case (part, fls) =>
      val bytes = fls.map(_._2).sum
      (part, fls.size.toLong, bytes,
        math.max(1L, (bytes + targetBytes - 1L) / targetBytes).toInt)
    }
    // Already-small hive partitions (n = 1) compact in ONE Spark job:
    // repartition on the partition columns puts each key in exactly
    // one task, and partitionBy then emits exactly one file per key.
    // This trades the per-partition-job floor (measured ~0.2 s each —
    // hours at 10k partitions) for ONE bounded shuffle: every batched
    // partition is <= targetBytes by definition, so the moved volume
    // is <= parts × target and no task is ever skew-hot. Partitions
    // needing a SPLIT (n > 1) and the flat "" table keep the
    // per-partition coalesce path — shuffle-free, a handful of jobs.
    val (batched, jobs) = plan.partition { case (p, _, _, n) =>
      n == 1 && p.nonEmpty
    }
    if (batched.nonEmpty) {
      val partCols = batched.head._1.split('/')
        .map(_.split("=", 2)(0)).toSeq
      require(batched.forall(_._1.split('/')
          .map(_.split("=", 2)(0)).toSeq == partCols),
        "inconsistent partition column layout under srcDir")
      // partition values must round-trip VERBATIM: disable type
      // inference so 'pk=01' cannot re-render as 'pk=1'
      val infKey =
        "spark.sql.sources.partitionColumnTypeInference.enabled"
      val prev = spark.conf.get(infKey, "true")
      spark.conf.set(infKey, "false")
      try {
        spark.read.option("basePath", srcDir)
          .parquet(batched.map(b => s"$srcDir/${b._1}"): _*)
          .repartition(partCols.map(col): _*)
          .write.partitionBy(partCols: _*)
          .mode("append").parquet(dstDir) // dst was wiped: append-safe
      } finally spark.conf.set(infKey, prev)
    }
    if (jobs.nonEmpty) {
      // shared schema: ONE footer read instead of one per job (the
      // other measured per-job constant); files missing columns of a
      // later schema read them as null, the parquet contract
      val schema = spark.read.parquet(jobs.head._1 match {
        case "" => srcDir
        case p => s"$srcDir/$p"
      }).schema
      import java.util.concurrent.Executors
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = Executors.newFixedThreadPool(maxConcurrent)
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutorService(pool)
      try {
        jobs.map { case (part, _, _, n) =>
          Future {
            val sub = if (part.isEmpty) "" else s"/$part"
            spark.read.schema(schema).parquet(s"$srcDir$sub")
              .coalesce(n)
              .write.mode("overwrite").parquet(s"$dstDir$sub")
          }
        }.foreach(Await.result(_, Duration.Inf))
      } finally pool.shutdown()
    }
    // ONE recursive listing of dstDir reports files_after for every
    // partition — no per-partition listStatus round-trips. An empty
    // source (zero data files) writes nothing and never creates
    // dstDir — report an empty table instead of listing a missing path
    val after =
      if (plan.isEmpty || !fs.exists(dst)) Map.empty[String, Long]
      else byDir(dataFiles(dstDir)).map { case (p, fls) =>
        p -> fls.size.toLong
      }
    import spark.implicits._
    plan.map { case (part, nf, bytes, _) =>
      (part, nf, bytes, after.getOrElse(part, 0L))
    }.toDF("partition", "files_before", "bytes_before", "files_after")
  }
}
