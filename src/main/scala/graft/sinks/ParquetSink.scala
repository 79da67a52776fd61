package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Parquet layout hygiene for pipeline outputs.
  *
  * Dedup/filter stages shrink data massively (a 90%-dup corpus keeps
  * 10%), so their natural output is thousands of tiny files — and at
  * 100 TB the NEXT job becomes file-count-bound (driver listing +
  * one footer read per file) instead of byte-bound. Compaction sizes
  * the output to a target rows-per-file before writing.
  */
object ParquetSink {

  /** Write `df` as ~`targetRecordsPerFile`-row parquet files: one
    * count pass sizes an even repartition; `maxRecordsPerFile`
    * additionally caps stragglers if the repartition lands skewed.
    * The count pass is one extra scan of the (already small,
    * post-filter) output — the 100 TB alternative is AQE's
    * rebalance-on-write, same idea without the extra pass. */
  def writeCompacted(df: DataFrame, path: String,
                     targetRecordsPerFile: Long = 1000000L): Unit = {
    require(targetRecordsPerFile > 0)
    val n = df.count()
    val parts = math.max(1L,
      math.ceil(n.toDouble / targetRecordsPerFile).toLong).toInt
    df.repartition(parts).write.mode("overwrite")
      .option("maxRecordsPerFile", targetRecordsPerFile)
      .parquet(path)
  }

  /** Range-sorted layout for selective reads: repartitionByRange on
    * the predicate columns, sort within each partition, write. Every
    * parquet row group then covers a NARROW min/max band of the sort
    * key, so a later `WHERE key BETWEEN …` read skips whole row
    * groups (and with `nFiles` sized sensibly, whole files) via
    * footer statistics — the scan reads ~selectivity of the bytes
    * instead of all of them. This is the layout decision that makes
    * a 100 TB time-series table cheap to query by time: the sort is
    * paid ONCE at write, every downstream reader wins.
    *
    * `rowGroupBytes` caps the parquet block size — pruning
    * granularity IS row-group granularity, so a table meant for
    * narrow range reads wants smaller groups than the 128 MB
    * default (the tradeoff: more footer entries per file). */
  def writeRangeSorted(df: DataFrame, path: String, sortCols: Seq[String],
                       nFiles: Int = 32,
                       rowGroupBytes: Long = 8L * 1024 * 1024): Unit = {
    require(sortCols.nonEmpty && nFiles > 0)
    df.repartitionByRange(nFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes)
      .parquet(path)
  }
}
