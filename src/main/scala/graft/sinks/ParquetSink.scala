package graft.sinks

import org.apache.spark.sql.DataFrame

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
}
