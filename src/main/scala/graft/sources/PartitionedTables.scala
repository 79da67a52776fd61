package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hive-style partitioned layouts: write once partitioned by a
  * low-cardinality filter column (lang, source, date) so every
  * downstream query that filters on it PRUNES whole directories at
  * planning time — at 100 TB the difference between scanning 1/50th
  * of the corpus and all of it, before a single task launches.
  */
object PartitionedTables {

  /** Write partitioned parquet (one directory per distinct value of
    * `partitionCols`). Choose low-cardinality columns — every
    * distinct combination is a directory. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** True if the plan prunes partitions for this query: the scan's
    * PartitionFilters is non-empty. */
  def prunes(df: DataFrame): Boolean =
    "PartitionFilters: \\[[^\\]]".r
      .findFirstIn(df.queryExecution.executedPlan.toString).isDefined
}
