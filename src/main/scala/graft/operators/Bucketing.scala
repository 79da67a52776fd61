package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table utilities: pre-shuffle once at write time so
  * repeated fact-fact joins and aggregations on the bucket key run
  * with ZERO exchanges — the standard 100 TB pattern for a fact
  * table that is joined on the same key by many downstream queries
  * (lineitem ⋈ orders on orderkey, atoms ⋈ residues on entity key).
  *
  * Spark persists bucket metadata in the catalog; a join of two
  * tables bucketed by the same key into the same bucket count
  * produces a SortMergeJoin with no ShuffleExchange on either side.
  */
object Bucketing {

  /** Write `df` as a bucketed (+ sorted within buckets) managed
    * table. Sorting by the key makes the downstream sort-merge join
    * skip its sort too.
    *
    * Rerun-safe ACROSS sessions: with an in-memory catalog, a
    * previous JVM's managed-table DIRECTORY survives while its
    * catalog entry does not, and saveAsTable refuses to reuse the
    * orphaned location (LOCATION_ALREADY_EXISTS) — drop both the
    * table and any leftover directory first. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    numBuckets: Int): Unit = {
    // single-part names only: the orphan-location cleanup below maps
    // name → <warehouse>/<name>, which is wrong for db-qualified
    // tables (<warehouse>/<db>.db/<name>), and backtick-quoting a
    // dotted name would DROP a different identifier
    require(!table.contains("."),
      s"writeBucketed takes a single-part table name, got '$table'")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      table.toLowerCase(java.util.Locale.ROOT))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — plans with
    * no shuffle on either side (assert via hasShuffle in tests). */
  def bucketedJoin(spark: SparkSession, leftTable: String,
                   rightTable: String, keys: Seq[(String, String)],
                   how: String = "inner"): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    val cond = keys.map { case (a, b) => l(a) === r(b) }.reduce(_ && _)
    l.join(r, cond, how)
  }

  /** True if the executed plan contains any shuffle exchange —
    * the thing bucketing exists to eliminate. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
