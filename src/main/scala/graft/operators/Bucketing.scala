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
    // single-part names only: backtick-quoting a dotted name would
    // DROP a different identifier than saveAsTable writes
    require(!table.contains("."),
      s"writeBucketed takes a single-part table name, got '$table'")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // resolve the managed location through the catalog — it accounts
    // for the CURRENT database (<warehouse>/<db>.db/<name>); deriving
    // <warehouse>/<name> by hand is only right under `default` and
    // under any other current database would delete an unrelated
    // table's directory
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
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

  /** True if the executed plan contains any shuffle exchange — the
    * thing bucketing exists to eliminate. Matches every shuffle
    * flavor (hashpartitioning, rangepartitioning, SinglePartition,
    * RoundRobin) while NOT matching BroadcastExchange, whose node
    * name embeds the substring "Exchange " — a bare contains() check
    * would count broadcasts as shuffles, and the old
    * hashpartitioning-only check missed range/single-partition
    * shuffles entirely. */
  def hasShuffle(df: DataFrame): Boolean =
    "(?<![A-Za-z])Exchange ".r
      .findFirstIn(df.queryExecution.executedPlan.toString).isDefined
}
