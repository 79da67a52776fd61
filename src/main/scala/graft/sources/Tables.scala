package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet star-schema loaders for the driver testdata.
  *
  * Analog of ProteoFAV's per-source `select_*` entry points
  * (reference: proteofav/structures.py:739, dssp.py:318, sifts.py:353)
  * — each source exposes a lazily-planned DataFrame; Catalyst handles
  * projection/predicate pushdown into the parquet scan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeNanoTs(spark.read.parquet(s"$dir/$name.parquet"))

  /** Normalize the event-time column `ts` to a plain (UTC-instant)
    * microsecond TimestampType regardless of how the parquet writer
    * annotated it. Two historical shapes of the driver testdata:
    *
    *  - TIMESTAMP(NANOS): arrives as LongType nanos when
    *    `spark.sql.legacy.parquet.nanosAsLong` is set (Spark has no
    *    native nanos type). `ns div 1000` floor-truncation — the same
    *    conversion DuckDB applies reading the same file.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
    *    TIMESTAMP_NTZ, which `unix_micros` / watermarks reject. Under
    *    a UTC session the NTZ→TIMESTAMP cast is value-preserving and
    *    matches DuckDB's read of the same column.
    *
    * Sessions we own also set
    * `spark.sql.parquet.inferTimestampNTZ.enabled=false` so inference
    * never produces NTZ in the first place; this cast is the
    * defense for externally-built sessions. */
  def normalizeNanoTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema.fields.filter(_.name == "ts").foldLeft(df) { (d, f) =>
      f.dataType match {
        case LongType => d.withColumn(f.name,
          timestamp_micros(call_function("div", col(f.name), lit(1000L))))
        case TimestampNTZType =>
          d.withColumn(f.name, col(f.name).cast(TimestampType))
        case _ => d
      }
    }
  }

  /** Typed loaders — `Dataset[T]` with case-class encoders for
    * pipelines that want compile-time column safety. */
  object typed {
    import graft.model._
    import org.apache.spark.sql.Dataset
    def lineitem(s: SparkSession, d: String): Dataset[Lineitem] =
      { import s.implicits._; load(s, d, "lineitem").as[Lineitem] }
    def orders(s: SparkSession, d: String): Dataset[Order] =
      { import s.implicits._; load(s, d, "orders").as[Order] }
    def events(s: SparkSession, d: String): Dataset[Event] =
      { import s.implicits._; load(s, d, "events").as[Event] }
    def documents(s: SparkSession, d: String): Dataset[Document] =
      { import s.implicits._; load(s, d, "documents").as[Document] }
    def embeddings(s: SparkSession, d: String): Dataset[Embedding] =
      { import s.implicits._; load(s, d, "embeddings").as[Embedding] }
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
