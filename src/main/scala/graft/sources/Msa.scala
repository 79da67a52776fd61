package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multiple-sequence-alignment sources: FASTA records parsed
  * DISTRIBUTED — no driver-side line loop and no whole-file read.
  *
  * The trick: a FASTA record spans multiple lines but always starts
  * with '>'; reading with `lineSep = ">"` makes Spark split the input
  * into one row PER RECORD at arbitrary byte offsets, so a 100 TB
  * FASTA shards across executors like any text file. Each record row
  * is then parsed with codegen'd column expressions.
  *
  * reference: proteofav/msas.py:67 (parse_msa_sequences via BioPython
  * AlignIO, single-node) and msas.py:112-340 (description-regex
  * extraction into id/start/end columns).
  */
object Msa {

  /** Read FASTA: one row per record with (seq_id, description,
    * sequence). Sequence lines are concatenated with newlines
    * stripped. */
  def fasta(spark: SparkSession, path: String): DataFrame = {
    val recs = spark.read.option("lineSep", ">").text(path)
      .filter(length(trim(col("value"))) > 0)
    val header = substring_index(col("value"), "\n", 1)
    val body = expr("substring(value, length(substring_index(value, '\n', 1)) + 1)")
    recs.select(
      trim(substring_index(header, " ", 1)).as("seq_id"),
      trim(when(header.contains(" "),
        expr("substring(substring_index(value, '\n', 1), " +
          "length(substring_index(substring_index(value, '\n', 1), ' ', 1)) + 2)"))
        .otherwise(lit(""))).as("description"),
      regexp_replace(body, "[\\s]", "").as("sequence"))
  }

  /** Extract structured fields out of FASTA descriptions with a
    * regex — the msas.py description-parsing analog (e.g.
    * "UniRef90_P12345/57-316" → id, start, end). Pure codegen'd
    * regexp_extract. */
  def parseDescription(df: DataFrame, descCol: String = "seq_id")
  : DataFrame =
    df.withColumn("acc",
        regexp_extract(col(descCol), "^([^/]+)", 1))
      .withColumn("seq_start",
        regexp_extract(col(descCol), "/(\\d+)-", 1).cast("long"))
      .withColumn("seq_end",
        regexp_extract(col(descCol), "-(\\d+)$", 1).cast("long"))
}
