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

  /** Read Stockholm MSAs: one row per (file, seq_id) with the
    * gapped alignment and the ungapped sequence.
    *
    * Stockholm interleaves sequences in blocks with no per-record
    * separator, so the FASTA lineSep trick cannot shard a single
    * file. The natural 100 TB unit is the FILE: Pfam/CATH ship one
    * family per file (thousands of files), so `wholetext` reads each
    * file as one row and families parallelize across executors;
    * within a file, lines are split/parsed with codegen'd column
    * expressions. Multi-block alignments concatenate each id's
    * fragments in line order (posexplode index). `#=..` annotations,
    * the header and the `//` terminator are filtered out.
    *
    * reference: proteofav/msas.py:32-54 (AlignIO stockholm branch)
    * and msas.py:207-253 (Pfam/CATH `NAME/start-end` descriptions —
    * parse with [[parseDescription]]). */
  def stockholm(spark: SparkSession, path: String): DataFrame = {
    val files = spark.read.option("wholetext", "true").text(path)
      .select(input_file_name().as("src_file"), col("value"))
    val lines = files.select(col("src_file"),
      posexplode(split(col("value"), "\n")).as(Seq("line_no", "line")))
    val body = lines
      .filter(!col("line").startsWith("#") && !col("line").startsWith("//") &&
        length(trim(col("line"))) > 0)
      .select(col("src_file"), col("line_no"),
        regexp_extract(col("line"), "^(\\S+)\\s+(\\S+)\\s*$", 1).as("seq_id"),
        regexp_extract(col("line"), "^(\\S+)\\s+(\\S+)\\s*$", 2).as("frag"))
      .filter(col("seq_id") =!= "")
    body.groupBy(col("src_file"), col("seq_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("line_no"), col("frag")))),
        s => s.getField("frag")), "").as("aligned"))
      .withColumn("sequence",
        regexp_replace(col("aligned"), "[.\\-]", ""))
  }

  /** Sequence sanity normalization: uppercase, swap the gap symbol,
    * and map any non-standard residue letter to the ambiguous
    * symbol. Column-level, codegen'd.
    * reference: proteofav/utils.py:356 (check_sequence). */
  def normalizeSequence(seq: org.apache.spark.sql.Column,
                        gapSymbol: String = "-", newGapSymbol: String = "-",
                        ambiguous: String = "X"): org.apache.spark.sql.Column =
    regexp_replace(
      translate(upper(seq), gapSymbol, newGapSymbol),
      "[^ACDEFGHIKLMNPQRSTVWYX" +
        java.util.regex.Pattern.quote(newGapSymbol) + "]", ambiguous)

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
