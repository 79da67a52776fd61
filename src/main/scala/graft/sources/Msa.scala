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

  /** Read Clustal MSAs (.aln/.clw): one row per (file, seq_id) with
    * the gapped alignment and the ungapped sequence — the `clustal`
    * branch of read_alignments' seq_format dispatch
    * (proteofav/msas.py:32-65 via Bio.AlignIO).
    *
    * Same wholetext-per-file sharding as [[stockholm]] (Clustal also
    * interleaves blocks with no record separator). Within a file:
    * the mandatory first header line is dropped, conservation rows
    * (leading whitespace) and blanks are skipped, a trailing
    * cumulative-column count is tolerated, and multi-block fragments
    * concatenate per id in line order. A file whose first line does
    * not announce the format raises, as Biopython's ClustalIterator
    * does — an eager gate over the (file-count-sized) header set. */
  def clustal(spark: SparkSession, path: String): DataFrame = {
    val files = spark.read.option("wholetext", "true").text(path)
      .select(input_file_name().as("src_file"), col("value"))
    val badHeaders = files
      .filter(!substring_index(col("value"), "\n", 1)
        .rlike("^(CLUSTAL|MUSCLE|PROBCONS|MSAPROBS|Kalign)"))
      .limit(1).count()
    if (badHeaders > 0)
      throw new IllegalArgumentException(
        s"$path: not a Clustal file (header line must announce the format)")
    val lines = files.select(col("src_file"),
      posexplode(split(col("value"), "\n")).as(Seq("line_no", "line")))
    val rec = "^(\\S+)\\s+(\\S+)(\\s+\\d+)?\\s*$"
    val body = lines
      .filter(col("line_no") > 0)          // the CLUSTAL header line
      .filter(col("line").rlike("^\\S"))   // blanks + conservation rows
      .select(col("src_file"), col("line_no"),
        regexp_extract(col("line"), rec, 1).as("seq_id"),
        regexp_extract(col("line"), rec, 2).as("frag"))
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

  // The four description grammars msas.py tries, as single regexes.
  // `([A-Z0-9])+`-style reference patterns are re.search'd and read
  // via .group(), so the single-regex capture groups below produce
  // the same observable fields.
  private val UniprotRe =
    "([a-zA-Z]+)\\|([A-Z0-9]+)\\|([A-Z0-9]+_[A-Z0-9]+)"
  private val CathFastaRe =
    "([a-zA-Z]+)\\|([0-9][.\\-][0-9][.\\-][0-9])\\|" +
      "([a-zA-Z0-9]+)/(-?[0-9]+)-(-?[0-9]+)"
  private val NamedRe = "([A-Z0-9]+_[a-zA-Z0-9]+)/(-?[0-9]+)-(-?[0-9]+)"
  private val GenericRe = "([a-zA-Z0-9]+)/(-?[0-9]+)-(-?[0-9]+)"
  private val DomainRe = "^([a-zA-Z0-9]{4})([a-zA-Z0-9])([0-9]{2})/"

  /** Structured description parsing with the reference's per-format
    * dispatch (msas.py:147-190 parse_sequence_info_from_description
    * and the four parsers it tries, NETWORK LOOKUPS EXCLUDED):
    *
    *  - `format = "fasta"`: UniProt `sp|P00439|PH4H_HUMAN ...` first
    *    (msas.py:163), then CATH `cath|4.1.0|1rwcA01/4-372 ...`
    *    (msas.py:259);
    *  - `format = "stockholm"`: Pfam `C7P4T5_HALMD/44-372`
    *    (msas.py:207), then CATH-Stockholm `<alnum>/<start>-<end>`
    *    (msas.py:235) — which, like the reference, stamps
    *    source = CATH even when nothing matched;
    *  - anything else: the generic `<acc>/<start>-<end>` parser
    *    (msas.py:315), which also recognizes the 7-char CATH domain
    *    form `1rwcA01/...` → (pdb_id, chain_id, domain_id).
    *
    * Faithful to the reference's observable quirks: for a
    * `NAME_SUFFIX/s-e` description the generic accession regex
    * re.search-lands on the run AFTER the underscore (HALMD, not
    * C7P4T5) — Spark's leftmost regexp_extract reproduces it for
    * free. `rest` carries the description with the matched grammar
    * removed (the reference's remaining-'Description' field). All
    * pure codegen'd column expressions; unmatched fields are null. */
  def parseDescriptionFull(df: DataFrame, descCol: String = "description",
                           format: String = "generic"): DataFrame = {
    val d = col(descCol)
    def hit(re: String) = regexp_extract(d, re, 0) =!= ""
    def g(re: String, i: Int) = regexp_extract(d, re, i)
    def nullS = lit(null).cast("string")
    val domain = regexp_extract(g(GenericRe, 0), DomainRe, 0)
    val out = format match {
      case "fasta" => Seq(
        "collection" -> when(hit(UniprotRe), g(UniprotRe, 1))
          .when(hit(CathFastaRe), g(CathFastaRe, 1)),
        "version" -> when(hit(CathFastaRe) && !hit(UniprotRe),
          g(CathFastaRe, 2)),
        "accession" -> when(hit(UniprotRe), g(UniprotRe, 2))
          .when(hit(CathFastaRe), g(CathFastaRe, 3)),
        "name" -> when(hit(UniprotRe), g(UniprotRe, 3)),
        "seq_start" -> when(hit(CathFastaRe) && !hit(UniprotRe),
          g(CathFastaRe, 4)).cast("long"),
        "seq_end" -> when(hit(CathFastaRe) && !hit(UniprotRe),
          g(CathFastaRe, 5)).cast("long"),
        "source" -> when(hit(UniprotRe), lit("UniProt"))
          .when(hit(CathFastaRe), lit("CATH")),
        "rest" -> when(hit(UniprotRe),
            trim(regexp_replace(d, UniprotRe, "")))
          .when(hit(CathFastaRe), trim(regexp_replace(d, CathFastaRe, ""))))
      case "stockholm" => Seq(
        "name" -> when(hit(NamedRe), g(NamedRe, 1)),
        // generic-parser sub-call: accession is the alnum run right
        // before the '/', which for NAME_SUFFIX ids is the suffix
        "accession" -> when(hit(GenericRe), g(GenericRe, 1)),
        "pdb_id" -> when(domain =!= "", regexp_extract(domain, DomainRe, 1))
          .otherwise(nullS),
        "chain_id" -> when(domain =!= "", regexp_extract(domain, DomainRe, 2))
          .otherwise(nullS),
        "seq_start" -> when(hit(GenericRe), g(GenericRe, 2)).cast("long"),
        "seq_end" -> when(hit(GenericRe), g(GenericRe, 3)).cast("long"),
        // msas.py:251 stamps CATH unconditionally when Pfam missed
        "source" -> when(hit(NamedRe), lit("Pfam")).otherwise(lit("CATH")),
        "rest" -> when(hit(NamedRe), trim(regexp_replace(d, NamedRe, ""))))
      case _ => Seq(
        "name" -> when(hit(NamedRe), g(NamedRe, 1)),
        "accession" -> when(hit(GenericRe), g(GenericRe, 1)),
        "pdb_id" -> when(domain =!= "", regexp_extract(domain, DomainRe, 1))
          .otherwise(nullS),
        "chain_id" -> when(domain =!= "", regexp_extract(domain, DomainRe, 2))
          .otherwise(nullS),
        "collection" -> when(domain =!= "", lit("cath")).otherwise(nullS),
        "seq_start" -> when(hit(GenericRe), g(GenericRe, 2)).cast("long"),
        "seq_end" -> when(hit(GenericRe), g(GenericRe, 3)).cast("long"),
        "source" -> when(hit(GenericRe), lit("GenericParser")),
        "rest" -> when(hit(GenericRe), trim(regexp_replace(d, GenericRe, ""))))
    }
    out.foldLeft(df) { case (acc, (name, c)) => acc.withColumn(name, c) }
  }
}
