package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Text-format readers re-expressing ProteoFAV's parsers Spark-first:
  * the files are read distributed via `spark.read.text` and parsed
  * with codegen'd column expressions (substring / regex / split) —
  * never a driver-side line loop.
  */
object TextSources {

  /** Column spec for fixed-width records: (name, 1-based start
    * offset, length, target type). */
  final case class FixedWidthField(name: String, start: Int, len: Int,
                                   dataType: String = "string")

  /** Fixed-width text reader — the PDB/DSSP record shape.
    * reference: proteofav/structures.py:118 (parse_pdb_atoms),
    * dssp.py:31 (parse_dssp_residues: fixed column offsets). */
  def fixedWidth(spark: SparkSession, path: String,
                 fields: Seq[FixedWidthField],
                 lineFilter: Option[Column] = None,
                 skipLines: Int = 0): DataFrame = {
    var df = spark.read.text(path)
    if (skipLines > 0) {
      // A global line number needs zipWithIndex (one extra job to
      // count per-partition sizes) — monotonically_increasing_id is
      // NOT a line number on multi-partition input. At 100 TB prefer
      // a content lineFilter; the positional skip is for headers.
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      val rdd = df.rdd.zipWithIndex().map { case (r, i) => Row(r.getString(0), i) }
      val schema = StructType(Seq(StructField("value", org.apache.spark.sql.types.StringType),
        StructField("__idx", LongType)))
      df = spark.createDataFrame(rdd, schema)
        .filter(col("__idx") >= skipLines).drop("__idx")
    }
    val parsed = lineFilter.map(df.filter).getOrElse(df)
    parsed.select(fields.map { f =>
      trim(substring(col("value"), f.start, f.len)).cast(f.dataType).as(f.name)
    }: _*)
  }

  /** Whitespace-tokenized record reader — the mmCIF `loop_` body
    * shape: each matching line is split on runs of whitespace into
    * named columns. reference: proteofav/structures.py:57
    * (parse_mmcif_atoms: lines starting with ATOM/HETATM split on
    * whitespace). */
  def tokenRecords(spark: SparkSession, path: String, colNames: Seq[String],
                   linePrefix: Option[String] = None): DataFrame = {
    val df = spark.read.text(path)
    val kept = linePrefix.map(p => df.filter(col("value").startsWith(p)))
      .getOrElse(df)
    val toks = split(trim(col("value")), "\\s+")
    kept.select(colNames.zipWithIndex.map { case (n, i) =>
      toks.getItem(i).as(n)
    }: _*)
  }

  /** GFF-style reader: 9 tab-separated columns, `#` comment lines
    * dropped, attribute column exploded into a map.
    * `withLineId` adds a `line_id` file-position column — the order
    * key [[graft.operators.Annotations.annotationAggregation]] needs
    * to reproduce the reference's file-order feature concatenation.
    * It costs a zipWithIndex pass (see [[fixedWidth]]'s note); a
    * single protein's GFF annotation file is metadata-sized, so the
    * extra job is bounded.
    * reference: proteofav/annotation.py:35 (parse_gff_features). */
  def gff(spark: SparkSession, path: String,
          withLineId: Boolean = false): DataFrame = {
    val names = Seq("seqid", "source", "type", "start", "end",
      "score", "strand", "phase", "attributes")
    var df = spark.read.text(path)
    if (withLineId) {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types.{LongType, StringType => Str,
        StructField, StructType}
      val rdd = df.rdd.zipWithIndex().map { case (r, i) =>
        Row(r.getString(0), i) }
      df = spark.createDataFrame(rdd, StructType(Seq(
        StructField("value", Str), StructField("line_id", LongType))))
    }
    val kept = df.filter(!col("value").startsWith("#"))
    val toks = split(col("value"), "\t")
    val idCols = if (withLineId) Seq(col("line_id")) else Nil
    kept.select(idCols ++ names.zipWithIndex.map { case (n, i) =>
      toks.getItem(i).as(n)
    }: _*)
      .withColumn("start", col("start").cast("long"))
      .withColumn("end", col("end").cast("long"))
      .withColumn("attr_map",
        str_to_map(col("attributes"), lit(";"), lit("=")))
  }
}
