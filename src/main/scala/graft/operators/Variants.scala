package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, StructType}

/** Variant-payload normalizers: the reference's REST-JSON →
  * per-variant-table pipelines, re-expressed over a JSON string
  * column (one API response per row — the fetch itself is out of
  * scope for a no-egress engine; these are the pure transforms).
  *
  * reference: proteofav/variants.py:622
  * (flatten_uniprot_variants_ebi), variants.py:664
  * (flatten_ensembl_variants), library.py:569
  * (update_ensembl_to_uniprot), library.py:553 (uni_ens_var_types).
  */
object Variants {

  /** library.py:569 — Ensembl field names → UniProt-style names. */
  val EnsemblToUniprot: Map[String, String] = Map(
    "minor_allele_frequency" -> "frequency",
    "start" -> "begin",
    "end" -> "end",
    "sift" -> "siftScore",
    "polyphen" -> "polyphenScore",
    "type" -> "consequenceType",
    "id" -> "xrefs_id")

  /** library.py:553 — enforced variant column types. */
  val VariantTypeCasts: Map[String, org.apache.spark.sql.types.DataType] =
    Map("begin" -> IntegerType, "end" -> IntegerType,
      "polyphenScore" -> DoubleType, "siftScore" -> DoubleType)

  private def applyTypes(df: DataFrame): DataFrame =
    RowOps.constrainColumnTypes(df,
      casts = VariantTypeCasts.filter { case (c, _) => df.columns.contains(c) })

  /** Flatten the Proteins-API variants payload: one row per
    * `features[]` element with the response's top-level fields
    * spliced alongside, xrefs split to one row per xref id, then
    * merged back down to one row per (accession, xrefs_id) with
    * ';'-joined sorted-unique values — the reference's
    * flatten → split-by-key → merge-down pipeline, each step an
    * existing operator. `schema` is the payload schema with a
    * `features` array field (schema-first from_json keeps the scan
    * one-pass at scale). */
  def flattenUniprotVariants(df: DataFrame, jsonCol: String,
                             schema: StructType): DataFrame = {
    val parsed = df.withColumn("__p", from_json(col(jsonCol), schema))
    val top = schema.fields.filter(_.name != "features").toSeq
    val exploded = parsed.select(
      top.map(f => col(s"__p.${f.name}").as(f.name)) :+
        explode(col("__p.features")).as("feature"): _*)
    val flat = NestedOps.flattenStructs(exploded)
    // xrefs: array<struct<name,id>> → one row per id (the reference's
    // splitting_up_by_key on the ';'-joined 'xrefs_id'); OUTER so a
    // feature without xrefs survives with a null key, as the
    // reference's NaN-keyed rows do
    val split = flat
      .withColumn("xrefs_id", explode_outer(col("feature_xrefs.id")))
      .drop("feature_xrefs")
    // reference key naming: flattened feature fields are unprefixed
    // ('wildType', not 'feature_wildType') — strip the explode
    // prefix unless it would shadow a top-level response field
    val unprefixed = split.columns.foldLeft(split) { (d, c) =>
      val bare = c.stripPrefix("feature_")
      if (c.startsWith("feature_") && !d.columns.contains(bare))
        d.withColumnRenamed(c, bare)
      else d
    }
    // types enforced BEFORE the merge-down (reference order): the
    // merge joins multi-values into ';' strings, so a later cast
    // would null them out
    RowOps.mergeDownByKey(applyTypes(unprefixed),
      Seq("accession", "xrefs_id"))
  }

  /** Flatten the Ensembl variants payload (an array of flat variant
    * records): rename Ensembl fields to the UniProt-style names,
    * enforce types, one row per xref id merged down — and optionally
    * drop synonymous variants (`synonymous = false`), the
    * reference's row_selector(reverse) step. */
  def flattenEnsemblVariants(df: DataFrame, jsonCol: String,
                             schema: StructType,
                             synonymous: Boolean = true): DataFrame = {
    val parsed = df
      .withColumn("__v", explode(from_json(col(jsonCol),
        org.apache.spark.sql.types.ArrayType(schema))))
    val flat0 = NestedOps.flattenStructs(parsed.select(col("__v").as("variant")))
    val flat = flat0.toDF(flat0.columns.toIndexedSeq.map(_.stripPrefix("variant_")): _*)
    val renamed = EnsemblToUniprot.foldLeft(flat) { case (d, (from, to)) =>
      if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
    }
    val typed = applyTypes(renamed)
    val out = RowOps.mergeDownByKey(typed, Seq("xrefs_id"))
    if (synonymous) out
    else RowOps.rowSelector(out, "consequenceType",
      Seq("synonymous_variant"), reverse = true)
  }

  /** Extract disease names, residue transitions and variant ids from
    * an aggregated natural-variant annotation string — the regex
    * findall triple of parse_uniprot_variants (variants.py:718-744),
    * as three codegen'd regexp_extract_all array columns (the
    * `annotation` source column is dropped, as the reference does).
    * Transitions surface as (ref, alt) structs — the reference's
    * findall tuples. */
  def parseUniprotVariants(df: DataFrame,
                           annotationCol: String = "annotation"): DataFrame = {
    val c = col(annotationCol)
    df
      .withColumn("disease",
        regexp_extract_all(c, lit("\\['In ([a-zA-Z0-9_ ]+)[.;]"), lit(1)))
      .withColumn("transition",
        arrays_zip(
          regexp_extract_all(c, lit("([A-Z]+)->([A-Z]+)"), lit(1)).as("ref"),
          regexp_extract_all(c, lit("([A-Z]+)->([A-Z]+)"), lit(2)).as("alt")))
      .withColumn("ids",
        regexp_extract_all(c, lit("\\(\\['([a-zA-Z0-9_]+)'\\]\\)"), lit(1)))
      .drop(annotationCol)
  }
}
