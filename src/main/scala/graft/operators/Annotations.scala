package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** UniProt-GFF annotation aggregation — the per-residue expansion of
  * sequence-range features.
  *
  * reference: proteofav/annotation.py:67 (annotation_aggregation),
  * :123 (filter_annotation). The reference iterates GFF rows on the
  * driver and appends one dict per covered residue; here the same
  * expansion is ONE `explode(sequence(start, end))` — distributed,
  * codegen'd, linear in output rows — and the per-residue feature
  * concatenation is a single aggregation.
  */
object Annotations {

  /** annotation.py:70 drop_types default — features that span whole
    * chains/secondary-structure runs and would spam every residue. */
  val DefaultDropTypes: Seq[String] =
    Seq("Helix", "Beta strand", "Turn", "Chain")

  /** Expand range features to residues and (optionally) collapse to
    * one row per residue position.
    *
    * Column semantics follow annotation.py:80-101: each feature row
    * covers positions `start..end` inclusive; its label is the
    * `_annotation_writer` recode ([[TextFunctions.annotationLabel]]);
    * grouped output joins the labels of all features covering a
    * position with ", " in FILE ORDER — the reference's pandas
    * iteration order — which callers supply as `orderCol` (any
    * monotone line/row id; ties impossible when ids are unique).
    *
    * Output (groupResidues=true, the merge-ready shape): one row per
    * covered position with `annotation`, `site` (position as string,
    * the sifts_annotation_table_merger join key, mergers.py:158) and
    * `accession` = identifier. groupResidues=false keeps one row per
    * (feature, position) with the reference's positional-row-number
    * `site` quirk (table.index on the ungrouped frame) — faithful but
    * inherently a global enumeration, so it pays one single-partition
    * window; prefer the grouped form at scale.
    */
  def annotationAggregation(table: DataFrame,
                            identifier: Option[String] = None,
                            queryType: Option[String] = None,
                            dropTypes: Seq[String] = DefaultDropTypes,
                            groupResidues: Boolean = true,
                            orderCol: String = "line_id",
                            typeCol: String = "TYPE",
                            startCol: String = "START",
                            endCol: String = "END",
                            noteCol: String = "Note",
                            idCol: String = "ID"): DataFrame = {
    val filtered = queryType match {
      case Some(q) => table.filter(col(typeCol) === q)
      case None if dropTypes.nonEmpty =>
        table.filter(!col(typeCol).isin(dropTypes: _*))
      case None => table
    }
    val lines = filtered.select(
      col(orderCol).as("__ord"),
      TextFunctions.annotationLabel(
        col(typeCol), col(noteCol), col(idCol)).as("annotation"),
      explode(sequence(col(startCol).cast("long"),
        col(endCol).cast("long"))).as("idx"))
    val acc = identifier.map(lit(_)).getOrElse(lit(null))
      .cast("string").as("accession")
    val out =
      if (groupResidues)
        lines.groupBy(col("idx"))
          .agg(array_join(transform(
            array_sort(collect_list(struct(col("__ord"), col("annotation")))),
            r => r.getField("annotation")), ", ").as("annotation"))
          .select(col("annotation"), col("idx").cast("string").as("site"), acc)
      else
        lines
          // guarded (r18): the global sequence number is the
          // reference's per-STRUCTURE contract (one identifier's
          // annotation lines) — assert the single-partition frame
          // stays structure-sized instead of silently absorbing a
          // whole-corpus table
          .withColumn("site", WindowOps.guardedGlobalFrame(
            (row_number().over(
              Window.orderBy(col("__ord"), col("idx"))) - 1).cast("string"),
            "annotationAggregation's per-structure line table", 1L << 24))
          .select(col("idx"), col("annotation"), col("site"), acc)
    requireNonEmpty(out)
    out
  }

  /** filter_annotation (annotation.py:123): optional aggregation +
    * the reference's raise-on-empty. */
  def filterAnnotation(table: DataFrame,
                       identifier: Option[String] = None,
                       annotationAgg: Boolean = false,
                       queryType: Option[String] = None,
                       dropTypes: Seq[String] = DefaultDropTypes,
                       groupResidues: Boolean = true,
                       orderCol: String = "line_id"): DataFrame = {
    val out =
      if (annotationAgg)
        annotationAggregation(table, identifier, queryType, dropTypes,
          groupResidues, orderCol)
      else table
    requireNonEmpty(out)
    out
  }

  /** Raise-on-empty (annotation.py:101,134) as a LIMIT-1 existence
    * probe — bounded eager work at any scale. */
  private def requireNonEmpty(t: DataFrame): Unit =
    if (t.isEmpty) throw new IllegalArgumentException(
      "The filters resulted in an empty DataFrame...")
}
