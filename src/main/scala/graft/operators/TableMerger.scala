package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The pairwise table mergers and the `table_merger` orchestration —
  * reference: proteofav/mergers.py:29 (mmcif⋈sifts), :65 (mmcif⋈dssp),
  * :103 (mmcif⋈validation), :141 (sifts⋈annotation), :167
  * (sifts⋈variants) and :403 (table_merger ordering).
  *
  * Every merger is a LEFT equi-join on the reference's exact column
  * pairs, declared lazily — the whole chain stays ONE logical plan, so
  * Catalyst reorders/pushes as usual and per-residue dimension sides
  * (validation, aggregated annotation, variants are per-residue /
  * per-site tables, orders of magnitude smaller than per-atom mmCIF)
  * broadcast under AQE when they fit. Column-presence preconditions
  * raise the reference's TableMergerError message instead of silently
  * joining empty.
  */
object TableMerger {

  private def requireCols(df: DataFrame, cols: Seq[String], what: String): Unit =
    if (!cols.forall(df.columns.contains))
      throw new IllegalArgumentException(
        s"Not possible to merge $what! " +
          "Some of the necessary columns are missing...")

  /** BioUnit workaround key choice (mergers.py:46-48,120-124): use
    * `orig_{cat}_asym_id` as the left chain key when the table
    * carries it (bio-unit tables suffix chain ids, the original id
    * column keeps the file-coordinate ids the right side uses). */
  private def chainKey(mmcif: DataFrame, category: String): String = {
    val orig = s"orig_${category}_asym_id"
    if (mmcif.columns.contains(orig)) orig else s"${category}_asym_id"
  }

  /** mmcif_sifts_table_merger (mergers.py:29): left join atoms to the
    * wide SIFTS residues on (seq_id_full, asym_id) × (PDB_dbResNum,
    * PDB_dbChainId). */
  def mmcifSiftsMerger(mmcif: DataFrame, sifts: DataFrame,
                       category: String = "auth"): DataFrame = {
    requireCols(mmcif, Seq(s"${category}_seq_id_full", s"${category}_asym_id"),
      "mmCIF and SIFTS table")
    requireCols(sifts, Seq("PDB_dbResNum", "PDB_dbChainId"),
      "mmCIF and SIFTS table")
    Joins.leftMerge(mmcif, sifts, Seq(
      s"${category}_seq_id_full" -> "PDB_dbResNum",
      chainKey(mmcif, category) -> "PDB_dbChainId"))
  }

  /** mmcif_dssp_table_merger (mergers.py:65): left join atoms to DSSP
    * residues on (seq_id_full, asym_id) × (RES_FULL, CHAIN_FULL).
    * The BioUnit branch additionally requires the chain-id sets to
    * DISAGREE before switching to `orig_` (mergers.py:82-84) — that
    * set comparison is two distinct-collects over chain-id columns,
    * metadata-sized by construction (chains per structure), the same
    * bounded-eager class as the raise-gates. */
  def mmcifDsspMerger(mmcif: DataFrame, dssp: DataFrame,
                      category: String = "auth"): DataFrame = {
    requireCols(mmcif, Seq(s"${category}_seq_id_full", s"${category}_asym_id"),
      "mmCIF and DSSP table")
    requireCols(dssp, Seq("RES_FULL", "CHAIN_FULL"), "mmCIF and DSSP table")
    val orig = s"orig_${category}_asym_id"
    val leftChain =
      if (mmcif.columns.contains(orig)) {
        val mmcifChains = mmcif.select(s"${category}_asym_id")
          .distinct().collect().map(_.get(0)).toSet
        val dsspChains = dssp.select("CHAIN_FULL")
          .distinct().collect().map(_.get(0)).toSet
        if (mmcifChains != dsspChains) orig else s"${category}_asym_id"
      } else s"${category}_asym_id"
    Joins.leftMerge(mmcif, dssp, Seq(
      s"${category}_seq_id_full" -> "RES_FULL",
      leftChain -> "CHAIN_FULL"))
  }

  /** mmcif_validation_table_merger (mergers.py:103): left join atoms
    * to validation residues on (seq_id_full, asym_id) ×
    * (validation_resnum_full, validation_chain). */
  def mmcifValidationMerger(mmcif: DataFrame, validation: DataFrame,
                            category: String = "auth"): DataFrame = {
    requireCols(mmcif, Seq(s"${category}_seq_id_full", s"${category}_asym_id"),
      "mmCIF and Validation table")
    requireCols(validation,
      Seq("validation_resnum_full", "validation_chain"),
      "mmCIF and Validation table")
    Joins.leftMerge(mmcif, validation, Seq(
      s"${category}_seq_id_full" -> "validation_resnum_full",
      chainKey(mmcif, category) -> "validation_chain"))
  }

  /** sifts_annotation_table_merger (mergers.py:141): left join SIFTS
    * residues to the residue-aggregated annotation table
    * ([[Annotations.annotationAggregation]]) on
    * (UniProt_dbAccessionId, UniProt_dbResNum) × (accession, site). */
  def siftsAnnotationMerger(sifts: DataFrame, annotation: DataFrame)
  : DataFrame = {
    requireCols(sifts, Seq("UniProt_dbAccessionId", "UniProt_dbResNum"),
      "SIFTS and Annotation table")
    requireCols(annotation, Seq("accession", "site"),
      "SIFTS and Annotation table")
    Joins.leftMerge(sifts, annotation, Seq(
      "UniProt_dbAccessionId" -> "accession",
      "UniProt_dbResNum" -> "site"))
  }

  /** sifts_variants_table_merger (mergers.py:167): left join SIFTS
    * residues to variants on (UniProt_dbAccessionId, UniProt_dbResNum)
    * × (accession, begin); `begin` is cast to string first, as the
    * reference does in place (mergers.py:181). */
  def siftsVariantsMerger(sifts: DataFrame, variants: DataFrame): DataFrame = {
    requireCols(sifts, Seq("UniProt_dbAccessionId", "UniProt_dbResNum"),
      "SIFTS and Variants table")
    requireCols(variants, Seq("accession", "begin"),
      "SIFTS and Variants table")
    Joins.leftMerge(sifts,
      variants.withColumn("begin", col("begin").cast("string")), Seq(
        "UniProt_dbAccessionId" -> "accession",
        "UniProt_dbResNum" -> "begin"))
  }

  /** pandas suffixes colliding column names `_x`/`_y` at merge time
    * (the annotation and variants tables both carry `accession`, so
    * the chained sifts merges collide); Spark keeps duplicate names,
    * which the parquet/csv writers reject — rename positionally to
    * the same suffixes (left occurrence `_x`, right `_y`, further
    * duplicates numbered). */
  def pandasSuffixDuplicates(df: DataFrame): DataFrame = {
    val counts = df.columns.groupBy(identity).map {
      case (k, v) => k -> v.length }
    if (!counts.values.exists(_ > 1)) df
    else {
      val seen = scala.collection.mutable.Map[String, Int]()
      df.toDF(df.columns.map { c =>
        if (counts(c) > 1) {
          val i = seen.getOrElse(c, 0); seen(c) = i + 1
          c + (if (i == 0) "_x" else if (i == 1) "_y" else s"_$i")
        } else c
      }.toIndexedSeq: _*)
    }
  }

  /** table_merger (mergers.py:403): the fixed merge ordering — DSSP
    * and validation attach to the atom table; annotation and variants
    * attach to SIFTS; then atoms ⋈ SIFTS stitches the halves. At
    * least two tables must be present when an atom or SIFTS side
    * exists, matching the reference's guard (mergers.py:419-421). */
  def tableMerger(mmcif: Option[DataFrame] = None,
                  dssp: Option[DataFrame] = None,
                  sifts: Option[DataFrame] = None,
                  validation: Option[DataFrame] = None,
                  annotation: Option[DataFrame] = None,
                  variants: Option[DataFrame] = None,
                  category: String = "auth"): DataFrame = {
    val available =
      Seq(mmcif, dssp, sifts, validation, annotation, variants).flatten
    if (available.size < 2 && (mmcif.nonEmpty || sifts.nonEmpty))
      throw new IllegalArgumentException(
        "At least two Tables are needed in order to merge...")

    var mmcifSide = mmcif
    for (m <- mmcifSide; d <- dssp)
      mmcifSide = Some(mmcifDsspMerger(m, d, category))
    for (m <- mmcifSide; v <- validation)
      mmcifSide = Some(mmcifValidationMerger(m, v, category))

    var siftsSide = sifts
    for (s <- siftsSide; a <- annotation)
      siftsSide = Some(siftsAnnotationMerger(s, a))
    for (s <- siftsSide; v <- variants)
      siftsSide = Some(siftsVariantsMerger(s, v))

    (mmcifSide, siftsSide) match {
      case (Some(m), Some(s)) => mmcifSiftsMerger(m, s, category)
      case (Some(m), None)    => m
      case (None, Some(s))    => s
      case (None, None) => throw new IllegalArgumentException(
        "At least two Tables are needed in order to merge...")
    }
  }
}
