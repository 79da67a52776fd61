package graft.operators

import graft.sources.{Library, StructureFormats}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Knob-for-knob filter facades over parsed DSSP / SIFTS residue
  * tables — the analogs of `filter_dssp` (proteofav/dssp.py:342-408)
  * and `filter_sifts` (proteofav/sifts.py:378-420) — plus the RSA
  * column builders they dispatch to (`get_rsa` dssp.py:249,
  * `get_rsa_class` dssp.py:289, `_add_dssp_rsa` dssp.py:134,
  * `_add_dssp_rsa_class` dssp.py:197, `_add_dssp_ss_reduced`
  * dssp.py:215).
  *
  * Everything stays one declarative plan: each knob appends a
  * filter / literal-when-chain / window stage, so the chain/residue
  * selections still push down into the text scan and the RSA math is
  * codegen'd (no join against a constants table, no UDF). The only
  * eager action is the reference-mandated raise-on-empty, implemented
  * as a LIMIT-1 probe, not a count.
  */
object StructureFilters {

  /** Relative Solvent Accessibility from a DSSP ACC column —
    * `_add_dssp_rsa` (dssp.py:134) over `get_rsa` (dssp.py:249):
    * ACC / maxASA[residue] × 100, rounded to 3 decimals. The
    * one-letter AA → three-letter → ASA double lookup is composed at
    * plan-build time into a single letter→constant map, so the whole
    * column is one codegen'd when-chain. Unknown method raises like
    * the reference; a letter outside the table (incl. the extended
    * codes mapping to LNT/ASX/... which have no ASA entry) yields
    * null — the reference's empty-string RSA. */
  def addRsa(df: DataFrame, method: String = "Sander",
             accCol: String = "ACC", aaCol: String = "AA",
             as: String = "RSA"): DataFrame = {
    val asa = Library.asaTable(method) // raises on unknown method
    val byLetter = Library.aaCodes1to3Extended.flatMap {
      case (one, three) => asa.get(three).map(one -> _)
    }
    RowOps.scaledRatio(df, accCol, aaCol, byLetter, as)
      .withColumn(as, round(col(as), 3))
  }

  /** Surface / Part. Exposed / Core classes from an RSA column —
    * `get_rsa_class` (dssp.py:289) / `_add_dssp_rsa_class`
    * (dssp.py:197). A null (non-numeric) RSA keeps the reference's
    * '-' placeholder. */
  def addRsaClass(df: DataFrame, rsaCol: String = "RSA",
                  lowerThreshold: Double = 5.0,
                  upperThreshold: Double = 25.0): DataFrame = {
    val r = col(rsaCol).cast("double")
    df.withColumn(s"${rsaCol}_CLASS",
      when(r.isNull, "-")
        .when(r >= upperThreshold, "Surface")
        .when(r >= lowerThreshold, "Part. Exposed")
        .otherwise("Core"))
  }

  /** Reduced secondary-structure class column — `_add_dssp_ss_reduced`
    * (dssp.py:215) via the recode map in [[Library.reducedSsMap]]. */
  def addSsReduced(df: DataFrame, ssCol: String = "SS",
                   as: String = "SS_CLASS"): DataFrame =
    RowOps.recodeByMap(df, ssCol, as,
      Library.reducedSsMap, Library.reducedSsDefault)

  /** `filter_dssp` (dssp.py:342-408), knob for knob, over a table
    * shaped like [[StructureFormats.dsspResiduesWithBreaks]] output
    * (the full-chain recode needs the '!*' marker rows; they are
    * dropped here afterwards exactly as the reference drops them).
    * Stage order matches the reference: column exclusion → full-chain
    * recode → SS null-fill → reduced SS → RSA → RSA class → marker
    * drop → row selections → id reset → raise-on-empty. */
  def filterDssp(table: DataFrame,
                 excludedCols: Seq[String] = Nil,
                 chains: Seq[Any] = Nil,
                 chainsFull: Seq[Any] = Nil,
                 res: Seq[Any] = Nil,
                 addFullChain: Boolean = true,
                 addSsReduced: Boolean = false,
                 addRsa: Boolean = true,
                 rsaMethod: String = "Sander",
                 addRsaClass: Boolean = false,
                 resetResId: Boolean = false,
                 fileCol: String = "file"): DataFrame = {
    var t = RowOps.excludeColumns(table, excludedCols)
    if (addFullChain) t = StructureFormats.dsspFullChain(t, fileCol = fileCol)
    t = t.withColumn("SS", coalesce(col("SS"), lit("-")))
    if (addSsReduced) t = this.addSsReduced(t)
    if (addRsa) t = this.addRsa(t, method = rsaMethod)
    if (addRsaClass) t = this.addRsaClass(t)
    t = t.filter(col("AA") =!= "!" && col("AA") =!= "!*")
    if (chains.nonEmpty) t = RowOps.rowSelector(t, "CHAIN", chains)
    if (chainsFull.nonEmpty) t = RowOps.rowSelector(t, "CHAIN_FULL", chainsFull)
    if (res.nonEmpty) t = RowOps.rowSelector(t, "RES", res)
    if (resetResId) t = StructureFormats.resetLineIds(t, fileCol = fileCol)
    requireNonEmpty(t)
    t
  }

  /** `filter_structures` (structures.py:777), knob for knob, over a
    * parsed atom table ([[StructureFormats.pdbAtoms]] /
    * [[StructureFormats.mmcifAtoms]] shape) — the third and largest
    * of the reference's filter facades, stage order preserved
    * exactly: exclude → models → chains → lines → add_res_full →
    * add_atom_altloc → add_contacts → remove_hydrogens →
    * remove_altloc (forces id reset, as the reference does) →
    * remove_partial_res → reset_atom_id → res → res_full → comps →
    * atoms (incl. the centroid/backbone_centroid dispatch) →
    * residue_agg → raise-on-empty.
    *
    * Everything is one declarative plan except the reference-mandated
    * raise-on-empty (a LIMIT-1 probe) and, when `models` is the
    * literal "first", the first-row model lookup (a 1-row collect —
    * the reference's `table[key].iloc[0]`).
    *
    * Semantics notes, each matching the named reference helper:
    *  - remove_altloc (`_remove_multiple_altlocs`, structures.py:399):
    *    the reference walks consecutive rows keeping the FIRST altloc
    *    of each (atom) run and blanking its label_alt_id to '.'.
    *    Relationally: keep the min-id row per (chain, seq, atom) among
    *    altloc carriers — equivalent on well-formed files where
    *    altlocs of one atom are consecutive — then blank the marker.
    *  - remove_partial_res (`_remove_partial_residues`,
    *    structures.py:430): drop ATOM residues of a standard amino
    *    acid ([[graft.sources.Library.aaDefaultAtoms]]) missing any of
    *    its default heavy atoms. (The reference's extra
    *    duplicate-seq-id drop is subsumed by remove_altloc upstream,
    *    its own stated origin for such duplicates.)
    *  - reset_atom_id: a per-file (or global, for single-structure
    *    tables — bounded by construction) dense re-numbering by the
    *    prior id order. */
  def filterStructures(table: DataFrame,
                       excludedCols: Seq[String] = Nil,
                       models: Seq[Any] = Seq("first"),
                       chains: Seq[Any] = Nil,
                       res: Seq[Any] = Nil,
                       resFull: Seq[Any] = Nil,
                       comps: Seq[Any] = Nil,
                       atoms: Seq[Any] = Nil,
                       lines: Seq[Any] = Nil,
                       category: String = "auth",
                       residueAgg: Boolean = false,
                       aggMethod: String = "centroid",
                       addResFull: Boolean = true,
                       addAtomAltloc: Boolean = false,
                       addContacts: Boolean = false,
                       dist: Double = 5.0,
                       resetAtomId: Boolean = true,
                       removeAltloc: Boolean = false,
                       removeHydrogens: Boolean = true,
                       removePartialRes: Boolean = false,
                       fileCol: String = "file"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    var t = RowOps.excludeColumns(table, excludedCols)
    val modelCol = "pdbx_PDB_model_num"
    if (models.nonEmpty && t.columns.contains(modelCol)) {
      if (models == Seq("first")) {
        if (t.columns.contains(fileCol)) {
          // per-file "first": the reference's iloc[0] lookup is
          // per-structure; a multi-file table scopes it per file.
          // One row per file — broadcast semi-join, no collect.
          val firstModels = t.withColumn("__m_rn", row_number().over(
              Window.partitionBy(fileCol).orderBy(col("id"))))
            .filter(col("__m_rn") === 1)
            .select(col(fileCol).as("__m_file"), col(modelCol).as("__m_model"))
          t = t.join(broadcast(firstModels),
            t(fileCol) === col("__m_file") &&
              t(modelCol) === col("__m_model"), "left_semi")
        } else {
          val first = t.orderBy(col("id")).select(modelCol).limit(1)
            .collect().headOption.map(_.get(0))
          for (v <- first) t = RowOps.rowSelector(t, modelCol, Seq(v))
        }
      } else t = RowOps.rowSelector(t, modelCol, models)
    }
    if (chains.nonEmpty)
      t = RowOps.rowSelector(t, s"${category}_asym_id", chains)
    if (lines.nonEmpty) t = RowOps.rowSelector(t, "group_PDB", lines)
    if (addResFull) t = StructureFormats.addResFull(t)
    if (addAtomAltloc) t = StructureFormats.addAtomAltloc(t)
    if (addContacts) {
      val pk = if (t.columns.contains(modelCol)) modelCol
        else if (t.columns.contains(fileCol)) fileCol else "group_PDB"
      t = RangeJoin.withContactIndexes(t, pk, "id", dist)
    }
    if (removeHydrogens)
      t = RowOps.rowSelector(t, "type_symbol", Seq("H"), reverse = true)
    // altloc dedup and the completeness check are both PER STRUCTURE:
    // when several models survive (models=Seq(1,2) / Nil) or several
    // files share the table, the model/file columns join the keys so
    // one structure's atoms never collapse or complete another's
    def structureScope = Seq(modelCol, fileCol).filter(t.columns.contains)
    var mustResetIds = resetAtomId
    if (removeAltloc) {
      t = WindowOps.keepBestPerKey(t,
        structureScope ++ Seq(s"${category}_asym_id", s"${category}_seq_id",
          s"${category}_atom_id"),
        Seq(col("id").asc))
        .withColumn("label_alt_id", lit("."))
      mustResetIds = true
    }
    if (removePartialRes) {
      val std = graft.sources.Library.aaDefaultAtoms
      val compId = col(s"${category}_comp_id")
      val atomId = col(s"${category}_atom_id")
      val required = std.foldLeft(lit(null).cast("int")) {
        case (other, (aa, atomsOf)) =>
          when(compId === aa, lit(atomsOf.size)).otherwise(other)
      }
      // completeness = every atom of the residue's own default
      // inventory observed (_remove_partial_residues checks
      // set(default) - set(observed)); atoms OUTSIDE the inventory —
      // OXT on C-terminal residues, hydrogens when
      // removeHydrogens=false, nonstandard names — must not count,
      // or they mask a missing default atom
      val isDefaultAtom = std.foldLeft(lit(false)) {
        case (other, (aa, atomsOf)) =>
          when(compId === aa,
            atomId.isin(atomsOf.map(a => a: Any): _*)).otherwise(other)
      }
      val grpCols = structureScope ++
        Seq(s"${category}_asym_id", s"${category}_seq_id")
      val incomplete = t
        .filter(col("group_PDB") === "ATOM" && required.isNotNull)
        .groupBy(grpCols.map(c => col(c).as(s"__pr_$c")): _*)
        .agg(count_distinct(when(isDefaultAtom, atomId)).as("__pr_n"),
          max(required).as("__pr_req"))
        .filter(col("__pr_n") < col("__pr_req"))
        .drop("__pr_n", "__pr_req")
      t = t.join(incomplete,
        grpCols.map(c => t(c) === incomplete(s"__pr_$c")).reduce(_ && _),
        "left_anti")
    }
    if (mustResetIds) {
      val hasFile = t.columns.contains(fileCol)
      val part = if (hasFile) Window.partitionBy(fileCol)
        else Window.partitionBy()
      val rn = row_number().over(part.orderBy(col("id")))
      // guarded (r18): the no-fileCol arm is the single-structure
      // path — assert the global frame stays structure-sized
      t = t.withColumn("id",
        if (hasFile) rn
        else WindowOps.guardedGlobalFrame(rn,
          "resetIds' single-structure atom table", 1L << 24))
    }
    if (res.nonEmpty)
      t = RowOps.rowSelector(t, s"${category}_seq_id", res)
    if (resFull.nonEmpty)
      t = RowOps.rowSelector(t, s"${category}_seq_id_full", resFull)
    if (comps.nonEmpty)
      t = RowOps.rowSelector(t, s"${category}_comp_id", comps)
    if (atoms == Seq("centroid") || atoms == Seq("backbone_centroid"))
      t = Aggregations.residuesAggregation(t,
        atoms.head.toString, category)
    else if (atoms.nonEmpty)
      t = RowOps.rowSelector(t, s"${category}_atom_id", atoms)
    if (residueAgg)
      t = Aggregations.residuesAggregation(t, aggMethod, category)
    requireNonEmpty(t)
    t
  }

  /** `filter_sifts` (sifts.py:378-420), knob for knob, over
    * `Xml.siftsResidues` output: column exclusion, then the five row
    * selections (entity chain, author chain, PDB residue, UniProt
    * accession, UniProt site), then raise-on-empty. */
  def filterSifts(table: DataFrame,
                  excludedCols: Seq[String] = Nil,
                  chains: Seq[Any] = Nil,
                  chainAuth: Seq[Any] = Nil,
                  res: Seq[Any] = Nil,
                  uniprot: Seq[Any] = Nil,
                  site: Seq[Any] = Nil): DataFrame = {
    var t = RowOps.excludeColumns(table, excludedCols)
    if (chains.nonEmpty) t = RowOps.rowSelector(t, "PDB_entityId", chains)
    if (chainAuth.nonEmpty) t = RowOps.rowSelector(t, "PDB_dbChainId", chainAuth)
    if (res.nonEmpty) t = RowOps.rowSelector(t, "PDB_dbResNum", res)
    if (uniprot.nonEmpty)
      t = RowOps.rowSelector(t, "UniProt_dbAccessionId", uniprot)
    if (site.nonEmpty) t = RowOps.rowSelector(t, "UniProt_dbResNum", site)
    requireNonEmpty(t)
    t
  }

  /** The reference's raise-on-empty tail (dssp.py:406, sifts.py:419):
    * a LIMIT-1 existence probe — the one eager action either facade
    * takes, bounded work at any scale. */
  private def requireNonEmpty(t: DataFrame): Unit =
    if (t.isEmpty) throw new IllegalStateException(
      "The filters resulted in an empty DataFrame...")
}
