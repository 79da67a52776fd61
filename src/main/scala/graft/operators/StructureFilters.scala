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
