package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Concrete structural-biology text layouts from the reference,
  * expressed as [[TextSources]] specs — the formats ProteoFAV parses
  * with pandas read_fwf / tokenization, here parsed distributed with
  * codegen'd substring/split expressions.
  */
object StructureFormats {

  import TextSources.FixedWidthField

  /** PDB ATOM/HETATM record layout (columns per the public PDB format
    * spec, the same offsets pandas read_fwf uses in
    * proteofav/structures.py:118 parse_pdb_atoms). */
  val PdbAtomFields: Seq[FixedWidthField] = Seq(
    FixedWidthField("group_PDB", 1, 6),
    FixedWidthField("id", 7, 5, "int"),
    FixedWidthField("auth_atom_id", 13, 4),
    FixedWidthField("label_alt_id", 17, 1),
    FixedWidthField("auth_comp_id", 18, 3),
    FixedWidthField("auth_asym_id", 22, 1),
    FixedWidthField("auth_seq_id", 23, 4, "int"),
    FixedWidthField("pdbx_PDB_ins_code", 27, 1),
    FixedWidthField("Cartn_x", 31, 8, "double"),
    FixedWidthField("Cartn_y", 39, 8, "double"),
    FixedWidthField("Cartn_z", 47, 8, "double"),
    FixedWidthField("occupancy", 55, 6, "double"),
    FixedWidthField("B_iso_or_equiv", 61, 6, "double"),
    FixedWidthField("type_symbol", 77, 2))

  /** Parse PDB ATOM (+ optionally HETATM) records, distributed.
    * reference: proteofav/structures.py:118. */
  def pdbAtoms(spark: SparkSession, path: String,
               includeHetatm: Boolean = true): DataFrame = {
    val prefix = if (includeHetatm)
      col("value").startsWith("ATOM") || col("value").startsWith("HETATM")
    else col("value").startsWith("ATOM")
    TextSources.fixedWidth(spark, path, PdbAtomFields, Some(prefix))
  }

  /** DSSP per-residue record layout (offsets as in
    * proteofav/dssp.py:31 parse_dssp_residues' read_fwf colspecs). */
  val DsspResidueFields: Seq[FixedWidthField] = Seq(
    FixedWidthField("LINE", 1, 5, "int"),
    FixedWidthField("RES", 6, 5),
    FixedWidthField("INSCODE", 11, 1),
    FixedWidthField("CHAIN", 12, 1),
    FixedWidthField("AA", 14, 1),
    FixedWidthField("SS", 17, 1),
    FixedWidthField("ACC", 35, 4, "double"),
    FixedWidthField("PHI", 104, 6, "double"),
    FixedWidthField("PSI", 110, 6, "double"))

  /** Parse DSSP residue lines: the body starts after the `  #  RES`
    * header line; data lines carry a numeric line index, so the
    * scale-safe filter is content-based (no positional skip).
    * reference: proteofav/dssp.py:31. */
  def dsspResidues(spark: SparkSession, path: String): DataFrame =
    TextSources.fixedWidth(spark, path, DsspResidueFields,
      Some(regexp_like(substring(col("value"), 1, 5), lit("^\\s*\\d+$"))))
      // '!' chain-break placeholder rows carry no residue
      .filter(col("AA") =!= "!")

  /** mmCIF atom_site loop column order (whitespace-token records) —
    * the 21 columns proteofav names in structures.py:57. */
  val MmcifAtomCols: Seq[String] = Seq(
    "group_PDB", "id", "type_symbol", "label_atom_id", "label_alt_id",
    "label_comp_id", "label_asym_id", "label_entity_id", "label_seq_id",
    "pdbx_PDB_ins_code", "Cartn_x", "Cartn_y", "Cartn_z", "occupancy",
    "B_iso_or_equiv", "pdbx_formal_charge", "auth_seq_id", "auth_comp_id",
    "auth_asym_id", "auth_atom_id", "pdbx_PDB_model_num")

  /** Parse mmCIF ATOM/HETATM token records with typed coordinates.
    * reference: proteofav/structures.py:57 (parse_mmcif_atoms). */
  def mmcifAtoms(spark: SparkSession, path: String): DataFrame = {
    val raw = TextSources.tokenRecords(spark, path, MmcifAtomCols,
      linePrefix = None)
      .filter(col("group_PDB").isin("ATOM", "HETATM"))
    Seq("Cartn_x", "Cartn_y", "Cartn_z", "occupancy", "B_iso_or_equiv")
      .foldLeft(raw)((d, c) => d.withColumn(c, col(c).cast("double")))
      .withColumn("id", col("id").cast("int"))
      .withColumn("label_seq_id", col("label_seq_id").cast("int"))
      .withColumn("auth_seq_id", col("auth_seq_id").cast("int"))
  }

  // ---- record cleanup passes (structures.py:178-258, 340-364) ----
  // PDB-parsed records carry blanks where mmCIF expects sentinel
  // characters; all four fixes are pure column expressions so they
  // fuse into the scan projection.

  /** Blank/null insertion codes → '?' (the mmCIF no-code sentinel).
    * reference: proteofav/structures.py:205 (_fix_pdb_ins_code). */
  def fixPdbInsCode(df: DataFrame): DataFrame =
    df.withColumn("pdbx_PDB_ins_code",
      when(col("pdbx_PDB_ins_code").isNull ||
        (trim(col("pdbx_PDB_ins_code")) === ""), lit("?"))
        .otherwise(col("pdbx_PDB_ins_code")))

  /** Blank/'?'/null altloc ids → '.' (the mmCIF no-altloc sentinel).
    * reference: proteofav/structures.py:219 (_fix_label_alt_id). */
  def fixLabelAltId(df: DataFrame): DataFrame =
    df.withColumn("label_alt_id",
      when(col("label_alt_id").isNull ||
        (trim(col("label_alt_id")) === "") ||
        (col("label_alt_id") === "?"), lit("."))
        .otherwise(col("label_alt_id")))

  /** Missing element symbol → first uppercase letter of the atom id
    * (" CA " → C). reference: proteofav/structures.py:233
    * (_fix_type_symbol / get_type_symbol). */
  def fixTypeSymbol(df: DataFrame,
                    atomCol: String = "label_atom_id"): DataFrame =
    df.withColumn("type_symbol",
      when(col("type_symbol").isNull || (trim(col("type_symbol")) === ""),
        substring(regexp_replace(col(atomCol), "[^A-Z]", ""), 1, 1))
        .otherwise(col("type_symbol")))

  /** Add '<atom>.<altloc>' disambiguation ids (plain atom id when no
    * altloc) for both label_ and auth_ naming schemes.
    * reference: proteofav/structures.py:340 (_add_mmcif_atom_altloc /
    * join_atom_altloc). */
  def addAtomAltloc(df: DataFrame): DataFrame = {
    def joined(category: String) = when(
      col("label_alt_id").isNull ||
        trim(col("label_alt_id")).isin("", "."),
      col(s"${category}_atom_id"))
      .otherwise(concat(col(s"${category}_atom_id"), lit("."),
        col("label_alt_id")))
    df.withColumn("label_atom_altloc_id", joined("label"))
      .withColumn("auth_atom_altloc_id", joined("auth"))
  }
}
