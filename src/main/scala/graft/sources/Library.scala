package graft.sources

import org.apache.spark.sql.types._

/** Domain constant tables — the analog of proteofav/library.py:
  * residue-code mappings, backbone-completeness atom sets, and
  * per-format type-constraint maps (library.py:202,221,560-564),
  * shaped for direct use with RowOps.recodeByMap /
  * RowOps.constrainColumnTypes / Aggregations.completeGroups.
  */
object Library {

  /** Three-letter → one-letter amino-acid codes
    * (library.py:202 to_single_aa). */
  val toSingleAa: Map[String, String] = Map(
    "ALA" -> "A", "CYS" -> "C", "ASP" -> "D", "GLU" -> "E", "PHE" -> "F",
    "GLY" -> "G", "HIS" -> "H", "ILE" -> "I", "LYS" -> "K", "LEU" -> "L",
    "MET" -> "M", "ASN" -> "N", "PRO" -> "P", "GLN" -> "Q", "ARG" -> "R",
    "SER" -> "S", "THR" -> "T", "VAL" -> "V", "TRP" -> "W", "TYR" -> "Y")

  /** Backbone atoms every complete residue must carry — the predicate
    * set behind `_remove_partial_residues` (library.py:221
    * aa_default_atoms; structures.py:430). */
  val backboneAtoms: Seq[String] = Seq("CA", "N", "C", "O")

  /** Full heavy-atom inventory per standard residue (library.py:221
    * aa_default_atoms) — standard PDB chemistry; the completeness
    * predicate `_remove_partial_residues` (structures.py:430) checks
    * residues against. */
  val aaDefaultAtoms: Map[String, Seq[String]] = Map(
    "ALA" -> Seq("N", "O", "CA", "C", "CB"),
    "CYS" -> Seq("N", "O", "CA", "C", "SG", "CB"),
    "ASP" -> Seq("N", "O", "CA", "C", "CG", "OD2", "OD1", "CB"),
    "GLU" -> Seq("N", "O", "CA", "C", "CD", "CG", "OE1", "CB", "OE2"),
    "PHE" -> Seq("N", "O", "CA", "C", "CE1", "CD1", "CZ", "CG", "CB",
      "CE2", "CD2"),
    "GLY" -> Seq("N", "O", "CA", "C"),
    "HIS" -> Seq("N", "O", "CA", "C", "CB", "CG", "ND1", "CD2", "CE1",
      "NE2"),
    "LYS" -> Seq("N", "O", "CA", "C", "NZ", "CD", "CE", "CG", "CB"),
    "ILE" -> Seq("N", "O", "CA", "C", "CG2", "CD1", "CB", "CG1"),
    "LEU" -> Seq("N", "O", "CA", "C", "CD2", "CD1", "CG", "CB"),
    "MET" -> Seq("N", "O", "CA", "C", "SD", "CG", "CB", "CE"),
    "ASN" -> Seq("N", "O", "CA", "C", "ND2", "OD1", "CB", "CG"),
    "PRO" -> Seq("N", "O", "CA", "C", "CD", "CG", "CB"),
    "GLN" -> Seq("N", "O", "CA", "C", "CD", "NE2", "OE1", "CB", "CG"),
    "ARG" -> Seq("N", "O", "CA", "C", "CZ", "CD", "NE", "CG", "CB"),
    "SER" -> Seq("N", "O", "CA", "C", "CB", "OG"),
    "THR" -> Seq("N", "O", "CA", "C", "OG1", "CG2", "CB"),
    "VAL" -> Seq("N", "O", "CA", "C", "CB", "CG2", "CG1"),
    "TYR" -> Seq("N", "O", "CA", "C", "CE1", "CD1", "CZ", "CG", "CB",
      "CE2", "CD2"),
    "TRP" -> Seq("N", "O", "CA", "C", "NE1", "CZ3", "CD1", "CE3", "CG",
      "CB", "CZ2", "CE2", "CD2"))

  /** mmCIF atom_site column type constraints (library.py:392
    * _pdbx_types → library.py:560), for
    * RowOps.constrainColumnTypes. */
  val pdbxTypes: Map[String, DataType] = Map(
    "id" -> IntegerType, "label_seq_id" -> IntegerType,
    "auth_seq_id" -> IntegerType, "pdbx_PDB_model_num" -> IntegerType,
    "Cartn_x" -> DoubleType, "Cartn_y" -> DoubleType,
    "Cartn_z" -> DoubleType, "occupancy" -> DoubleType,
    "B_iso_or_equiv" -> DoubleType)

  /** DSSP column type constraints (library.py:429 _dssp_types). */
  val dsspTypes: Map[String, DataType] = Map(
    "LINE" -> IntegerType, "ACC" -> DoubleType,
    "PHI" -> DoubleType, "PSI" -> DoubleType)

  /** Reduced secondary-structure recode (dssp.py:215
    * _add_dssp_ss_reduced), for RowOps.recodeByMap. The reference
    * keeps ONLY 'H' as helix and 'E' as strand; G/I (3-10 and pi
    * helices) and B (beta bridge) land in the coil class with
    * C/T/S/blank, and anything outside the DSSP alphabet maps to
    * '-' (the default). */
  val reducedSsMap: Map[String, String] = Map(
    "H" -> "H", // alpha helix only
    "E" -> "E", // extended strand only
    "G" -> "C", "I" -> "C", "B" -> "C", "C" -> "C", "T" -> "C",
    "S" -> "C", "" -> "C", " " -> "C")
  val reducedSsDefault = "-"

  /** One-letter → three-letter amino-acid codes including the
    * extended/ambiguity letters (library.py:208
    * aa_codes_1to3_extended) — the lookup `get_rsa` routes a DSSP
    * single-letter AA through before indexing the ASA tables. */
  val aaCodes1to3Extended: Map[String, String] = Map(
    "A" -> "ALA", "C" -> "CYS", "D" -> "ASP", "E" -> "GLU", "F" -> "PHE",
    "G" -> "GLY", "H" -> "HIS", "K" -> "LYS", "I" -> "ILE", "L" -> "LEU",
    "M" -> "MET", "N" -> "ASN", "P" -> "PRO", "Q" -> "GLN", "R" -> "ARG",
    "S" -> "SER", "T" -> "THR", "V" -> "VAL", "Y" -> "TYR", "W" -> "TRP",
    "X" -> "LNT", "B" -> "ASX", "Z" -> "GLX", "J" -> "XLE", "U" -> "SEC",
    "O" -> "PYL", "-" -> "---")

  /** Maximum accessible-surface-area reference tables (library.py:249
    * ASA_Miller, :257 ASA_Wilke, :265 ASA_Sander — values published in
    * Miller et al. 1987, Tien et al. 2013, Sander & Rost 1994). Keyed
    * by three-letter residue code; divide a DSSP ACC by the residue's
    * entry (×100) for RSA. */
  val asaMiller: Map[String, Double] = Map(
    "ALA" -> 113.0, "ARG" -> 241.0, "ASN" -> 158.0, "ASP" -> 151.0,
    "CYS" -> 140.0, "GLN" -> 189.0, "GLU" -> 183.0, "GLY" -> 85.0,
    "HIS" -> 194.0, "ILE" -> 182.0, "LEU" -> 180.0, "LYS" -> 211.0,
    "MET" -> 204.0, "PHE" -> 218.0, "PRO" -> 143.0, "SER" -> 122.0,
    "THR" -> 146.0, "TRP" -> 259.0, "TYR" -> 229.0, "VAL" -> 160.0)

  val asaWilke: Map[String, Double] = Map(
    "ALA" -> 129.0, "ARG" -> 274.0, "ASN" -> 195.0, "ASP" -> 193.0,
    "CYS" -> 167.0, "GLN" -> 225.0, "GLU" -> 223.0, "GLY" -> 104.0,
    "HIS" -> 224.0, "ILE" -> 197.0, "LEU" -> 201.0, "LYS" -> 236.0,
    "MET" -> 224.0, "PHE" -> 240.0, "PRO" -> 159.0, "SER" -> 155.0,
    "THR" -> 172.0, "TRP" -> 285.0, "TYR" -> 263.0, "VAL" -> 174.0)

  val asaSander: Map[String, Double] = Map(
    "ALA" -> 106.0, "ARG" -> 248.0, "ASN" -> 157.0, "ASP" -> 163.0,
    "CYS" -> 135.0, "GLN" -> 198.0, "GLU" -> 194.0, "GLY" -> 84.0,
    "HIS" -> 184.0, "ILE" -> 169.0, "LEU" -> 164.0, "LYS" -> 205.0,
    "MET" -> 188.0, "PHE" -> 197.0, "PRO" -> 136.0, "SER" -> 130.0,
    "THR" -> 142.0, "TRP" -> 227.0, "TYR" -> 222.0, "VAL" -> 142.0)

  /** ASA table dispatch by method name, raising on an unknown method
    * exactly like `get_rsa` (dssp.py:277). */
  def asaTable(method: String): Map[String, Double] = method match {
    case "Miller" => asaMiller
    case "Wilke" => asaWilke
    case "Sander" => asaSander
    case other => throw new IllegalArgumentException(
      s"Method $other is not implemented...")
  }
}
