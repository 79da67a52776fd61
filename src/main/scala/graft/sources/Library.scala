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

  /** Reduced secondary-structure recode (dssp.py:215): DSSP 8-state →
    * helix/strand/coil, for RowOps.recodeByMap. */
  val reducedSsMap: Map[String, String] = Map(
    "H" -> "H", "G" -> "H", "I" -> "H", // helices
    "E" -> "E", "B" -> "E") // strands; everything else → coil default
  val reducedSsDefault = "C"
}
