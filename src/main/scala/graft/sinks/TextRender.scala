package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured-text rendering sink — the write_mmcif/write_pdb analog.
  *
  * reference: proteofav/structures.py:515 (write_mmcif_from_table),
  * structures.py:541 (write_pdb_from_table). Rows are formatted to
  * fixed-width / delimited records with column expressions and written
  * via the distributed text sink — the formatting runs on executors,
  * not the driver.
  */
object TextRender {

  /** Right-pad/truncate a column to exactly `len` chars. */
  def padded(c: Column, len: Int): Column = rpad(c.cast("string"), len, " ")

  /** Left-pad (numeric-style) to exactly `len` chars. */
  def rightAligned(c: Column, len: Int): Column = lpad(c.cast("string"), len, " ")

  /** Render columns into a single fixed-width `value` string column
    * (the shape `spark.write.text` requires). */
  def fixedWidthLines(df: DataFrame, specs: Seq[(Column, Int, Boolean)]): DataFrame =
    df.select(concat(specs.map {
      case (c, len, right) => if (right) rightAligned(c, len) else padded(c, len)
    }: _*).as("value"))

  /** Write the rendered lines as distributed text files. */
  def writeText(lines: DataFrame, path: String): Unit =
    lines.write.mode("overwrite").text(path)

  /** Render a viewer attribute file (the UCSF-Chimera "defattr"
    * shape): a fixed header naming the attribute, then one
    * `:key<TAB>value` line per row — the visualise.py analog
    * (proteofav/visualise.py:14 make_chimera_attribute_file), with
    * the body rendered distributed. Returns (headerLines, bodyDf);
    * write header+body concatenated, or body alone for huge tables. */
  def attributeLines(df: DataFrame, keyCol: String, valueCol: String,
                     attrName: String, recipient: String = "residues")
  : (Seq[String], DataFrame) = {
    require(Seq("atoms", "residues", "molecules").contains(recipient),
      s"unsupported recipient: $recipient")
    val header = Seq(
      "# Generated with graft",
      s"attribute: $attrName",
      "match mode: 1-to-1",
      s"recipient: $recipient")
    val body = df.select(concat(lit(":"), col(keyCol).cast("string"),
      lit("\t"), col(valueCol).cast("string")).as("value"))
    (header, body)
  }

  /** Render a Chimera command file: open the structure, optional
    * custom commands, optional secondary-structure coloring — the
    * small driver-side companion of [[attributeLines]] (a command
    * file is a handful of lines; only attribute BODIES need
    * distributed rendering).
    * reference: proteofav/visualise.py:54 (make_chimera_command_file). */
  def chimeraCommandLines(structurePath: String,
                          content: Seq[String] = Nil,
                          colorSecondaryStructure: Boolean = true)
  : Seq[String] = {
    val coloring =
      if (colorSecondaryStructure)
        Seq("color green,r helix", "color yellow,r strand",
          "color gray,r coil")
      else Nil
    (s"open $structurePath" +: content) ++ coloring
  }

  /** Driver-side file write (visualise.py:102 write_file): a plain
    * local write for the handful-of-lines viewer files. NOT for table
    * data — corpus-scale output goes through [[writeText]]/parquet. */
  def writeFile(content: String, path: String): Unit = {
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), content)
    ()
  }

  /** The visualise_chimera facade (proteofav/visualise.py:82): render
    * the defattr attribute file for (keyCol → valueCol) and the
    * command file that opens `structurePath` and loads it, written
    * side by side in `outDir` as `<attrName>.chimera_attrFile` and
    * `<structure-basename>.com` — the reference's filenames. The
    * attribute body renders distributed ([[attributeLines]]) and is
    * collected ordered by key: viewer attribute files are
    * per-structure residue tables, small by construction (the
    * reference writes them with a plain open()). Returns
    * (attrPath, commandPath). */
  def visualiseChimera(df: DataFrame, keyCol: String, valueCol: String,
                       attrName: String, structurePath: String,
                       outDir: String, recipient: String = "residues",
                       colorSecondaryStructure: Boolean = true)
  : (String, String) = {
    val (header, body) = attributeLines(df, keyCol, valueCol,
      attrName, recipient)
    val bodyLines = body
      .orderBy(col("value")) // deterministic file, any input order
      .collect().map(_.getString(0))
    val attrFile = s"$attrName.chimera_attrFile"
    val attrPath = s"$outDir/$attrFile"
    writeFile((header ++ bodyLines).mkString("\n") + "\n", attrPath)
    val base = new java.io.File(structurePath).getName.split('.').head
    val cmdPath = s"$outDir/$base.com"
    writeFile(chimeraCommandLines(structurePath,
      Seq(s"defattr $attrFile"), colorSecondaryStructure)
      .mkString("\n") + "\n", cmdPath)
    (attrPath, cmdPath)
  }

  /** Render token-record lines (mmCIF atom_site loop body shape):
    * columns joined by single spaces, in the given order — the
    * write_mmcif_from_table analog (proteofav/structures.py:515).
    * Null-safe: nulls render as the mmCIF placeholder '?'. */
  def tokenLines(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(concat_ws(" ",
      cols.map(c => coalesce(col(c).cast("string"), lit("?"))): _*)
      .as("value"))

  /** Render a StructureFormats.PdbAtomFields-shaped frame to PDB
    * ATOM/HETATM record lines (the write_pdb_from_table analog,
    * proteofav/structures.py:541) — all formatting is codegen'd
    * format_string/pad expressions on executors. */
  def pdbLines(df: DataFrame): DataFrame =
    df.select(concat(
      padded(col("group_PDB"), 6),
      rightAligned(col("id"), 5), lit(" "),
      padded(col("auth_atom_id"), 4),
      padded(col("label_alt_id"), 1),
      padded(col("auth_comp_id"), 3), lit(" "),
      padded(col("auth_asym_id"), 1),
      rightAligned(col("auth_seq_id"), 4),
      padded(col("pdbx_PDB_ins_code"), 1), lit("   "),
      format_string("%8.3f", col("Cartn_x")),
      format_string("%8.3f", col("Cartn_y")),
      format_string("%8.3f", col("Cartn_z")),
      format_string("%6.2f", col("occupancy")),
      format_string("%6.2f", col("B_iso_or_equiv")),
      lit(" " * 10),
      rightAligned(col("type_symbol"), 2)).as("value"))
}
