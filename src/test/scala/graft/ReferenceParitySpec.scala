package graft

import graft.operators._
import graft.sinks.TextRender
import graft.sources.{Library, StructureFormats, TextSources}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end parity with the reference's flagship workflow
  * (proteofav main flow: parse structure → remove altlocs → drop
  * partial residues → merge secondary structure → per-residue
  * aggregation → contacts → viewer attributes), run entirely through
  * graft's public API on a synthetic structure. A ProteoFAV user's
  * whole pipeline, Spark-first.
  */
class ReferenceParitySpec extends SparkSpec {
  import sqlImplicits._

  test("full structure pipeline: parse → clean → merge → aggregate → contacts") {
    // synthetic 3-residue chain; residue 2 has an altloc pair (A/B)
    // and residue 3 is missing its backbone O (partial)
    val atoms = Seq(
      // res 1: complete backbone
      ("ATOM", 1, "N", "", "ALA", "A", 1, "", 0.0, 0.0, 0.0, 1.0, 0.0, "N"),
      ("ATOM", 2, "CA", "", "ALA", "A", 1, "", 1.0, 0.0, 0.0, 1.0, 0.0, "C"),
      ("ATOM", 3, "C", "", "ALA", "A", 1, "", 2.0, 0.0, 0.0, 1.0, 0.0, "C"),
      ("ATOM", 4, "O", "", "ALA", "A", 1, "", 3.0, 0.0, 0.0, 1.0, 0.0, "O"),
      // res 2: complete; CA has two altlocs, B wins on occupancy
      ("ATOM", 5, "N", "", "GLY", "A", 2, "", 0.0, 2.0, 0.0, 1.0, 0.0, "N"),
      ("ATOM", 6, "CA", "A", "GLY", "A", 2, "", 1.0, 2.0, 0.0, 0.4, 0.0, "C"),
      ("ATOM", 7, "CA", "B", "GLY", "A", 2, "", 1.1, 2.0, 0.0, 0.6, 0.0, "C"),
      ("ATOM", 8, "C", "", "GLY", "A", 2, "", 2.0, 2.0, 0.0, 1.0, 0.0, "C"),
      ("ATOM", 9, "O", "", "GLY", "A", 2, "", 3.0, 2.0, 0.0, 1.0, 0.0, "O"),
      // res 3: partial (no O) → dropped by completeness
      ("ATOM", 10, "N", "", "SER", "A", 3, "", 0.0, 9.0, 0.0, 1.0, 0.0, "N"),
      ("ATOM", 11, "CA", "", "SER", "A", 3, "", 1.0, 9.0, 0.0, 1.0, 0.0, "C"),
      ("ATOM", 12, "C", "", "SER", "A", 3, "", 2.0, 9.0, 0.0, 1.0, 0.0, "C"))
      .toDF(StructureFormats.PdbAtomFields.map(_.name): _*)

    // 1. render + parse through the PDB text formats (write_pdb ↔ parse_pdb)
    val dir = Files.createTempDirectory("graft_parity").toString + "/pdb"
    TextRender.writeText(TextRender.pdbLines(atoms), dir)
    val parsed = StructureFormats.pdbAtoms(spark, dir)
    assert(parsed.count() == 12)

    // 2-4. clean + merge through the one-call facade
    //      (mergers.py:449 table_generator / 576 _Tables.generate):
    //      altloc removal, partial-residue drop, DSSP left-merge
    val dssp = Seq((1, "A", "H"), (2, "A", "E")).toDF("RES", "CHAIN", "SS")
    val merged = TableGenerator.generate(parsed,
      dssp = Some(RowOps.recodeByMap(dssp, "SS", "SS_CLASS",
        Library.reducedSsMap, Library.reducedSsDefault)))
    // altloc pair collapsed to the occupancy winner (structures.py:399)
    assert(merged.filter(col("auth_seq_id") === 2 &&
      col("auth_atom_id") === "CA").select("label_alt_id")
      .as[String].collect().toSeq == Seq("B"))
    // partial residue 3 dropped (structures.py:430)
    assert(merged.select("auth_seq_id").distinct()
      .as[Int].collect().toSorted == Seq(1, 2))
    // DSSP merged + reduced-SS recode rode along (mergers.py:65)
    assert(merged.filter(col("auth_seq_id") === 2)
      .select("SS_CLASS").as[String].head() == "E")
    // selection knobs push down: chain filter keeps everything here,
    // an absent chain yields an empty frame — not an error
    assert(TableGenerator.generate(parsed, chains = Seq("Z")).count() == 0)

    // 5. per-residue centroid aggregation (structures.py:483)
    val centroids = Aggregations.centroid(merged,
      Seq("auth_asym_id", "auth_seq_id"),
      Seq("Cartn_x", "Cartn_y", "Cartn_z"))
    assert(centroids.count() == 2)
    val c1 = centroids.filter(col("auth_seq_id") === 1).head()
    assert(c1.getAs[Double]("Cartn_x_centroid") == 1.5)

    // 6. residue contacts within 3 Å of centroids (structures.py:366)
    val contacts = RangeJoin.contacts3D(
      centroids.select(col("auth_asym_id"),
        col("auth_seq_id").cast("long").as("id"),
        col("Cartn_x_centroid").as("x"), col("Cartn_y_centroid").as("y"),
        col("Cartn_z_centroid").as("z")),
      "auth_asym_id", "id", "x", "y", "z", eps = 3.0)
    assert(contacts.select("a_id", "b_id").as[(Long, Long)]
      .collect().toSeq == Seq((1L, 2L))) // res 3 was dropped; 1↔2 ≈ 2 Å apart

    // 7. viewer attribute file from the merged SS classes (visualise.py:14)
    val (_, attrBody) = TextRender.attributeLines(
      merged.select("auth_seq_id", "SS_CLASS").distinct(),
      "auth_seq_id", "SS_CLASS", "ss_class")
    assert(attrBody.as[String].collect().toSet == Set(":1\tH", ":2\tE"))
  }

  test("BioUnit path: DSSP breaks → full-chain recode → multi-char merge") {
    // the Biological-Unit workflow (dssp.py:153-196 + mergers.py:79-93):
    // a DSSP file whose chain A repeats after a '!*' break parses WITH
    // the break rows, the copies get re-lettered (A → AA), and the
    // facade merges per-residue records onto multi-char chain ids
    val dssp =
      "==== Secondary Structure Definition ====\n" +
      "  #  RESIDUE AA STRUCTURE BP1 BP2  ACC\n" +
      "    1    1 A M  H\n" +
      "    2    2 A R  H\n" +
      "    3        !*\n" +
      "    4    1 A M  E\n" +
      "    5    2 A R  E\n"
    val dir = Files.createTempDirectory("graft_biounit")
    Files.writeString(dir.resolve("b.dssp"), dssp)
    val full = StructureFormats.dsspFullChain(
        StructureFormats.dsspResiduesWithBreaks(spark, dir.resolve("b.dssp").toString))
      .filter(!col("AA").isin("!", "!*")) // the reference's final drop
      .select(col("RES").cast("int").as("RES"), col("CHAIN_FULL"), col("SS"))
    // the second copy of chain A re-lettered to AA (tests/test_dssp.py:186)
    assert(full.select("CHAIN_FULL").as[String].collect().sorted.toSeq ==
      Seq("A", "A", "AA", "AA"))
    // BioUnit atoms carry the multi-char auth_asym_id (mmCIF-style)
    val atoms = (for {
      (ch, base) <- Seq(("A", 0), ("AA", 100))
      r <- 1 to 2
      (an, i) <- Seq("N", "CA", "C", "O").zipWithIndex
    } yield ("ATOM", base + r * 10 + i, an, "", "ALA", ch, r, "",
      base + i * 1.0, r.toDouble, 0.0, 1.0, 0.0, an.take(1)))
      .toDF(StructureFormats.PdbAtomFields.map(_.name): _*)
    val merged = TableGenerator.generate(atoms, dssp = Some(full),
      dsspKeys = Seq("auth_seq_id" -> "RES", "auth_asym_id" -> "CHAIN_FULL"))
    // each copy's residues picked up ITS OWN segment's records
    assert(merged.filter(col("auth_asym_id") === "A")
      .select("SS").as[String].collect().toSet == Set("H"))
    assert(merged.filter(col("auth_asym_id") === "AA")
      .select("SS").as[String].collect().toSet == Set("E"))
    assert(merged.count() == 16)
  }

  test("table_generator sequence check: raise on mismatch, ignore passes") {
    // one-residue chain whose atoms say ALA (A) but the merged
    // annotation says GLY (G) → positionwise mismatch
    val atoms = Seq(
      ("ATOM", 1, "N", "", "ALA", "A", 1, "", 0.0, 0.0, 0.0, 1.0, 0.0, "N"),
      ("ATOM", 2, "CA", "", "ALA", "A", 1, "", 1.0, 0.0, 0.0, 1.0, 0.0, "C"),
      ("ATOM", 3, "C", "", "ALA", "A", 1, "", 2.0, 0.0, 0.0, 1.0, 0.0, "C"),
      ("ATOM", 4, "O", "", "ALA", "A", 1, "", 3.0, 0.0, 0.0, 1.0, 0.0, "O"))
      .toDF(StructureFormats.PdbAtomFields.map(_.name): _*)
      .withColumn("aa_struct", lit("A"))
    val dssp = Seq((1, "A", "G")).toDF("RES", "CHAIN", "aa_dssp")
    def gen(check: String) = TableGenerator.generate(atoms,
      dssp = Some(dssp), sequenceCheck = check,
      seqCheckCols = Some(("aa_struct", "aa_dssp")))
    assert(gen("ignore").count() == 4)
    assert(gen("warn").count() == 4) // warn reports but returns the table
    intercept[IllegalStateException](gen("raise"))
    intercept[IllegalArgumentException](
      TableGenerator.generate(atoms, sequenceCheck = "nope"))
  }

  private implicit class SortedSeq(s: Array[Int]) {
    def toSorted: Seq[Int] = s.toSeq.sorted
  }
}
