package graft

import graft.sinks.TextRender
import graft.sources.StructureFormats
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end CLI drive: render a PDB file, run Cli.main against it,
  * read the written output back. Mirrors the reference CLI flow
  * (proteofav/main.py:15-66) on graft's distributed writes. */
class CliSpec extends SparkSpec {
  import sqlImplicits._

  private def writePdb(): String = {
    val atoms = Seq(
      ("ATOM", 1, "N", "", "ALA", "A", 1, "", 0.0, 0.0, 0.0, 1.0, 0.0, "N"),
      ("ATOM", 2, "CA", "", "ALA", "A", 1, "", 1.0, 0.0, 0.0, 1.0, 0.0, "C"),
      ("ATOM", 3, "C", "", "ALA", "A", 1, "", 2.0, 0.0, 0.0, 1.0, 0.0, "C"),
      ("ATOM", 4, "O", "", "ALA", "A", 1, "", 3.0, 0.0, 0.0, 1.0, 0.0, "O"),
      ("ATOM", 5, "N", "", "GLY", "B", 1, "", 0.0, 2.0, 0.0, 1.0, 0.0, "N"),
      ("ATOM", 6, "CA", "", "GLY", "B", 1, "", 1.0, 2.0, 0.0, 1.0, 0.0, "C"),
      ("ATOM", 7, "C", "", "GLY", "B", 1, "", 2.0, 2.0, 0.0, 1.0, 0.0, "C"),
      ("ATOM", 8, "O", "", "GLY", "B", 1, "", 3.0, 2.0, 0.0, 1.0, 0.0, "O"))
      .toDF(StructureFormats.PdbAtomFields.map(_.name): _*)
    val dir = Files.createTempDirectory("graft_cli").toString + "/pdb"
    TextRender.writeText(TextRender.pdbLines(atoms), dir)
    dir
  }

  test("cli: pdb in, chain filter, csv out") {
    val pdb = writePdb()
    val out = Files.createTempDirectory("graft_cli_out").toString + "/csv"
    Cli.main(Array("--atoms", pdb, "--chains", "A", "--output", out))
    val back = spark.read.option("header", "true").csv(out)
    assert(back.count() == 4)
    assert(back.select("auth_asym_id").distinct()
      .as[String].collect().toSeq == Seq("A"))
    // the shared test session must survive an embedded CLI run
    assert(!spark.sparkContext.isStopped)
  }

  test("cli: mmcif input format, parquet out") {
    // token-record mmCIF body rendered through tokenLines
    val rows = Seq(
      ("ATOM", 1, "N", "N", ".", "ALA", "A", 1, 1, "?", 0.0, 0.0, 0.0, 1.0,
        0.0, "?", 1, "ALA", "A", "N", 1),
      ("ATOM", 2, "C", "CA", ".", "ALA", "A", 1, 1, "?", 1.0, 0.0, 0.0, 1.0,
        0.0, "?", 1, "ALA", "A", "CA", 1),
      ("ATOM", 3, "C", "C", ".", "ALA", "A", 1, 1, "?", 2.0, 0.0, 0.0, 1.0,
        0.0, "?", 1, "ALA", "A", "C", 1),
      ("ATOM", 4, "O", "O", ".", "ALA", "A", 1, 1, "?", 3.0, 0.0, 0.0, 1.0,
        0.0, "?", 1, "ALA", "A", "O", 1))
      .toDF("group_PDB", "id", "type_symbol", "label_atom_id", "label_alt_id",
        "label_comp_id", "label_asym_id", "label_entity_id", "label_seq_id",
        "pdbx_PDB_ins_code", "Cartn_x", "Cartn_y", "Cartn_z", "occupancy",
        "B_iso_or_equiv", "pdbx_formal_charge", "auth_seq_id", "auth_comp_id",
        "auth_asym_id", "auth_atom_id", "pdbx_PDB_model_num")
    val dir = Files.createTempDirectory("graft_cli_cif").toString + "/cif"
    TextRender.writeText(
      TextRender.tokenLines(rows, StructureFormats.MmcifAtomCols), dir)
    val out = Files.createTempDirectory("graft_cli_cif_out").toString + "/pq"
    Cli.main(Array("--atoms", dir, "--input-format", "mmcif",
      "--output-type", "parquet", "--output", out))
    val back = spark.read.parquet(out)
    assert(back.count() == 4)
    assert(back.select("auth_seq_id").distinct().as[Int].collect().toSeq
      == Seq(1))
  }

  test("cli: sifts + validation + annotations + variants merge legs") {
    val pdb = writePdb()
    val dir = Files.createTempDirectory("graft_cli_legs")
    def write(name: String, content: String): String = {
      Files.writeString(dir.resolve(name), content); dir.resolve(name).toString
    }
    // chain A residue 1 cross-referenced to UniProt P00439 position 18
    val sifts = write("s.xml",
      "<entry><entity type=\"protein\" entityId=\"A\">" +
      "<segment segId=\"s_A\" start=\"1\" end=\"1\"><listResidue>" +
      "<residue dbSource=\"PDBe\" dbCoordSys=\"PDBe\" dbResNum=\"1\" dbResName=\"ALA\">" +
      "<crossRefDb dbSource=\"PDB\" dbCoordSys=\"PDBresnum\" dbAccessionId=\"2pah\" dbResNum=\"1\" dbResName=\"ALA\" dbChainId=\"A\"/>" +
      "<crossRefDb dbSource=\"UniProt\" dbCoordSys=\"UniProt\" dbAccessionId=\"P00439\" dbResNum=\"18\" dbResName=\"A\"/>" +
      "</residue></listResidue></segment></entity></entry>")
    val validation = write("v.xml",
      "<wwPDB-validation-information>" +
      "<ModelledSubgroup model=\"1\" chain=\"A\" resnum=\"1\" " +
      "resname=\"ALA\" icode=\" \" rsr=\"0.30\"/>" +
      "</wwPDB-validation-information>")
    val gff = write("a.gff",
      "##gff-version 3\n" +
      "P00439\tUniProtKB\tDomain\t10\t20\t.\t.\t.\tID=PRO_1;Note=ACT\t\n")
    val variants = write("vars.json",
      "{\"accession\":\"P00439\",\"begin\":18,\"variant_id\":\"VAR_001\"}")
    val out = Files.createTempDirectory("graft_cli_legs_out").toString + "/pq"
    Cli.main(Array("--atoms", pdb, "--output", out,
      "--output-type", "parquet", "--sifts", sifts,
      "--validation", validation, "--annotations", gff,
      "--variants", variants, "--uniprot", "P00439"))
    val back = spark.read.parquet(out)
    val a = back.filter(col("auth_asym_id") === "A")
    assert(a.count() == 4) // four chain-A atoms, all legs left-joined on
    val row = a.select("validation_rsr", "UniProt_dbResNum", "annotation",
      "variant_id", "accession_x", "accession_y").distinct().collect()
    assert(row.length == 1)
    assert(row.head.getDouble(0) == 0.30)
    assert(row.head.getString(1) == "18")
    assert(row.head.getString(2) == "Domain: ACT (PRO_1)")
    assert(row.head.getString(3) == "VAR_001")
    assert(row.head.getString(4) == "P00439" &&
      row.head.getString(5) == "P00439")
    // chain B atoms survive with null SIFTS legs
    assert(back.filter(col("auth_asym_id") === "B")
      .select("UniProt_dbResNum").distinct().collect().head.isNullAt(0))
  }

  test("cli: --annotations without --sifts is rejected") {
    val e = intercept[IllegalArgumentException](Cli.main(Array(
      "--atoms", writePdb(), "--output", "/tmp/graft_cli_bad2",
      "--annotations", "whatever.gff")))
    assert(e.getMessage.contains("--sifts"))
  }

  test("cli: --annotations without --uniprot is rejected") {
    // without the accession the annotation table's join key is null
    // and every annotation column would silently come back null
    val e = intercept[IllegalArgumentException](Cli.parseArgs(
      Seq("--atoms", "x", "--output", "y",
        "--sifts", "s.xml", "--annotations", "a.gff")))
    assert(e.getMessage.contains("--uniprot"))
  }

  test("cli: config file supplies defaults, db_root resolves paths, CLI overrides") {
    val dir = Files.createTempDirectory("graft_cli_cfg")
    val cfg = dir.resolve("config.ini")
    Files.writeString(cfg,
      s"""# graft config (reference config.ini shape)
         |[Global]
         |db_root = ${dir.toString}
         |db_pdb = ...
         |atoms = pdbin
         |output = outdir
         |output_type = tab
         |chains = A
         |""".stripMargin)
    val parsed = Cli.parseArgs(Seq("--config", cfg.toString))
    assert(parsed("atoms") == dir.resolve("pdbin").toString)
    assert(parsed("output") == dir.resolve("outdir").toString)
    assert(parsed("output-type") == "tab")
    // CLI args override config defaults
    val over = Cli.parseArgs(Seq("--config", cfg.toString,
      "--output-type", "parquet"))
    assert(over("output-type") == "parquet")
    // db* placeholder resolves to the temp dir (config.py:85)
    assert(Config.load(cfg.toString)("db_pdb")
      == System.getProperty("java.io.tmpdir"))
    // end-to-end: the config alone drives a tab-separated run
    val pdb = writePdb()
    java.nio.file.Files.move(java.nio.file.Path.of(pdb),
      dir.resolve("pdbin"))
    Cli.main(Array("--config", cfg.toString))
    val back = spark.read.option("header", "true").option("sep", "\t")
      .csv(dir.resolve("outdir").toString)
    assert(back.count() == 4)
    assert(back.columns.length > 1) // the tab delimiter actually split
    assert(back.select("auth_asym_id").distinct()
      .as[String].collect().toSeq == Seq("A"))
  }

  test("cli: falsy flag values in a config do not enable the flag") {
    val dir = Files.createTempDirectory("graft_cli_flag")
    val cfg = dir.resolve("config.ini")
    Files.writeString(cfg,
      """[Global]
        |atoms = /in.pdb
        |output = /out
        |keep_altlocs = false
        |keep_partial = true
        |""".stripMargin)
    val parsed = Cli.parseArgs(Seq("--config", cfg.toString))
    // Cli tests flag PRESENCE — `keep_altlocs = false` must not
    // smuggle the key in and silently skip altloc collapse
    assert(!parsed.contains("keep-altlocs"))
    assert(parsed.contains("keep-partial"))
  }

  test("cli: rejects missing required args and bad output type") {
    intercept[IllegalArgumentException](Cli.parseArgs(Seq("--atoms", "x")))
    intercept[IllegalArgumentException](Cli.parseArgs(Seq("--output")))
    // a value-taking option must not consume the next option token
    val e = intercept[IllegalArgumentException](Cli.parseArgs(
      Seq("--atoms", "x", "--output", "y", "--chains", "--res", "1")))
    assert(e.getMessage.contains("missing value for --chains"))
    intercept[IllegalArgumentException](
      Cli.main(Array("--atoms", writePdb(), "--output", "/tmp/graft_cli_bad",
        "--output-type", "nope")))
  }
}
