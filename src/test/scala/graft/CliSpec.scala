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

  test("cli: rejects missing required args and bad output type") {
    intercept[IllegalArgumentException](Cli.parseArgs(Seq("--atoms", "x")))
    intercept[IllegalArgumentException](Cli.parseArgs(Seq("--output")))
    intercept[IllegalArgumentException](
      Cli.main(Array("--atoms", writePdb(), "--output", "/tmp/graft_cli_bad",
        "--output-type", "nope")))
  }
}
