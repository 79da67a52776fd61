package graft.sources

import graft.SparkSpec
import graft.operators.TableGenerator
import java.nio.file.Files
import org.apache.spark.sql.functions._

class ValidationSpec extends SparkSpec {
  import sqlImplicits._

  private def writeTmp(name: String, content: String): String = {
    val dir = Files.createTempDirectory("graft_val")
    Files.writeString(dir.resolve(name), content)
    dir.resolve(name).toString
  }

  private val xml =
    "<wwPDB-validation-information><Entry attemptedValidationSteps=\"all\"/>" +
    "<ModelledSubgroup model=\"1\" chain=\"A\" seq=\"1\" resnum=\"10\" " +
    "resname=\"ALA\" icode=\" \" altcode=\" \" rsr=\"0.30\" " +
    "NatomsEDS=\"5\" phi=\"-60.5\" rama=\"Favored\"/>" +
    "<ModelledSubgroup model=\"1\" chain=\"A\" seq=\"2\" resnum=\"11\" " +
    "resname=\"GLY\" icode=\"A\" altcode=\"?\" rsr=\"0.15\" " +
    "NatomsEDS=\"4\" rama=\"OUTLIER\"/>" +
    "<ModelledSubgroup model=\"1\" chain=\"B\" seq=\"3\" resnum=\"10\" " +
    "resname=\"SER\" rsr=\"0.22\" NatomsEDS=\"6\" phi=\"120\"/>" +
    "</wwPDB-validation-information>"

  test("validationResidues: attribute union, prefix, fixes, dtypes") {
    val t = Validation.validationResidues(spark, writeTmp("v.xml", xml))
    // attribute union across rows, validation_ prefix, children ignored
    assert(t.columns.toSet == Set("validation_model", "validation_chain",
      "validation_seq", "validation_resnum", "validation_resname",
      "validation_icode", "validation_altcode", "validation_rsr",
      "validation_NatomsEDS", "validation_phi", "validation_rama"))
    val rows = t.orderBy("validation_seq")
      .select("validation_chain", "validation_resnum", "validation_icode",
        "validation_altcode", "validation_rama")
      .as[(String, String, String, String, String)].collect().toSeq
    // blank icode -> '?', missing icode -> '?' (validation.py:76-88);
    // blank/'?'/missing altcode -> '.' (validation.py:91-103)
    assert(rows == Seq(
      ("A", "10", "?", ".", "Favored"),
      ("A", "11", "A", ".", "OUTLIER"),
      ("B", "10", "?", ".", null)))
    // reference dtype constraints (library.py:506): model/NatomsEDS
    // integral, rsr/phi floating, resnum stays a STRING
    val sch = t.schema
    assert(sch("validation_model").dataType.typeName == "long")
    assert(sch("validation_NatomsEDS").dataType.typeName == "long")
    assert(sch("validation_rsr").dataType.typeName == "double")
    assert(sch("validation_phi").dataType.typeName == "double")
    assert(sch("validation_resnum").dataType.typeName == "string")
    // missing numeric attr -> null, not zero
    assert(t.filter($"validation_seq" === "2")
      .select("validation_phi").head().isNullAt(0))
  }

  test("validationResidues: excluded columns + raise on empty") {
    val t = Validation.validationResidues(spark, writeTmp("v.xml", xml),
      excludedCols = Seq("validation_rama", "validation_phi"))
    assert(!t.columns.contains("validation_rama"))
    assert(!t.columns.contains("validation_phi"))
    val empty =
      "<wwPDB-validation-information><Entry a=\"b\"/>" +
      "</wwPDB-validation-information>"
    intercept[Exception] {
      Validation.validationResidues(spark, writeTmp("e.xml", empty))
    }
  }

  test("filterValidation: res_full, chain/res knobs, raise on empty") {
    val t = Validation.validationResidues(spark, writeTmp("v.xml", xml))
    val full = Validation.filterValidation(t)
    // res_full = resnum + icode with '?' stripped (validation.py:104)
    assert(full.orderBy("validation_seq").select("validation_resnum_full")
      .as[String].collect().toSeq == Seq("10", "11A", "10"))
    val chainA = Validation.filterValidation(t, chains = Some(Seq("A")))
    assert(chainA.count() == 2)
    val res10 = Validation.filterValidation(t, res = Some(Seq("10")))
    assert(res10.select("validation_chain").as[String].collect().toSet ==
      Set("A", "B"))
    intercept[Exception] {
      Validation.filterValidation(t, chains = Some(Seq("Z")))
    }
  }

  test("withRegions equals brute-force interval scan on random data") {
    // the packed-array broadcast probe must match a literal
    // re-implementation of the reference loop (scan all regions of
    // the residue's (entity, source, accession); keep the LAST
    // counter whose [start, end] contains resnum) on arbitrary
    // overlapping / disjoint / empty interval sets
    val rnd = new scala.util.Random(41)
    (1 to 10).foreach { trial =>
      val nReg = rnd.nextInt(30) + 1
      val regions = (1 to nReg).map { i =>
        val e = s"E${rnd.nextInt(3)}"
        val src = s"S${rnd.nextInt(3)}"
        val acc = s"A${rnd.nextInt(4)}"
        val start = rnd.nextInt(50)
        (e, src, acc, start, start + rnd.nextInt(20))
      }
      // per-(entity, source) counters in insertion order, as the
      // parser's row_number produces
      val withIds = regions.groupBy(r => (r._1, r._2)).toSeq.flatMap {
        case (_, rs) => rs.zipWithIndex.map { case (r, i) => (r, i + 1L) }
      }
      val regDf = withIds.map { case ((e, s0, a, st, en), id) =>
        (e, s0, id, a, st, en, "-") }
        .toDF("entityId", "dbSource", "regionId", "dbAccessionId",
          "start", "end", "dbCoordSys")
      val residues = (1 to 40).map { i =>
        (i, s"E${rnd.nextInt(3)}", s"S${rnd.nextInt(3)}",
          s"A${rnd.nextInt(4)}", rnd.nextInt(80))
      }.toDF("rid", "entityId", "_dbSource", "_dbAccessionId", "resnum")
      val got = graft.sources.Xml.withRegions(residues, regDf)
        .select("rid", "regionId", "regionStart", "regionEnd",
          "regionResNum")
        .as[(Int, Option[Long], Option[Int], Option[Int], Option[Int])]
        .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
      val lookup = withIds.groupBy { case ((e, s0, a, _, _), _) => (e, s0, a) }
      residues.as[(Int, String, String, String, Int)].collect()
        .foreach { case (rid, e, s0, a, rn) =>
          val hits = lookup.getOrElse((e, s0, a), Nil)
            .filter { case ((_, _, _, st, en), _) => rn >= st && rn <= en }
          val expected =
            if (hits.isEmpty) (None, None, None, None)
            else {
              val ((_, _, _, st, en), id) = hits.maxBy(_._2)
              (Some(id), Some(st), Some(en), Some(rn))
            }
          assert(got(rid) == expected,
            s"trial $trial residue $rid ($e,$s0,$a,$rn): " +
              s"got ${got(rid)}, expected $expected")
        }
    }
  }

  test("TableGenerator: validation leg merges on res_full x chain") {
    // mmcif_validation_table_merger (mergers.py:103): left merge of the
    // atom table on [auth_seq_id_full, auth_asym_id] against
    // [validation_resnum_full, validation_chain]
    val atoms = Seq(
      ("ATOM", 1, "N", "", "ALA", "A", 10, "", 0.0, 0.0, 0.0, 1.0, 0.0, "N"),
      ("ATOM", 2, "CA", "", "ALA", "A", 10, "", 1.0, 0.0, 0.0, 1.0, 0.0, "C"),
      ("ATOM", 3, "C", "", "ALA", "A", 10, "", 2.0, 0.0, 0.0, 1.0, 0.0, "C"),
      ("ATOM", 4, "O", "", "ALA", "A", 10, "", 3.0, 0.0, 0.0, 1.0, 0.0, "O"),
      ("ATOM", 5, "N", "", "GLY", "A", 11, "A", 0.0, 2.0, 0.0, 1.0, 0.0, "N"),
      ("ATOM", 6, "CA", "", "GLY", "A", 11, "A", 1.0, 2.0, 0.0, 1.0, 0.0, "C"),
      ("ATOM", 7, "C", "", "GLY", "A", 11, "A", 2.0, 2.0, 0.0, 1.0, 0.0, "C"),
      ("ATOM", 8, "O", "", "GLY", "A", 11, "A", 3.0, 2.0, 0.0, 1.0, 0.0, "O"))
      .toDF(StructureFormats.PdbAtomFields.map(_.name): _*)
      .withColumn("auth_seq_id_full",
        concat(col("auth_seq_id"), col("pdbx_PDB_ins_code")))
    val v = Validation.filterValidation(
      Validation.validationResidues(spark, writeTmp("v.xml", xml)))
    val merged = TableGenerator.generate(atoms,
      annotations = Seq(v -> Seq(
        "auth_seq_id_full" -> "validation_resnum_full",
        "auth_asym_id" -> "validation_chain")))
    // res 10 (no ins code) picks up the chain-A resnum-10 row; the
    // ins-code residue 11A matches the icode='A' validation row
    assert(merged.filter(col("auth_seq_id") === 10)
      .select("validation_rsr").as[Double].collect().toSet == Set(0.30))
    assert(merged.filter(col("auth_seq_id") === 11)
      .select("validation_rama").as[String].collect().toSet ==
      Set("OUTLIER"))
    assert(merged.count() == 8)
  }
}
