package graft.operators

import graft.SparkSpec
import graft.sources.Xml
import org.apache.spark.sql.functions._

/** TableMerger (mergers.py:29-201,403), Annotations
  * (annotation.py:67-134) and the wide SIFTS pivot (sifts.py:141). */
class TableMergerSpec extends SparkSpec {
  import sqlImplicits._

  private def mmcif = Seq(
    ("A", "1", "n1"), ("A", "2", "n2"), ("B", "1", "n3"))
    .toDF("auth_asym_id", "auth_seq_id_full", "atom_tag")
  private def dssp = Seq(("1", "A", "H"), ("2", "A", "E"))
    .toDF("RES_FULL", "CHAIN_FULL", "SS")
  private def validation = Seq(("1", "A", 0.5), ("1", "B", 0.9))
    .toDF("validation_resnum_full", "validation_chain", "validation_rsr")
  private def sifts = Seq(
    ("1", "A", "P1", "18"), ("2", "A", "P1", "19"), ("1", "B", "P2", "18"))
    .toDF("PDB_dbResNum", "PDB_dbChainId",
      "UniProt_dbAccessionId", "UniProt_dbResNum")

  test("mmcifDsspMerger joins on (seq_id_full, asym_id)") {
    val out = TableMerger.mmcifDsspMerger(mmcif, dssp)
    assert(out.count() == 3)
    assert(out.filter(col("atom_tag") === "n1")
      .select("SS").as[String].head() == "H")
    assert(out.filter(col("atom_tag") === "n3")
      .select("SS").as[(String)].collect().head == null)
  }

  test("mmcifDsspMerger BioUnit branch: orig_ chain key wins only when sets differ") {
    // suffixed bio-unit chains: asym ids AA/BA, orig ids A/B
    val bio = Seq(("AA", "A", "1", "n1"), ("BA", "B", "1", "n3"))
      .toDF("auth_asym_id", "orig_auth_asym_id", "auth_seq_id_full",
        "atom_tag")
    val out = TableMerger.mmcifDsspMerger(bio, dssp)
    assert(out.filter(col("atom_tag") === "n1")
      .select("SS").as[String].head() == "H")
    // sets agree → plain key, orig ignored
    val same = Seq(("A", "Z", "1", "n1"))
      .toDF("auth_asym_id", "orig_auth_asym_id", "auth_seq_id_full",
        "atom_tag")
    val out2 = TableMerger.mmcifDsspMerger(same, dssp.filter(col("CHAIN_FULL") === "A"))
    assert(out2.select("SS").as[String].head() == "H")
  }

  test("mergers raise the reference's TableMergerError on missing columns") {
    val bad = Seq(("A", 1)).toDF("auth_asym_id", "other")
    val e = intercept[IllegalArgumentException] {
      TableMerger.mmcifDsspMerger(bad, dssp)
    }
    assert(e.getMessage.contains("necessary columns are missing"))
    intercept[IllegalArgumentException] {
      TableMerger.siftsVariantsMerger(sifts, Seq(1).toDF("x"))
    }
  }

  test("tableMerger full chain matches per-leg expectations") {
    val annotation = Seq(("P1", "18", "Domain")).toDF(
      "accession", "site", "annotation")
    val variants = Seq(("P1", 19, "VAR_1")).toDF(
      "accession", "begin", "variant_id")
    val out = TableMerger.tableMerger(
      mmcif = Some(mmcif), dssp = Some(dssp), sifts = Some(sifts),
      validation = Some(validation), annotation = Some(annotation),
      variants = Some(variants))
    // (A,1): dssp H, validation 0.5, sifts P1/18, annotation Domain, no variant
    val a1 = out.filter(col("atom_tag") === "n1")
      .select("SS", "validation_rsr", "annotation", "variant_id")
      .collect().head
    assert(a1.getString(0) == "H" && a1.getDouble(1) == 0.5 &&
      a1.getString(2) == "Domain" && a1.isNullAt(3))
    // (A,2): variant VAR_1 via begin cast to string
    assert(out.filter(col("atom_tag") === "n2")
      .select("variant_id").as[String].head() == "VAR_1")
  }

  test("tableMerger guards: fewer than two tables raises") {
    val e = intercept[IllegalArgumentException] {
      TableMerger.tableMerger(mmcif = Some(mmcif))
    }
    assert(e.getMessage.contains("At least two Tables"))
    intercept[IllegalArgumentException] { TableMerger.tableMerger() }
    // sifts-only side works when two tables present
    val annotation = Seq(("P1", "18", "Domain")).toDF(
      "accession", "site", "annotation")
    assert(TableMerger.tableMerger(sifts = Some(sifts),
      annotation = Some(annotation)).count() == 3)
  }

  test("annotationAggregation: expansion, label forms, file-order concat") {
    // two overlapping features + one dropped type
    val feats = Seq(
      (1L, "Domain", 2L, 4L, null.asInstanceOf[String], "PRO_1"),
      (2L, "Active site", 3L, 3L, "proton acceptor",
        null.asInstanceOf[String]),
      (3L, "Helix", 1L, 9L, null.asInstanceOf[String],
        null.asInstanceOf[String]))
      .toDF("line_id", "TYPE", "START", "END", "Note", "ID")
    val out = Annotations.annotationAggregation(
      feats, identifier = Some("P00439"))
    val rows = out.orderBy(col("site").cast("long"))
      .select("site", "annotation", "accession")
      .as[(String, String, String)].collect()
    // Helix dropped; positions 2..4 from Domain, 3 also Active site
    assert(rows.map(_._1).toSeq == Seq("2", "3", "4"))
    assert(rows(0)._2 == "Domain (PRO_1)")
    assert(rows(1)._2 == "Domain (PRO_1), Active site: proton acceptor")
    assert(rows(2)._2 == "Domain (PRO_1)")
    assert(rows.forall(_._3 == "P00439"))
  }

  test("annotationAggregation ungrouped keeps per-feature rows with positional site") {
    val feats = Seq((1L, "Domain", 2L, 3L, null.asInstanceOf[String],
      null.asInstanceOf[String]))
      .toDF("line_id", "TYPE", "START", "END", "Note", "ID")
    val out = Annotations.annotationAggregation(feats,
      groupResidues = false)
    assert(out.columns.toSeq ==
      Seq("idx", "annotation", "site", "accession"))
    assert(out.orderBy("idx").select("site").as[String].collect().toSeq ==
      Seq("0", "1"))
  }

  test("annotationAggregation queryType overrides dropTypes; empty raises") {
    val feats = Seq((1L, "Helix", 1L, 2L, null.asInstanceOf[String],
      null.asInstanceOf[String]))
      .toDF("line_id", "TYPE", "START", "END", "Note", "ID")
    // queryType selects the would-be-dropped type (annotation.py:83-86)
    assert(Annotations.annotationAggregation(feats,
      queryType = Some("Helix")).count() == 2)
    val e = intercept[IllegalArgumentException] {
      Annotations.annotationAggregation(feats) // Helix dropped → empty
    }
    assert(e.getMessage.contains("empty DataFrame"))
  }

  test("siftsResiduesWide pivots long rows with region fills") {
    val none: Option[Long] = None
    val long = Seq(
      ("A", 1, "PDB", "2pah", "101", "VAL", "A",
        none, none, none, none),
      ("A", 1, "UniProt", "P00439", "18", "V", null.asInstanceOf[String],
        Some(1L), Some(1L), Some(200L), Some(1L)),
      ("A", 2, "PDB", "2pah", "102", "VAL", "A",
        none, none, none, none))
      .toDF("entityId", "resnum", "dbSource", "dbAccessionId", "dbResNum",
        "dbResName", "dbChainId", "regionId", "regionStart", "regionEnd",
        "regionResNum")
    val wide = Xml.siftsResiduesWide(long)
    assert(wide.count() == 2)
    val r1 = wide.filter(col("PDB_dbResNum") === "101").collect().head
    assert(r1.getAs[String]("UniProt_dbAccessionId") == "P00439")
    assert(r1.getAs[String]("UniProt_regionId") == "1")
    assert(r1.getAs[String]("PDB_regionId") == "-")      // fill
    assert(r1.getAs[Long]("PDB_regionStart") == 0L)      // fill
    assert(r1.getAs[String]("PDB_Annotation") == "Observed")
    assert(r1.getAs[String]("PDB_entityId") == "A")
    // residue 2 has no UniProt row → nulls, fills still applied
    val r2 = wide.filter(col("PDB_dbResNum") === "102").collect().head
    assert(r2.getAs[String]("UniProt_dbAccessionId") == null)
    assert(r2.getAs[String]("UniProt_regionId") == "-")
  }
}
