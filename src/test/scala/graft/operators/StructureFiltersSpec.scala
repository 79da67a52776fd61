package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins StructureFilters (filter_dssp / filter_sifts analogs,
  * dssp.py:342-408 / sifts.py:378-420) and the RSA builders against
  * hand-computed reference values. */
class StructureFiltersSpec extends SparkSpec {
  import sqlImplicits._

  // ---- RSA (get_rsa, dssp.py:249) --------------------------------------

  test("addRsa matches get_rsa for all three ASA methods") {
    val df = Seq(("A", 50.0), ("G", 84.0), ("W", 100.0)).toDF("AA", "ACC")
    def rsaOf(method: String, aa: String): Double =
      StructureFilters.addRsa(df, method).filter($"AA" === aa)
        .select("RSA").as[Double].head()
    // round(50 / ASA[ALA] * 100, 3) per table (library.py:249-272)
    assert(rsaOf("Sander", "A") == 47.17)       // 50/106*100
    assert(rsaOf("Miller", "A") == 44.248)      // 50/113*100
    assert(rsaOf("Wilke", "A") == 38.76)        // 50/129*100
    assert(rsaOf("Sander", "G") == 100.0)       // 84/84*100
    assert(rsaOf("Miller", "W") == 38.61)       // 100/259*100
  }

  test("addRsa: unknown method raises, unmapped letter yields null") {
    val df = Seq(("X", Some(50.0)), ("-", Some(10.0)), ("A", None))
      .toDF("AA", "ACC")
    intercept[IllegalArgumentException] {
      StructureFilters.addRsa(df, "Bogus")
    }
    // X → LNT and '-' → '---' have no ASA entry (the reference's
    // KeyError → empty-string RSA); null ACC is the ValueError path
    val out = StructureFilters.addRsa(df, "Sander")
    assert(out.filter($"RSA".isNotNull).count() == 0)
  }

  test("addRsaClass thresholds match get_rsa_class (dssp.py:289)") {
    val df = Seq(
      (1, Some(25.0)), (2, Some(24.999)), (3, Some(5.0)),
      (4, Some(4.999)), (5, None)).toDF("id", "RSA")
    val out = StructureFilters.addRsaClass(df).orderBy("id")
      .select("RSA_CLASS").as[String].collect().toSeq
    assert(out == Seq("Surface", "Part. Exposed", "Part. Exposed",
      "Core", "-"))
  }

  // ---- filterDssp (dssp.py:342) ----------------------------------------

  // one BioUnit copy boundary ('!*' between same-chain neighbors) and
  // one dropped '!' placeholder; residue 3 has a null SS
  private def dsspTable = Seq(
    ("f1", 1, 10, "A", "A", Some("H"), Some(50.0)),
    ("f1", 2, 0, "A", "!*", None, None),
    ("f1", 3, 11, "A", "G", None, Some(84.0)),
    ("f1", 4, 0, "A", "!", None, None),
    ("f1", 5, 12, "B", "E", Some("E"), Some(100.0)))
    .toDF("file", "LINE", "RES", "CHAIN", "AA", "SS", "ACC")

  test("filterDssp default knobs: full chain + RSA, markers dropped") {
    val out = StructureFilters.filterDssp(dsspTable)
    assert(out.columns.contains("CHAIN_FULL") && out.columns.contains("RSA"))
    val rows = out.orderBy("LINE")
      .select("LINE", "CHAIN_FULL", "AA", "SS", "RSA")
      .as[(Int, String, String, String, Option[Double])].collect().toSeq
    // marker rows gone; rows after the copy boundary re-lettered with
    // suffix 'A' (a plain '!' does NOT touch the counter, so chain B
    // is suffixed too, exactly as the reference's row loop behaves);
    // null SS filled with '-'; Sander RSA: 50/106, 84/84, 100/194
    assert(rows == Seq(
      (1, "A", "A", "H", Some(47.17)),
      (3, "AA", "G", "-", Some(100.0)),
      (5, "BA", "E", "E", Some(51.546))))
  }

  test("filterDssp optional knobs: reduced SS, RSA class, id reset") {
    val out = StructureFilters.filterDssp(dsspTable,
      addSsReduced = true, addRsaClass = true, resetResId = true,
      rsaMethod = "Wilke")
    val rows = out.orderBy("RES")
      .select("LINE", "RES", "SS_CLASS", "RSA", "RSA_CLASS")
      .as[(Int, Int, String, Option[Double], String)].collect().toSeq
    // LINE renumbered 1..3; Wilke: 50/129→38.76 Surface,
    // 84/104→80.769 Surface, 100/223→44.843 Surface
    assert(rows == Seq(
      (1, 10, "H", Some(38.76), "Surface"),
      (2, 11, "-", Some(80.769), "Surface"),
      (3, 12, "E", Some(44.843), "Surface")))
  }

  test("filterDssp selections and raise-on-empty") {
    val byChain = StructureFilters.filterDssp(dsspTable, chains = Seq("B"))
    assert(byChain.select("RES").as[Int].collect().toSeq == Seq(12))
    val byFull = StructureFilters.filterDssp(dsspTable,
      chainsFull = Seq("AA"))
    assert(byFull.select("RES").as[Int].collect().toSeq == Seq(11))
    val byRes = StructureFilters.filterDssp(dsspTable, res = Seq(10, 12),
      addFullChain = false)
    assert(byRes.count() == 2)
    val ex = intercept[IllegalStateException] {
      StructureFilters.filterDssp(dsspTable, chains = Seq("Z"))
    }
    assert(ex.getMessage.contains("empty DataFrame"))
  }

  test("filterDssp excluded columns drop before the recodes") {
    val out = StructureFilters.filterDssp(dsspTable,
      excludedCols = Seq("ACC", "absent"), addRsa = false)
    assert(!out.columns.contains("ACC"))
  }

  // ---- filterSifts (sifts.py:378) --------------------------------------

  private def siftsTable = Seq(
    ("A", "A", "10", "P001", "100"),
    ("A", "C", "11", "P001", "101"),
    ("B", "B", "12", "P002", "102"))
    .toDF("PDB_entityId", "PDB_dbChainId", "PDB_dbResNum",
      "UniProt_dbAccessionId", "UniProt_dbResNum")

  test("filterSifts five selectors + raise-on-empty") {
    def ids(t: org.apache.spark.sql.DataFrame): Seq[String] =
      t.select("PDB_dbResNum").as[String].collect().toSeq.sorted
    assert(ids(StructureFilters.filterSifts(siftsTable,
      chains = Seq("A"))) == Seq("10", "11"))
    assert(ids(StructureFilters.filterSifts(siftsTable,
      chainAuth = Seq("C"))) == Seq("11"))
    assert(ids(StructureFilters.filterSifts(siftsTable,
      res = Seq("12"))) == Seq("12"))
    assert(ids(StructureFilters.filterSifts(siftsTable,
      uniprot = Seq("P001"), site = Seq("101"))) == Seq("11"))
    assert(ids(StructureFilters.filterSifts(siftsTable,
      excludedCols = Seq("UniProt_dbResNum"))) == Seq("10", "11", "12"))
    intercept[IllegalStateException] {
      StructureFilters.filterSifts(siftsTable, uniprot = Seq("P999"))
    }
  }
}
