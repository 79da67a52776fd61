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

  // (group_PDB, id, model, chain, seq, icode, comp, atom, alt, x, type)
  private def structAtoms = {
    import sqlImplicits._
    Seq(
      // model-1 chain A residue 1: complete GLY + one H + an altloc
      // pair on CA (ids 3 and 4)
      ("ATOM", 1, 1, "A", 1, "?", "GLY", "N", ".", 1.0, "N"),
      ("ATOM", 2, 1, "A", 1, "?", "GLY", "O", ".", 2.0, "O"),
      ("ATOM", 3, 1, "A", 1, "?", "GLY", "CA", "A", 3.0, "C"),
      ("ATOM", 4, 1, "A", 1, "?", "GLY", "CA", "B", 5.0, "C"),
      ("ATOM", 5, 1, "A", 1, "?", "GLY", "C", ".", 4.0, "C"),
      ("ATOM", 6, 1, "A", 1, "?", "GLY", "H", ".", 9.0, "H"),
      // model-1 chain A residue 2: GLY missing C -> partial
      ("ATOM", 7, 1, "A", 2, "A", "GLY", "N", ".", 1.0, "N"),
      ("ATOM", 8, 1, "A", 2, "A", "GLY", "O", ".", 2.0, "O"),
      ("ATOM", 9, 1, "A", 2, "A", "GLY", "CA", ".", 3.0, "C"),
      // water HETATM: not a standard residue, survives partial check
      ("HETATM", 10, 1, "A", 90, "?", "HOH", "O", ".", 8.0, "O"),
      // model 2 copy, dropped by models='first'
      ("ATOM", 11, 2, "A", 1, "?", "GLY", "N", ".", 1.0, "N"))
      .toDF("group_PDB", "id", "pdbx_PDB_model_num", "auth_asym_id",
        "auth_seq_id", "pdbx_PDB_ins_code", "auth_comp_id",
        "auth_atom_id", "label_alt_id", "Cartn_x", "type_symbol")
  }

  test("filterStructures: models-first, hydrogens, res_full, reset ids") {
    import sqlImplicits._
    val out = StructureFilters.filterStructures(structAtoms)
    // model 2 gone, H gone; ids re-numbered densely over id order
    assert(out.count() == 9)
    assert(out.select("pdbx_PDB_model_num").distinct()
      .as[Int].collect().toSeq == Seq(1))
    assert(out.filter($"type_symbol" === "H").isEmpty)
    assert(out.orderBy("id").select("id").as[Int].collect().toSeq ==
      (1 to 9))
    // res_full: seq + ins code with '?' stripped
    assert(out.filter($"auth_seq_id" === 2)
      .select("auth_seq_id_full").distinct().as[String].head() == "2A")
  }

  test("filterStructures: remove_altloc keeps first, remove_partial_res drops incomplete") {
    import sqlImplicits._
    val out = StructureFilters.filterStructures(structAtoms,
      removeAltloc = true, removePartialRes = true)
    // altloc pair -> one CA (id 3's value), marker blanked
    val ca = out.filter($"auth_seq_id" === 1 && $"auth_atom_id" === "CA")
    assert(ca.count() == 1)
    assert(ca.select("Cartn_x").as[Double].head() == 3.0)
    assert(ca.select("label_alt_id").as[String].head() == ".")
    // partial residue 2 dropped entirely; HOH survives
    assert(out.filter($"auth_seq_id" === 2).isEmpty)
    assert(out.filter($"auth_comp_id" === "HOH").count() == 1)
  }

  test("filterStructures: comps/atoms selections and centroid aggregation") {
    import sqlImplicits._
    val out = StructureFilters.filterStructures(structAtoms,
      comps = Seq("GLY"), residueAgg = true)
    // residue 1 (model 1): mean x over N,O,CA(A),CA(B),C after H drop
    val r1 = out.filter($"auth_seq_id" === 1)
    assert(r1.count() == 1)
    assert(r1.select("Cartn_x").as[Double].head() == 3.0) // (1+2+3+5+4)/5
    assert(r1.select("auth_atom_id").as[String].head() == "N") // first
    // backbone_centroid via the atoms knob
    val bb = StructureFilters.filterStructures(structAtoms,
      comps = Seq("GLY"), atoms = Seq("backbone_centroid"))
    assert(bb.filter($"auth_seq_id" === 1)
      .select("Cartn_x").as[Double].head() == 3.0) // N,O,CA,CA,C all backbone
    intercept[IllegalArgumentException] {
      StructureFilters.filterStructures(structAtoms, residueAgg = true,
        aggMethod = "nope")
    }
    intercept[IllegalStateException] {
      StructureFilters.filterStructures(structAtoms, chains = Seq("Z"))
    }
  }

  test("filterStructures: per-model scoping and inventory-only completeness") {
    import sqlImplicits._
    // models=Seq(1,2): model 2's copy of residue 1 must keep its own
    // atoms under remove_altloc (per-structure scope, not one winner
    // across models) and complete from its OWN atom set; residue 3's
    // OXT must not mask its missing CA (set(default)-set(observed))
    val atoms = Seq(
      ("ATOM", 1, 1, "A", 1, "?", "GLY", "N", ".", 1.0, "N"),
      ("ATOM", 2, 1, "A", 1, "?", "GLY", "O", ".", 2.0, "O"),
      ("ATOM", 3, 1, "A", 1, "?", "GLY", "CA", "A", 3.0, "C"),
      ("ATOM", 4, 1, "A", 1, "?", "GLY", "CA", "B", 5.0, "C"),
      ("ATOM", 5, 1, "A", 1, "?", "GLY", "C", ".", 4.0, "C"),
      // GLY 3: N,O,C,OXT — 4 distinct atoms but CA missing
      ("ATOM", 6, 1, "A", 3, "?", "GLY", "N", ".", 1.0, "N"),
      ("ATOM", 7, 1, "A", 3, "?", "GLY", "O", ".", 2.0, "O"),
      ("ATOM", 8, 1, "A", 3, "?", "GLY", "C", ".", 4.0, "C"),
      ("ATOM", 9, 1, "A", 3, "?", "GLY", "OXT", ".", 6.0, "O"),
      // model 2: complete copy of residue 1
      ("ATOM", 11, 2, "A", 1, "?", "GLY", "N", ".", 10.0, "N"),
      ("ATOM", 12, 2, "A", 1, "?", "GLY", "O", ".", 20.0, "O"),
      ("ATOM", 13, 2, "A", 1, "?", "GLY", "CA", "A", 30.0, "C"),
      ("ATOM", 14, 2, "A", 1, "?", "GLY", "C", ".", 40.0, "C"))
      .toDF("group_PDB", "id", "pdbx_PDB_model_num", "auth_asym_id",
        "auth_seq_id", "pdbx_PDB_ins_code", "auth_comp_id",
        "auth_atom_id", "label_alt_id", "Cartn_x", "type_symbol")
    val out = StructureFilters.filterStructures(atoms, models = Seq(1, 2),
      removeAltloc = true, removePartialRes = true)
    assert(out.filter($"auth_atom_id" === "CA").count() == 2)
    assert(out.filter($"pdbx_PDB_model_num" === 2).count() == 4)
    assert(out.filter($"auth_seq_id" === 3).isEmpty)
  }

  test("filterStructures: models-first resolves per file") {
    import sqlImplicits._
    // f1's first model is 1, f2's is 3 — a global first-row lookup
    // would empty f2 out entirely
    val atoms = Seq(
      ("ATOM", 1, 1, "A", 1, "?", "GLY", "N", ".", 1.0, "N", "f1"),
      ("ATOM", 2, 2, "A", 1, "?", "GLY", "N", ".", 2.0, "N", "f1"),
      ("ATOM", 3, 3, "A", 1, "?", "GLY", "N", ".", 3.0, "N", "f2"),
      ("ATOM", 4, 4, "A", 1, "?", "GLY", "N", ".", 4.0, "N", "f2"))
      .toDF("group_PDB", "id", "pdbx_PDB_model_num", "auth_asym_id",
        "auth_seq_id", "pdbx_PDB_ins_code", "auth_comp_id",
        "auth_atom_id", "label_alt_id", "Cartn_x", "type_symbol", "file")
    val out = StructureFilters.filterStructures(atoms)
      .select("file", "pdbx_PDB_model_num")
      .as[(String, Int)].collect().toSet
    assert(out == Set(("f1", 1), ("f2", 3)))
  }

  test("residuesAggregation: unique and first methods") {
    import sqlImplicits._
    val df = Seq(
      (1, 1, "A", 1, "GLY", 1.0), (2, 1, "A", 1, "GLY", 3.0),
      (3, 1, "A", 2, "ALA", 5.0))
      .toDF("id", "pdbx_PDB_model_num", "auth_asym_id", "auth_seq_id",
        "auth_comp_id", "Cartn_x")
    val uniq = Aggregations.residuesAggregation(df, "unique")
    val u1 = uniq.filter($"auth_seq_id" === 1).collect().head
    assert(u1.getAs[scala.collection.Seq[Double]]("Cartn_x")
      .toSeq == Seq(1.0, 3.0))
    assert(u1.getAs[Int]("id") == 1) // id always keeps its first value
    val first = Aggregations.residuesAggregation(df, "first")
    assert(first.filter($"auth_seq_id" === 1)
      .select("Cartn_x").as[Double].head() == 1.0)
  }

  test("withContactIndexes matches ball-point neighborhoods incl. self") {
    import sqlImplicits._
    val pts = Seq((1, 1, 0.0, 0.0, 0.0), (1, 2, 1.0, 0.0, 0.0),
      (1, 3, 2.0, 0.0, 0.0))
      .toDF("pk", "id", "Cartn_x", "Cartn_y", "Cartn_z")
    val out = RangeJoin.withContactIndexes(pts, "pk", "id", dist = 1.5)
      .orderBy("id").select("contact_indexes").as[String].collect().toSeq
    assert(out == Seq("1,2", "1,2,3", "2,3"))
  }
}
