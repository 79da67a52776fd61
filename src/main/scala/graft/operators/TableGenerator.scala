package graft.operators

import graft.functions.TextFunctions
import graft.sources.Library
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-call facade composing the flagship structure workflow —
  * filter → clean → merge → sequence-check — from the existing
  * operators, mirroring the reference's single entry point.
  * reference: proteofav/mergers.py:449 (table_generator) and
  * mergers.py:576 (_Tables.generate / merge).
  *
  * Everything here is a declarative DataFrame composition: each knob
  * adds a filter/window/join stage to ONE logical plan, so Catalyst
  * still pushes the chain/residue/atom selections down into the
  * atoms scan (the reference filters each pandas table in memory
  * instead). Nothing is materialized until the caller acts — except
  * the sequence check, which must run eagerly to be able to raise.
  */
object TableGenerator {

  /** Generate the merged per-atom table.
    *
    * @param atoms        parsed atom records (StructureFormats schema)
    * @param dssp         optional per-residue table to left-merge
    * @param dsspKeys     join keys as (atomsCol, dsspCol) pairs
    * @param annotations  further per-residue tables, each with keys
    * @param chains       keep only these chain ids (empty = all)
    * @param res          keep only these residue numbers (empty = all)
    * @param atomNames    keep only these atom names (empty = all)
    * @param removeAltlocs      keep max-occupancy altloc per site
    *                           (structures.py:399)
    * @param dropPartialResidues drop residues missing backbone atoms
    *                           (structures.py:430)
    * @param sequenceCheck 'ignore' | 'warn' | 'raise' on positionwise
    *                      residue-letter mismatches between the two
    *                      columns of `seqCheckCols` (mergers.py:607;
    *                      comparison is variants.py:411-430 semantics
    *                      via TextFunctions.countMismatches)
    * @param seqCheckCols  (leftCol, rightCol) letter columns to check
    */
  def generate(atoms: DataFrame,
               dssp: Option[DataFrame] = None,
               dsspKeys: Seq[(String, String)] =
                 Seq("auth_seq_id" -> "RES", "auth_asym_id" -> "CHAIN"),
               annotations: Seq[(DataFrame, Seq[(String, String)])] = Nil,
               chains: Seq[Any] = Nil,
               res: Seq[Any] = Nil,
               atomNames: Seq[Any] = Nil,
               removeAltlocs: Boolean = true,
               dropPartialResidues: Boolean = true,
               sequenceCheck: String = "ignore",
               seqCheckCols: Option[(String, String)] = None): DataFrame = {
    require(Seq("ignore", "warn", "raise").contains(sequenceCheck),
      s"Sequence check method '$sequenceCheck' not implemented.")

    // selection knobs (utils.py:97 row_selector semantics)
    var t = atoms
    if (chains.nonEmpty) t = RowOps.rowSelector(t, "auth_asym_id", chains)
    if (res.nonEmpty) t = RowOps.rowSelector(t, "auth_seq_id", res)
    if (atomNames.nonEmpty) t = RowOps.rowSelector(t, "auth_atom_id", atomNames)

    // altloc removal: max occupancy, then altloc id, per atom site
    if (removeAltlocs)
      t = WindowOps.keepBestPerKey(t,
        Seq("auth_asym_id", "auth_seq_id", "auth_atom_id"),
        Seq(col("occupancy").desc, col("label_alt_id").asc))

    // completeness gate: residues carrying the full backbone
    if (dropPartialResidues) {
      val complete = Aggregations.completeGroups(
        t.filter(col("auth_atom_id").isin(Library.backboneAtoms: _*)),
        Seq("auth_asym_id", "auth_seq_id"),
        col("n_members") >= Library.backboneAtoms.size)
      t = t.join(complete.select("auth_asym_id", "auth_seq_id"),
        Seq("auth_asym_id", "auth_seq_id"), "left_semi")
    }

    // merge chain: dssp first, then any further annotation tables
    val steps = dssp.map(_ -> dsspKeys).toSeq ++ annotations
    val merged = Joins.chainMerge(t, steps)

    // sequence check on the MERGED table (mergers.py:607): build both
    // sides' per-chain sequences under one total order and count
    // positionwise mismatches — distributed, one aggregation
    if (sequenceCheck != "ignore") {
      val (lc, rc) = seqCheckCols.getOrElse(throw new IllegalArgumentException(
        s"sequenceCheck='$sequenceCheck' needs seqCheckCols"))
      // one deterministic letter per residue per side FIRST: a residue
      // carrying two distinct letters after the merge (surviving
      // altloc, duplicate annotation row) must contribute ONE position
      // — two would shift every later position and inflate the count
      // relative to the reference's per-residue comparison. min()
      // skips nulls, so a partially-null residue keeps its letter.
      def seqOf(c: String) = array_join(transform(
        array_sort(collect_list(struct(col("auth_seq_id"), col(c)))),
        // null-fill so both sides stay position-aligned (array_join
        // would silently DROP a null letter and desynchronize lengths)
        r => coalesce(r.getField(c), lit("-"))), "")
      val bad = merged
        .select(col("auth_asym_id"), col("auth_seq_id"), col(lc), col(rc))
        .groupBy("auth_asym_id", "auth_seq_id")
        .agg(min(col(lc)).as(lc), min(col(rc)).as(rc))
        .groupBy("auth_asym_id")
        .agg(seqOf(lc).as("seq_a"), seqOf(rc).as("seq_b"))
        .filter(TextFunctions.countMismatches(col("seq_a"), col("seq_b")) > 0)
        .count()
      if (bad > 0) {
        val msg = s"sequence check: $bad chain(s) with residue mismatches"
        if (sequenceCheck == "raise") throw new IllegalStateException(msg)
        else System.err.println(s"[table_generator] WARN $msg")
      }
    }
    merged
  }
}
