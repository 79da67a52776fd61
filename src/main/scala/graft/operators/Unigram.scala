package graft.operators

import graft.expressions.ViterbiSegment
import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer fitting — the OTHER
  * production tokenizer family next to [[Bpe]]: where BPE grows a
  * vocabulary bottom-up by merging, the unigram model starts from a
  * large SEED of candidate pieces and alternates (Viterbi-)EM
  * re-estimation with pruning until the target vocabulary size.
  *
  * Kudo 2018 (arXiv:1804.10959) is the published algorithm; this is
  * the hard-EM (Viterbi) variant: the E-step segments every distinct
  * word by max total piece weight (exact integer-tick DP —
  * [[ViterbiSegment]]), the M-step re-estimates piece weights from
  * the frequency-weighted piece counts, and pruning drops the
  * lowest-count fraction. Hard EM keeps every quantity an exact
  * integer (counts) or a deterministic tick (floor(1e6 · ln p) via
  * StrictMath — bit-stable across JVMs), so training is reproducible
  * run-to-run and the spec can replay it sequentially bit-for-bit.
  *
  * Scale shape (the [[Bpe.trainMerges]] discipline): ONE corpus scan
  * builds the word-frequency table; every EM round is a scan-stage
  * segmentation of the DISTINCT-WORD table (broadcast model compiled
  * to a trie once per executor) + one aggregation keyed on piece.
  * Model state (≤ seed size rows) is driver-bounded by construction —
  * the IVF-centroid / BPE-vocab precedent.
  */
object Unigram {

  /** Seed vocabulary: every substring of length 1..`maxPieceLen` of
    * every word occurrence, weighted by word frequency; keep the
    * top-`topK` by (total desc, piece asc). Selection runs through
    * [[OrderStats.selectTopN]] — bit-identical to the row_number
    * definition with no global single-task sort (the candidate table
    * is |distinct substrings|, which on web text is vocab-like:
    * unbounded). The substring explode inflates the distinct-word
    * table by ~len·maxPieceLen — bounded per row, scan-stage, one
    * aggregation keyed on piece (reference unigram trainers use a
    * suffix array for the same enumeration; the explode form
    * distributes trivially). */
  def seedVocab(docs: DataFrame, maxPieceLen: Int, topK: Long,
                textCol: String = "text"): DataFrame = {
    require(maxPieceLen >= 1, "maxPieceLen must be >= 1")
    val wf = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wcnt"))
    // persist the candidate table: selectTopN probes it several
    // times (count, quantile narrowing, boundary tie sweep) — without
    // this the substring explode re-runs per probe (the dsirWeights
    // discipline)
    val pieces = wf.select(col("wcnt"),
      explode(flatten(transform(
        sequence(lit(1), length(col("word"))),
        i => transform(
          sequence(lit(1),
            least(lit(maxPieceLen), length(col("word")) - i + lit(1))),
          l => col("word").substr(i, l))))).as("piece"))
      .groupBy("piece").agg(sum(col("wcnt")).as("total"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pieces.count()
    CacheOps.materializeAndRelease(
      OrderStats.selectTopN(pieces, topK, "total", "piece")
        .filter(col("selected"))
        .select(col("piece"), col("total")),
      pieces)
  }

  /** Viterbi max-score segmentation of every whitespace token of
    * `textCol`, flattened per document — the unigram counterpart of
    * [[Bpe.encodeLongestMatch]]. `model` maps piece → weight in
    * 1e-6 ln-prob ticks; uncovered characters segment as single-char
    * pieces at `oovWeight`. */
  def segment(text: Column, model: Seq[(String, Long)],
              oovWeight: Long): Column =
    flatten(transform(TextFunctions.tokens(text),
      w => ViterbiSegment.segment(w, model, oovWeight)))

  /** Weight ticks from a count: floor(1e6 · ln(cnt / total)) —
    * StrictMath so the tick is bit-identical on every JVM. */
  def weightTicks(cnt: Long, total: Long): Long = {
    require(cnt >= 1 && total >= cnt, s"bad count $cnt / $total")
    math.floor(1e6 * StrictMath.log(cnt.toDouble / total.toDouble)).toLong
  }

  /** Hard-EM unigram training: seed → `rounds` × (Viterbi E-step,
    * count M-step, prune) → final model table (piece, cnt, w).
    *
    * Each round: segment the distinct-word table under the current
    * model, sum word-frequency-weighted piece counts, re-weight by
    * [[weightTicks]], drop pieces the Viterbi never used, then — if
    * still above `vocabSize` — drop the lowest-(cnt, piece desc)
    * pieces down to max(vocabSize, survivors·(1-pruneFrac)) so no
    * round prunes more than `pruneFrac` (the Kudo schedule). OOV
    * single-char fallbacks surface as pieces of their own round
    * count (coverage pieces can re-enter the model), exactly like
    * SentencePiece's required character set.
    *
    * Everything driver-side is bounded by the seed size; everything
    * distributed is one scan + one keyed aggregation per round. */
  def trainViterbiEm(docs: DataFrame, vocabSize: Int,
                     maxPieceLen: Int = 8, seedSize: Long = 2048L,
                     rounds: Int = 3, pruneFrac: Double = 0.2,
                     oovWeight: Long = -20000000L,
                     textCol: String = "text"): DataFrame = {
    require(vocabSize >= 1 && rounds >= 1)
    require(pruneFrac > 0.0 && pruneFrac < 1.0)
    val spark = docs.sparkSession
    import org.apache.spark.storage.StorageLevel
    val wf = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wcnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    wf.count()
    try {
      // seed model: substring counts → ticks (driver-bounded rows)
      val seed = seedVocab(docs, maxPieceLen, seedSize, textCol)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      var model: Seq[(String, Long)] = {
        val total = seed.map(_._2).sum
        seed.map { case (p, c) => (p, weightTicks(c, total)) }.toSeq
      }
      var result: Seq[(String, Long, Long)] = Seq.empty
      for (_ <- 1 to rounds) {
        val counts = wf
          .select(explode(ViterbiSegment.segment(
            col("word"), model, oovWeight)).as("piece"), col("wcnt"))
          .groupBy("piece").agg(sum(col("wcnt")).as("cnt"))
          .collect().map(r => (r.getString(0), r.getLong(1)))
        val total = counts.map(_._2).sum
        // prune: never below vocabSize, never more than pruneFrac of
        // the survivors in one round; order (cnt asc, piece desc)
        // drops the weakest first, deterministically
        val keepN = math.max(vocabSize,
          math.ceil(counts.length * (1.0 - pruneFrac)).toLong).toInt
        val kept = counts
          .sortBy { case (p, c) => (-c, p) } // (cnt desc, piece asc)
          .take(keepN)
        model = kept.map { case (p, c) => (p, weightTicks(c, total)) }.toSeq
        result = kept.map { case (p, c) =>
          (p, c, weightTicks(c, total)) }.toSeq
      }
      import spark.implicits._
      result.toDF("piece", "cnt", "w")
    } finally wf.unpersist()
  }

  /** Persist a trained unigram model as a parquet table of
    * (piece, w) — train once, segment across sessions (the
    * [[Ivf.saveCentroids]] / [[Bpe.saveMerges]] model-artifact
    * discipline). */
  def saveModel(spark: org.apache.spark.sql.SparkSession,
                model: Seq[(String, Long)], path: String): Unit = {
    import spark.implicits._
    model.toDF("piece", "w")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[saveModel]] table back into the in-memory model;
    * rejects duplicate pieces and empty/null pieces (a double-written
    * or append-mode table) rather than silently segmenting under a
    * corrupted model. Order is immaterial to the DP — the trie keyed
    * on the piece IS the model — but the load sorts (piece asc) so a
    * round-tripped model is canonically ordered. */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
                path: String): Seq[(String, Long)] = {
    val rows = spark.read.parquet(path).select("piece", "w")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    require(rows.forall(r => r._1 != null && r._1.nonEmpty),
      s"unigram model at $path has null/empty pieces")
    val byPiece = rows.toMap
    require(rows.length == byPiece.size,
      s"unigram model at $path has duplicate piece rows: " +
        s"${rows.length} rows for ${byPiece.size} distinct pieces")
    rows.sortBy(_._1).toSeq
  }
}
