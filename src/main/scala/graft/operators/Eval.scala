package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-scale text-overlap evaluation — the ROUGE/BLEU family a
  * training pipeline runs over millions of (candidate, reference)
  * pairs: distillation filtering (keep generations close to the
  * teacher reference), summarization eval, paraphrase mining, and
  * near-verbatim leakage scoring between model output and training
  * text. Complements the dedup family: Jaccard (F2) is set overlap
  * over shingles; ROUGE/BLEU are MULTISET n-gram overlap with
  * clipping — the measure the NLG literature reports.
  *
  * Exactness discipline (SURVEY §5): overlap counts are integers;
  * precision/recall/F1 surface as ticks — floor(1e6·ratio) where the
  * ratio is built from IEEE-pinned double ops only (divide, add,
  * multiply — identical bit patterns in any IEEE-754 engine), never
  * libm (BLEU's exp brevity penalty and geometric mean are replaced
  * by a linear brevity factor and the raw precision product — a
  * monotone reparametrization of standard BLEU when lengths are
  * fixed, documented as such, and exactly replayable).
  *
  * Scale shape: ZERO shuffle for the per-pair scores — candidate and
  * reference live in the same row, so the clipped overlap is a
  * scan-fused codegen'd merge walk over the two SORTED gram arrays
  * ([[graft.expressions.SortedOverlapStrings]]), never an explode +
  * per-(id, gram) aggregation + join (that draft measured 8.7 s at
  * sf0.1; this shape is sub-second). Totals are array lengths in the
  * same projection. Corpus-level BLEU adds one single-row aggregate.
  */
object Eval {

  /** Space-joined word n-grams of a token array; empty when the doc
    * is shorter than n (guarded — sequence() would count down). */
  private[operators] def ngrams(toks: Column, n: Int): Column = {
    require(n >= 1, "n-gram order must be >= 1")
    if (n == 1) toks
    else when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + lit(1), lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Per-(id, n) clipped-overlap core: id, n, overlap (Σ_g
    * min(count_cand(g), count_ref(g))), cand_total, ref_total.
    * ONE scan: tokens materialize once per side, each order's
    * overlap is a codegen'd sorted-merge walk in the projection, and
    * the per-n rows leave via an inline |ns|-element explode —
    * narrow, no shuffle. */
  private def overlapByN(pairs: DataFrame, idCol: String,
                         candCol: String, refCol: String,
                         ns: Seq[Int]): DataFrame = {
    require(ns.nonEmpty, "need at least one n-gram order")
    import graft.expressions.SortedIntersect
    val toked = pairs.select(col(idCol).as("id"),
      TextFunctions.tokens(col(candCol)).as("__tc"),
      TextFunctions.tokens(col(refCol)).as("__tr"))
    val perN = ns.map { n =>
      val cg = ngrams(col("__tc"), n)
      val rg = ngrams(col("__tr"), n)
      struct(lit(n.toLong).as("n"),
        SortedIntersect.clippedOverlap(sort_array(cg), sort_array(rg))
          .cast("long").as("overlap"),
        size(cg).cast("long").as("cand_total"),
        size(rg).cast("long").as("ref_total"))
    }
    toked.select(col("id"), explode(array(perN: _*)).as("e"))
      .select(col("id"), col("e.n").as("n"), col("e.overlap").as("overlap"),
        col("e.cand_total").as("cand_total"),
        col("e.ref_total").as("ref_total"))
  }

  /** ROUGE-N per pair: for each requested n, clipped n-gram overlap
    * plus precision / recall / F1 ticks. Zero-gram sides score 0 by
    * guard (no division anywhere a denominator can be 0 — engines
    * disagree on 0/0 before they disagree on anything else). */
  def rougeN(pairs: DataFrame, idCol: String, candCol: String,
             refCol: String, ns: Seq[Int] = Seq(1, 2)): DataFrame = {
    val core = overlapByN(pairs, idCol, candCol, refCol, ns)
    val pd = when(col("cand_total") > 0,
      col("overlap").cast("double") / col("cand_total").cast("double"))
      .otherwise(lit(0.0))
    val rd = when(col("ref_total") > 0,
      col("overlap").cast("double") / col("ref_total").cast("double"))
      .otherwise(lit(0.0))
    core.withColumn("pd", pd).withColumn("rd", rd)
      .select(col("id"), col("n"), col("overlap"),
        col("cand_total"), col("ref_total"),
        floor(lit(1e6) * col("pd")).cast("long").as("p_ticks"),
        floor(lit(1e6) * col("rd")).cast("long").as("r_ticks"),
        when(col("pd") + col("rd") > 0,
          floor(lit(1e6) * ((lit(2.0) * col("pd")) * col("rd"))
            / (col("pd") + col("rd"))))
          .otherwise(lit(0L)).cast("long").as("f_ticks"))
  }

  /** GENERATION-DIVERSITY metric (distinct-n, Li et al. 2016): per
    * order n, distinct n-grams / total n-grams over the whole
    * corpus — the mode-collapse detector for generated data (a
    * sampler stuck on templates scores near 0; diverse text near 1).
    * One explode + one two-level exact-distinct aggregation per
    * order (map-side combine collapses repeats before the shuffle —
    * never a countDistinct Expand); ratios are the usual guarded
    * IEEE tick. */
  def distinctN(docs: DataFrame, textCol: String,
                ns: Seq[Int] = Seq(1, 2)): DataFrame = {
    require(ns.nonEmpty, "need at least one n-gram order")
    val toks = TextFunctions.tokens(col(textCol))
    ns.map { n =>
      val g = docs.select(explode(ngrams(toks, n)).as("g"))
      val counts = g.groupBy("g").agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n_distinct"), sum(col("c")).as("n_total"))
      counts.select(lit(n.toLong).as("n"), col("n_distinct"),
        col("n_total"),
        when(col("n_total") > 0,
          floor(lit(1e6) * (col("n_distinct").cast("double")
            / col("n_total").cast("double"))))
          .otherwise(lit(0L)).cast("long").as("distinct_ticks"))
    }.reduce(_ unionByName _)
  }

  /** Corpus-level BLEU kernel (one row): clipped modified precision
    * p_n for n = 1..4 micro-averaged over all pairs, candidate /
    * reference corpus lengths, a LINEAR brevity factor
    * min(1, c/r) — exp(1 − r/c) is libm, not engine-portable — and
    * the pinned-association product
    * floor(1e12 · ((((bp·p1)·p2)·p3)·p4). For fixed corpus lengths
    * this is a strictly monotone function of log-BLEU-with-linear-BP,
    * so ranking model checkpoints by it ranks them identically. */
  def bleuKernel(pairs: DataFrame, idCol: String, candCol: String,
                 refCol: String): DataFrame = {
    val core = overlapByN(pairs, idCol, candCol, refCol, Seq(1, 2, 3, 4))
    def clipN(n: Int) = sum(when(col("n") === n, col("overlap")))
      .as(s"clip_$n")
    def totN(n: Int) = sum(when(col("n") === n, col("cand_total")))
      .as(s"tot_$n")
    val wide = core.agg(clipN(1), totN(1), clipN(2), totN(2),
      clipN(3), totN(3), clipN(4), totN(4),
      sum(when(col("n") === 1, col("ref_total"))).as("ref_len"))
    def p(n: Int) = when(col(s"tot_$n") > 0,
      col(s"clip_$n").cast("double") / col(s"tot_$n").cast("double"))
      .otherwise(lit(0.0))
    val bp = when(col("ref_len") > 0,
      least(lit(1.0), col("tot_1").cast("double")
        / col("ref_len").cast("double")))
      .otherwise(lit(0.0))
    wide
      .withColumn("p1", p(1)).withColumn("p2", p(2))
      .withColumn("p3", p(3)).withColumn("p4", p(4))
      .withColumn("bp", bp)
      .select(
        col("clip_1"), col("tot_1"), col("clip_2"), col("tot_2"),
        col("clip_3"), col("tot_3"), col("clip_4"), col("tot_4"),
        col("ref_len"),
        floor(lit(1e6) * col("p1")).cast("long").as("p1_ticks"),
        floor(lit(1e6) * col("p2")).cast("long").as("p2_ticks"),
        floor(lit(1e6) * col("p3")).cast("long").as("p3_ticks"),
        floor(lit(1e6) * col("p4")).cast("long").as("p4_ticks"),
        floor(lit(1e6) * col("bp")).cast("long").as("bp_ticks"),
        floor(lit(1e12) *
          ((((col("bp") * col("p1")) * col("p2")) * col("p3"))
            * col("p4"))).cast("long").as("bleu_ticks"))
  }
}
