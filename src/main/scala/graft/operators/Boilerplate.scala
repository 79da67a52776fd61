package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Block-scored main-content extraction — the jusText/trafilatura
  * rung of the crawl pipeline, as a fully relational plan rather
  * than a DOM walk. [[graft.functions.TextFunctions.htmlExtract]]
  * turns block structure into LINE structure and leaves boilerplate
  * removal to corpus-wide line dedup; this operator removes
  * boilerplate PER DOCUMENT by scoring each block on its own
  * evidence (the jusText insight: boilerplate blocks are short,
  * link-dense, and stopword-poor — Pomikálek 2011; the
  * FineWeb/RefinedWeb ablations put main-content extraction among
  * the largest corpus-quality levers). Reference analog: the
  * reference has no HTML stage (proteofav consumes structured
  * formats); this extends the crawl surface the way its table
  * cleaners gate rows on per-row evidence
  * (proteofav/structures.py:150-208).
  *
  * Pipeline (every step an RE2-compatible regexp / array op — no
  * UDF, no DOM, so DuckDB replays the chain byte-for-byte):
  *  1. drop script/style/title/comment spans (they are NOT content);
  *  2. segment at block-level tag boundaries (openers AND closers
  *     of p/div/li/ul/ol/h1-6/tr/table/td/th/blockquote/article/
  *     section/header/footer/nav/aside/main/form/pre, plus br) —
  *     each fragment between boundaries is one BLOCK;
  *  3. posexplode blocks; per block compute
  *     - text: inline tags stripped, the six ubiquitous entities
  *       decoded (&amp; last), whitespace collapsed, trimmed;
  *     - link_chars: the same text measure over the contents of
  *       `<a …>…</a>` spans (inline tags never segment, so anchor
  *       spans stay within their block);
  *     - link_density = link_chars / text chars;
  *     - stop_ratio: stopword fraction of whitespace tokens (the
  *       q_quality machinery's fluency signal);
  *  4. keep a block iff it is long enough, not link-dense, and
  *     (stopword-fluent OR long) — the jusText good/bad rule
  *     collapsed to a deterministic conjunction;
  *  5. reassemble kept blocks in document order, newline-joined
  *     (block structure becomes line structure, same contract as
  *     htmlExtract, so line-level dedup composes downstream).
  *
  * Scale shape: the explode multiplies ROWS by blocks/doc but the
  * fragments partition the document's BYTES — no data inflation;
  * scoring is narrow per-row codegen'd work; reassembly is the ONE
  * shuffle (hash by doc id, collect_list + array_sort — no
  * whole-partition sort). Known limitation (shared by any regex
  * segmenter): a block-level tag inside an attribute string or a
  * bare `< … >` span in text segments/strips like markup.
  */
object Boilerplate {

  /** Block-boundary tags: the HTML block-level elements (display:
    * block by default) whose openers and closers both end a block. */
  private val BoundaryRe =
    "(?i)(</?(p|div|li|ul|ol|h[1-6]|tr|table|td|th|blockquote|article|" +
      "section|header|footer|nav|aside|main|form|pre)(\\s[^>]*)?>|" +
      "<br\\s*/?>)"

  /** Stopword list shared with the quality-score machinery (kept
    * literal here: the oracle SQL quotes the same ten words). */
  private val Stopwords =
    Seq("the", "a", "an", "of", "and", "in", "to", "is", "for", "on")

  private def entityDecode(c: Column): Column =
    Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(c) { case (x, (e, r)) => replace(x, lit(e), lit(r)) }

  /** Visible text of a fragment: tags stripped FIRST (so entities
    * inside attributes never decode into fake text), then entity
    * decode, whitespace-run collapse, trim. */
  private def visibleText(raw: Column): Column =
    trim(regexp_replace(entityDecode(regexp_replace(raw, "<[^>]+>", "")),
      "[ \t\n\r]+", " "))

  /** Per-block scored frame INCLUDING empty segmentation artifacts
    * (every doc keeps >= 1 row, so the per-doc rollup never loses a
    * document). Columns: idCol, carryCols, block_idx (1-based, doc
    * order), text, text_len, link_chars, link_density, n_tokens,
    * n_stop, stop_ratio, keep. */
  private def scoredBlocks(docs: DataFrame, idCol: String,
                           htmlCol: String, carryCols: Seq[String],
                           minChars: Int, maxLinkDensity: Double,
                           minStopRatio: Double, longChars: Int)
  : DataFrame = {
    val clean = regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(col(htmlCol),
        "(?is)<script[^>]*>.*?</script>", ""),
      "(?is)<style[^>]*>.*?</style>", ""),
      "(?is)<title[^>]*>.*?</title>", ""),
      "(?s)<!--.*?-->", "")
    val frags = split(regexp_replace(clean, BoundaryRe, ""), "")
    val raw = docs.select(
      (col(idCol) +: carryCols.map(col)) :+
        posexplode(frags).as(Seq("__pos", "__raw")): _*)
    val text = visibleText(col("__raw"))
    // anchor contents: capture group 2 of <a …>…</a>, measured with
    // the SAME visible-text chain so density compares like with like
    val linkChars = aggregate(
      transform(
        regexp_extract_all(col("__raw"),
          lit("(?is)<a(\\s[^>]*)?>(.*?)</a>"), lit(2)),
        a => length(visibleText(a)).cast("long")),
      lit(0L), (acc, n) => acc + n)
    raw.select(
      (col(idCol) +: carryCols.map(col)) ++ Seq(
        (col("__pos") + 1).cast("long").as("block_idx"),
        text.as("text"), linkChars.as("link_chars")): _*)
      .withColumn("text_len", length(col("text")).cast("long"))
      .withColumn("__toks",
        filter(split(col("text"), " "), t => t =!= lit("")))
      .withColumn("n_tokens", size(col("__toks")).cast("long"))
      .withColumn("n_stop",
        size(filter(col("__toks"),
          t => lower(t).isInCollection(Stopwords))).cast("long"))
      .drop("__toks")
      .withColumn("link_density",
        col("link_chars").cast("double") /
          greatest(col("text_len"), lit(1L)))
      .withColumn("stop_ratio",
        col("n_stop").cast("double") / greatest(col("n_tokens"), lit(1L)))
      .withColumn("keep",
        col("text_len") >= minChars &&
          col("link_density") <= maxLinkDensity &&
          (col("stop_ratio") >= minStopRatio ||
            col("text_len") >= longChars))
  }

  /** Per-block scores for the non-empty blocks of each document —
    * the inspectable/verifiable view of the extraction decision. */
  def htmlBlockScores(docs: DataFrame, idCol: String = "doc_id",
                      htmlCol: String = "html",
                      minChars: Int = 25, maxLinkDensity: Double = 0.35,
                      minStopRatio: Double = 0.05, longChars: Int = 200)
  : DataFrame =
    scoredBlocks(docs, idCol, htmlCol, Seq.empty, minChars,
      maxLinkDensity, minStopRatio, longChars)
      .filter(col("text_len") > 0L)

  /** Main-content extraction: boilerplate blocks dropped, survivors
    * reassembled newline-joined in document order. Every input doc
    * yields a row — a doc whose every block was dropped comes back
    * with extracted = "" and n_kept = 0 (the downstream quality gate
    * is the policy layer that removes it). carryCols ride the
    * per-doc rollup (they must be functionally dependent on idCol,
    * e.g. the url). */
  def htmlExtractBlocks(docs: DataFrame, idCol: String = "doc_id",
                        htmlCol: String = "html",
                        carryCols: Seq[String] = Seq.empty,
                        minChars: Int = 25, maxLinkDensity: Double = 0.35,
                        minStopRatio: Double = 0.05, longChars: Int = 200)
  : DataFrame = {
    val scored = scoredBlocks(docs, idCol, htmlCol, carryCols, minChars,
      maxLinkDensity, minStopRatio, longChars)
    scored.groupBy(col(idCol) +: carryCols.map(col): _*)
      .agg(
        sum(when(col("text_len") > 0L, 1L).otherwise(0L))
          .cast("long").as("n_blocks"),
        sum(when(col("keep"), 1L).otherwise(0L))
          .cast("long").as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("keep"), struct(col("block_idx"), col("text"))))),
            s => s.getField("text")),
          "\n").as("extracted"))
  }
}
