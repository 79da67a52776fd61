package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING over a corpus — the
  * tokenizer-fitting stage of an LLM data pipeline (Sennrich et al.
  * 2016), Spark-first.
  *
  * The working set is never the corpus: one scan reduces it to the
  * distinct-word frequency table (the standard BPE trick — a 100 TB
  * corpus has a vocabulary orders of magnitude smaller), and every
  * merge iteration is one weighted pair-count aggregation plus one
  * per-word array fold over THAT table. The driver holds only the
  * ordered merge list, O(nMerges).
  *
  * Scale notes: each iteration shuffles O(vocab) pair rows keyed on
  * the pair — map-side combined, degree-independent. The iterative
  * lineage is truncated every few merges (localCheckpoint, the
  * connected-components precedent). When the word-frequency table
  * fits one machine, a local heap trainer on the collected counts is
  * cheaper past a few hundred merges — this operator is the path for
  * when it does NOT, and for keeping the whole fit inside the same
  * plan-auditable engine as the rest of the pipeline.
  */
object Bpe {

  /** Distinct-word frequency table: (word, freq). The ONE corpus
    * scan; everything after works on vocabulary rows. */
  def wordFreqs(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Character symbol array for a word (empty symbols dropped). */
  def charSymbols(word: Column): Column =
    filter(split(word, ""), s => s =!= "")

  /** BYTE symbol array for a word: the word's UTF-8 bytes through the
    * GPT-2 display remapping ([[graft.expressions.ByteRemap]]), one
    * single-char symbol per byte. The 256-entry base alphabet of a
    * byte-level (GPT-2-style) tokenizer — nothing is ever OOV, and
    * merges can cross UTF-8 character boundaries. */
  def byteSymbols(word: Column): Column =
    charSymbols(graft.expressions.ByteRemap(word))

  /** Weighted adjacent-pair counts over a (symbols, freq) table:
    * Σ freq per (a, b) occurrence — each occurrence counts, so
    * "aaa" contributes (a,a) twice. One map-side-combined shuffle
    * keyed on the pair. */
  def pairCounts(words: DataFrame, symCol: String = "symbols",
                 freqCol: String = "freq"): DataFrame = {
    val s = col(symCol)
    // greatest(…, 0): a 0/1-symbol word has no pairs — without the
    // clamp slice throws on the negative length instead of yielding
    // an empty array
    val n = greatest(size(s) - 1, lit(0))
    words
      .select(col(freqCol),
        explode(zip_with(
          slice(s, lit(1), n),
          slice(s, lit(2), n),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col(freqCol)).as("cnt"))
  }

  /** One left-to-right NON-OVERLAPPING merge of the pair (a, b) in a
    * symbol array: "aaa" under (a,a) becomes ["aa","a"], not
    * ["aa","aa"]. A single codegen'd fold with (emitted, carry)
    * struct state — the carry is the one-symbol lookahead the
    * non-overlap rule needs. */
  def mergePair(symbols: Column, a: String, b: String): Column =
    mergePairInto(symbols, a, b, a + b)

  /** [[mergePair]] with an explicit merge PRODUCT — WordPiece merges
    * drop the right symbol's "##" marker ("h" + "##e" → "he", not
    * "h##e"), so the product is not always plain concatenation. */
  def mergePairInto(symbols: Column, a: String, b: String,
                    merged: String): Column = {
    def st(out: Column, carry: Column) =
      struct(out.as("out"), carry.as("carry"))
    aggregate(
      symbols,
      st(array().cast("array<string>"), lit(null).cast("string")),
      (acc, s) =>
        when(acc.getField("carry").isNull, st(acc.getField("out"), s))
          .when(acc.getField("carry") === a && s === b,
            st(concat(acc.getField("out"), array(lit(merged))),
              lit(null).cast("string")))
          .otherwise(
            st(concat(acc.getField("out"), array(acc.getField("carry"))), s)),
      acc =>
        when(acc.getField("carry").isNull, acc.getField("out"))
          .otherwise(concat(acc.getField("out"),
            array(acc.getField("carry")))))
  }

  /** Train `nMerges` BPE merges on the corpus. Each round picks the
    * globally most frequent adjacent pair — ties broken (cnt desc,
    * a asc, b asc), fully deterministic — and rewrites the
    * vocabulary table with [[mergePair]]. Stops early when no pair
    * occurs at least `minCount` times. Returns the ordered merge
    * list (the tokenizer model).
    *
    * Ordering contract: symbol ties break in UNICODE CODE-POINT
    * order (Spark's binary UTF-8 string order). Java's
    * `String.compareTo` sorts by UTF-16 code UNIT and disagrees for
    * supplementary-plane symbols (an emoji's surrogate 0xD83x sorts
    * BELOW U+E000..U+FFFF in UTF-16 but ABOVE in code points) — any
    * JVM-side replay of the tie-break must compare code points, as
    * BpeSpec's reference does.
    *
    * `byteLevel = true` trains over [[byteSymbols]] instead of
    * [[charSymbols]]: the GPT-2 mode — base alphabet is the 256
    * remapped bytes, merge products are remapped-space strings (store
    * them as-is; [[graft.expressions.ByteRemap.unremapString]] is the
    * display decode). The iteration itself is unchanged: only the
    * initial symbolization differs. */
  def trainMerges(docs: DataFrame, nMerges: Int, minCount: Long = 2L,
                  textCol: String = "text",
                  byteLevel: Boolean = false): Seq[(String, String)] = {
    val sym =
      if (byteLevel) byteSymbols(col("word")) else charSymbols(col("word"))
    var words = wordFreqs(docs, textCol)
      .select(sym.as("symbols"), col("freq"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    for (i <- 1 to nMerges if !done) {
      val best = pairCounts(words)
        .filter(col("cnt") >= minCount)
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (a, b) = (best.head.getString(0), best.head.getString(1))
        merges += ((a, b))
        words = words.select(
          mergePair(col("symbols"), a, b).as("symbols"), col("freq"))
        // truncate the grown lineage periodically (CC precedent) so
        // the per-iteration plan stays O(1), not O(i). Superseded
        // checkpoint blocks are reclaimed by the ContextCleaner once
        // the rebinding drops the last reference (Dataset.unpersist
        // would NOT free them — localCheckpoint storage lives on the
        // RDD, not in the cache manager), same as the CC loop.
        if (i % 8 == 0) words = words.localCheckpoint()
      }
    }
    merges.toSeq
  }

  /** Tokenize a text column with a trained merge list: whitespace
    * words → char symbols → the merges replayed IN TRAINING ORDER
    * (the BPE apply rule). The expression is a fixed chain of
    * nMerges folds — fine for the modest merge counts a
    * feature-hashing pipeline uses; a production encoder with a 32k
    * vocabulary would collect the merge RANKS into a longest-match
    * table instead (same model, different apply kernel). */
  def applyMerges(text: Column,
                  merges: Seq[(String, String)]): Column =
    transform(TextFunctions.tokens(text), w =>
      merges.foldLeft(charSymbols(w)) { case (syms, (a, b)) =>
        mergePair(syms, a, b)
      })

  /** Vocabulary of a trained merge list: every merge product, first
    * occurrence order. Single characters are implicitly in-vocab —
    * they are the encoder's fallback (the Sennrich base alphabet). */
  def vocabFromMerges(merges: Seq[(String, String)]): Seq[String] =
    merges.map { case (a, b) => a + b }.distinct

  /** Persist a trained merge list as a parquet model table —
    * (rank, a, b), one row per merge in training order. Train once,
    * encode across sessions: the tokenizer model is as much a
    * persistent artifact as the IVF centroid / PQ codebook tables
    * (same discipline: [[graft.operators.Ivf.saveCentroids]]). */
  def saveMerges(spark: org.apache.spark.sql.SparkSession,
                 merges: Seq[(String, String)], path: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((a, b), i) => (i, a, b) }.toDF("rank", "a", "b")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[saveMerges]] model table back into the in-memory merge
    * list, training order restored; rejects duplicate or non-dense
    * rank rows (a double-written or append-mode table) rather than
    * silently replaying a corrupted model. */
  def loadMerges(spark: org.apache.spark.sql.SparkSession,
                 path: String): Seq[(String, String)] = {
    val rows = spark.read.parquet(path).select("rank", "a", "b")
      .collect()
      .map(r => r.getInt(0) -> ((r.getString(1), r.getString(2))))
    val byRank = rows.toMap
    require(rows.length == byRank.size,
      s"merge table at $path has duplicate rank rows: " +
        s"${rows.length} rows for ${byRank.size} distinct ranks")
    require(byRank.keySet == (0 until byRank.size).toSet,
      s"merge table at $path is not dense in [0, n): " +
        s"ranks ${byRank.keySet.toSeq.sorted.take(5)}...")
    (0 until byRank.size).map(byRank)
  }

  /** PRODUCTION encoder: greedy longest-match against the vocabulary
    * table ([[graft.expressions.LongestMatchEncode]]) — O(word) per
    * row whatever the vocab size, vs [[applyMerges]]'s O(nMerges)
    * expression depth. Maximal munch is the deployed-tokenizer
    * semantics (WordPiece / SentencePiece-BPE apply), NOT always the
    * same split as replaying merges in training order — both are
    * deterministic; pick one per model and stay with it. Whitespace
    * words encode independently; the whole text becomes one flat
    * token array. */
  def encodeLongestMatch(text: Column, vocab: Seq[String]): Column =
    flatten(transform(TextFunctions.tokens(text), w =>
      graft.expressions.BpeEncode.longestMatch(w, vocab)))

  /** BYTE-LEVEL production encoder (GPT-2 apply): each whitespace
    * word is remapped to display-byte space and greedy-longest-match
    * encoded against a vocabulary whose entries are remapped-space
    * strings (train with `byteLevel = true`, or remap an external
    * vocab via [[graft.expressions.ByteRemap.remapString]]). The
    * fallback token is ONE remapped char = ONE BYTE — a character the
    * vocab has never seen splits into its UTF-8 bytes rather than
    * becoming OOV, which is the whole point of byte-level mode.
    * Output tokens are remapped-space strings; concatenating a word's
    * tokens and [[graft.expressions.ByteRemap.unremapString]]-ing
    * restores the word byte-exactly. */
  def encodeBytesLongestMatch(text: Column, vocab: Seq[String]): Column =
    flatten(transform(TextFunctions.tokens(text), w =>
      graft.expressions.BpeEncode.longestMatch(
        graft.expressions.ByteRemap(w), vocab)))

  /** FULL-TEXT byte-level encode — the true GPT-2 shape: the WHOLE
    * string (whitespace included — the space byte remaps to its
    * display char and merges like any other) is ONE longest-match
    * sequence. No word pre-split means encode→decode is lossless for
    * ANY input, whitespace runs, leading/trailing spaces and all —
    * which is what makes a bit-exact detokenize possible. */
  def encodeBytesFullText(text: Column, vocab: Seq[String]): Column =
    graft.expressions.BpeEncode.longestMatch(
      graft.expressions.ByteRemap(text), vocab)

  /** The GPT-2 id space: ids 0..255 are the single-byte base
    * alphabet (in byte order), merge products follow — total
    * coverage by construction, so [[tokenIdsTotal]] never needs an
    * OOV sentinel. */
  def byteIdVocab(vocab: Seq[String]): Seq[String] =
    (graft.expressions.ByteRemap.byteToChar.map(_.toString).toSeq
      ++ vocab).distinct

  /** Token strings → ids under a TOTAL id vocabulary
    * ([[byteIdVocab]]): every byte-level token is either a base byte
    * or a vocab entry, so the lookup is total — a foreign token
    * (one not produced by the matching encoder) FAILS THE JOB under
    * ANSI mode (element_at on a missing map key throws
    * MAP_KEY_DOES_NOT_EXIST), which is the right behavior for a
    * dataloader contract: corrupt token streams abort loudly instead
    * of flowing a null/masked id into training. */
  def tokenIdsTotal(tokens: Column, idVocab: Seq[String]): Column = {
    val idMap = typedLit(idVocab.zipWithIndex.toMap
      .map { case (t, i) => t -> i.toLong })
    transform(tokens, t => element_at(idMap, t))
  }

  /** Ids → text: the dataloader-side DETOKENIZE. Looks each id up in
    * the id vocabulary (O(1) array index), concatenates the
    * remapped-space tokens, and inverts the byte remap — bit-exact
    * inverse of [[encodeBytesFullText]] + [[tokenIdsTotal]] for any
    * input text. */
  def decodeBytes(ids: Column, idVocab: Seq[String]): Column = {
    val arr = typedLit(idVocab)
    graft.expressions.ByteRemap.unremapCol(
      array_join(transform(ids, i =>
        element_at(arr, i.cast("int") + 1)), ""))
  }

  // ------------------------------------------------------------------
  // WordPiece (Wu et al. 2016; the BERT tokenizer) — the third trainer/
  // encoder pair next to char/byte BPE and Unigram. Same distributed
  // shape as BPE (distinct-word table, pair statistics, driver-bounded
  // merge loop); what changes is the SYMBOL SPACE (word-initial vs
  // "##"-continuation symbols are distinct vocabulary citizens) and
  // the MERGE OBJECTIVE (likelihood ratio, not raw count).
  // ------------------------------------------------------------------

  /** WordPiece character symbols: first char plain, every later char
    * "##"-prefixed — the marker makes position part of the symbol's
    * identity, so "t" (word-initial) and "##t" (continuation) train
    * and count independently, which is the defining WordPiece trait. */
  def wordPieceSymbols(word: Column): Column = {
    val chars = charSymbols(word)
    zip_with(chars, sequence(lit(1), greatest(size(chars), lit(1))),
      (c, i) => when(i === 1, c).otherwise(concat(lit("##"), c)))
  }

  /** The WordPiece merge product: the right symbol sheds its "##"
    * marker ("h"+"##e" → "he", "##l"+"##l" → "##ll"). */
  def wordPieceMerged(a: String, b: String): String =
    a + (if (b.startsWith("##")) b.substring(2) else b)

  /** One training round's SCORED pair table: (a, b, cnt_pair, cnt_a,
    * cnt_b) — everything the likelihood argmax score(a,b) =
    * cnt_pair / (cnt_a · cnt_b) needs, all EXACT longs (the division
    * happens at the driver-side argmax; the distributed part of the
    * round ships only integers). One corpus-scan-free pass over the
    * (symbols, freq) vocabulary table: pair counts are the BPE
    * aggregation, symbol marginals one extra explode+sum whose
    * output is alphabet-sized, broadcast back onto the pairs. */
  def wordPiecePairScores(words: DataFrame): DataFrame = {
    val pairs = pairCounts(words).withColumnRenamed("cnt", "cnt_pair")
    val syms = words
      .select(col("freq"), explode(col("symbols")).as("sym"))
      .groupBy("sym").agg(sum("freq").as("cnt"))
    pairs
      .join(broadcast(syms.select(col("sym").as("a"),
        col("cnt").as("cnt_a"))), "a")
      .join(broadcast(syms.select(col("sym").as("b"),
        col("cnt").as("cnt_b"))), "b")
      .select(col("a"), col("b"), col("cnt_pair"),
        col("cnt_a"), col("cnt_b"))
  }

  /** Train `nMerges` WordPiece merges. Each round picks the pair
    * maximizing the LIKELIHOOD score cnt(ab) / (cnt(a) · cnt(b)) —
    * the objective that prefers gluing symbols which occur mostly
    * TOGETHER over symbols which are merely both frequent (the
    * BPE-vs-WordPiece divergence, pinned by spec) — ties broken
    * (a asc, b asc) in code-point order, `minCount` on the raw pair
    * count. The score division runs on exact long counts at the
    * driver argmax; marginal products are computed in DOUBLE (counts
    * at corpus scale overflow a long product; the IEEE quotient of
    * exact integers is deterministic across runs and layouts).
    * Returns the ordered merge list; products follow
    * [[wordPieceMerged]] ("##" markers survive merging on the left,
    * never in the middle). */
  def trainWordPiece(docs: DataFrame, nMerges: Int, minCount: Long = 2L,
                     textCol: String = "text"): Seq[(String, String)] = {
    var words = wordFreqs(docs, textCol)
      .select(wordPieceSymbols(col("word")).as("symbols"), col("freq"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    for (i <- 1 to nMerges if !done) {
      val best = wordPiecePairScores(words)
        .filter(col("cnt_pair") >= minCount)
        .orderBy(
          (col("cnt_pair").cast("double") /
            (col("cnt_a").cast("double") * col("cnt_b").cast("double")))
            .desc,
          col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (a, b) = (best.head.getString(0), best.head.getString(1))
        merges += ((a, b))
        words = words.select(
          mergePairInto(col("symbols"), a, b,
            wordPieceMerged(a, b)).as("symbols"), col("freq"))
        if (i % 8 == 0) words = words.localCheckpoint()
      }
    }
    merges.toSeq
  }

  /** Vocabulary for [[encodeWordPiece]] from a trained merge list:
    * the base alphabet (caller-supplied — word-initial chars plain,
    * continuation chars "##"-prefixed, exactly the symbols the
    * trainer started from) plus every merge product. */
  def wordPieceVocabFromMerges(merges: Seq[(String, String)],
                               alphabet: Seq[String]): Seq[String] =
    (alphabet ++ merges.map { case (a, b) => wordPieceMerged(a, b) })
      .distinct

  /** PRODUCTION WordPiece encoder
    * ([[graft.expressions.WordPieceEncode]]): whitespace words →
    * greedy longest match under the position-split vocabulary, whole
    * word → `unk` on any mid-word failure or when longer than
    * `maxWordChars` code points. One flat token array per text. */
  def encodeWordPiece(text: Column, vocab: Seq[String],
                      unk: String = "[UNK]",
                      maxWordChars: Int = 100): Column =
    flatten(transform(TextFunctions.tokens(text), w =>
      graft.expressions.WordPieceEncode(w, vocab, unk, maxWordChars)))
}
