package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the training-data pipeline.
  *
  * Everything is composed from `org.apache.spark.sql.functions._`
  * (codegen'd, no UDFs): tokenization, BPE-ish regex token counting,
  * quality scoring, n-gram language-ID, rolling-hash fingerprints.
  */
object TextFunctions {

  /** Whitespace tokens with empties removed. (Space-separated only —
    * the corpus tables' convention; for multiline text use
    * [[tokensMultiline]] or tokens adjoining a line break merge.) */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= lit(""))

  /** Tokens split on space OR newline — for multiline text (line
    * dedup output, crawl extracts), where the space-only split would
    * merge the tokens adjoining every line break. */
  def tokensMultiline(text: Column): Column =
    filter(split(text, "[ \n]"), t => t =!= lit(""))

  /** Distinct whitespace tokens (set semantics, for Jaccard). */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: alpha runs, single digits, single
    * punctuation marks — a cheap proxy for subword token counts. */
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Word n-gram shingles from a token array (n >= 1). Slides a
    * window over the array with `transform` + `slice`; stays inside
    * whole-stage codegen. */
  def shingles(toks: Column, n: Int, sep: String = " "): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(
        transform(
          sequence(lit(1), size(toks) - (n - 1)),
          i => array_join(slice(toks, i, lit(n)), sep)))

  /** Ratio of characters matching `charClass` (e.g. "[A-Za-z]"). */
  def charClassRatio(text: Column, charClass: String): Column =
    (length(text) - length(regexp_replace(text, charClass, "")))
      .cast("double") / length(text)

  /** UniProt-GFF annotation label — the `_annotation_writer` recode
    * (proteofav/annotation.py:19-34): TYPE alone, 'TYPE: Note',
    * 'TYPE (ID)' or 'TYPE: Note (ID)' depending on which fields are
    * present (null or empty both count as absent, matching pandas
    * truthiness). A pure when-chain, codegen'd. */
  def annotationLabel(typ: Column, note: Column, id: Column): Column = {
    val noId = id.isNull || id === ""
    val noNote = note.isNull || note === ""
    when(noId && noNote, typ)
      .when(noId, concat(typ, lit(": "), note))
      .when(noNote, concat(typ, lit(" ("), id, lit(")")))
      .otherwise(concat(typ, lit(": "), note, lit(" ("), id, lit(")")))
  }

  private val StopWords =
    Seq("the", "a", "an", "of", "and", "in", "to", "is", "for", "on")

  /** Fraction of tokens that are stopwords — a classic fluency
    * signal in corpus quality scoring. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    size(filter(toks, t => t.isInCollection(StopWords))).cast("double") /
      greatest(size(toks), lit(1))
  }

  /** Duplicate-line ratio: 1 − |distinct lines| / |lines| — the
    * boilerplate/repetition signal in corpus quality scoring. */
  def dupLineRatio(text: Column): Column = {
    val lines = filter(split(text, "\n"), l => l =!= lit(""))
    lit(1.0) - size(array_distinct(lines)).cast("double") /
      greatest(size(lines), lit(1))
  }

  /** Duplicate-token ratio: 1 − |distinct tokens| / |tokens| —
    * repetition at token granularity (catches single-line spam). */
  def dupTokenRatio(text: Column): Column = {
    val toks = tokens(text)
    lit(1.0) - size(array_distinct(toks)).cast("double") /
      greatest(size(toks), lit(1))
  }

  /** Composite document quality score in [0, 1]:
    * alpha-char ratio, stopword presence, and a length prior.
    * No rounding — the raw IEEE combination is deterministic on any
    * engine given the same inputs; round at presentation time. */
  def qualityScore(text: Column): Column = {
    val alpha = charClassRatio(text, "[A-Za-z ]")
    val stop = stopwordRatio(text)
    val lenPrior = least(length(text).cast("double") / lit(500.0), lit(1.0))
    alpha * 0.5 + stop * 0.3 + lenPrior * 0.2
  }

  /** Tiny per-language marker-token profiles for heuristic
    * language-ID. On real corpora these would be learned character
    * n-gram profiles; the heuristic structure (score-per-language →
    * argmax, one pass, no shuffle) is the part that matters at scale. */
  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "fast", "slow"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "est"),
    "zh" -> Seq("spark", "query", "data"))

  /** Predicted language = argmax of marker hits; deterministic
    * tie-break on language code order. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scored = LangMarkers.map { case (lang, markers) =>
      struct(
        size(filter(toks, t => t.isInCollection(markers))).as("hits"),
        lit(lang).as("lang"))
    }
    // array_max on (hits, lang) structs: max hits, then max lang —
    // deterministic; flip order below for lexicographically-first tie
    sort_array(array(scored: _*), asc = false).getItem(0).getField("lang")
  }

  /** Positionwise mismatch count between two aligned sequences — the
    * variant-mapping sanity check (proteofav/variants.py:430
    * _count_mismatches). zip_with pads the shorter side with nulls;
    * `x =!= y` is null there and the filter drops it, reproducing
    * Python zip's truncate-to-shorter semantics exactly. */
  def countMismatches(a: Column, b: Column): Column = {
    // split("", "") yields [""] not [] — drop the empty-input artifact
    def chars(s: Column) = filter(split(s, ""), c => c =!= lit(""))
    size(filter(zip_with(chars(a), chars(b), (x, y) => x =!= y), m => m))
  }

  /** Permissive aligned-sequence equivalence: same length and at most
    * `nMax` mismatches (proteofav/variants.py:411 _compare_sequences
    * with permissive=True). */
  def sequencesMatch(a: Column, b: Column, nMax: Int = 10): Column =
    (length(a) === length(b)) && (countMismatches(a, b) <= nMax)

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
  private val LongNumRe = "[0-9]{6,}"

  /** Count of email-shaped substrings (pre-scrub audit column). */
  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailRe), lit(0)))

  /** Count of long (6+) digit runs — phone/account-number shapes. */
  def longNumCount(text: Column): Column =
    size(regexp_extract_all(text, lit(LongNumRe), lit(0)))

  /** Unicode NFC normalization ([[graft.expressions.NormalizeText]])
    * — canonical composition, the form whose output is bit-identical
    * to DuckDB's nfc_normalize; run it before any dedup/hashing so
    * composed and decomposed spellings of the same text collide. */
  def normalizeNfc(text: Column): Column =
    graft.expressions.NormalizeText(text, "NFC")

  /** Unicode NFKC normalization — NFC plus compatibility foldings
    * (ligatures, fullwidth forms, circled digits...); the
    * SentencePiece default pre-tokenization normal form. */
  def normalizeNfkc(text: Column): Column =
    graft.expressions.NormalizeText(text, "NFKC")

  /** PII scrub: emails → <EMAIL>, long digit runs → <NUM>. Both
    * patterns stay in the RE2-compatible subset so any engine
    * (Java regex here, RE2 in DuckDB/Go tooling) rewrites
    * identically. Column-level, codegen'd — the hygiene pass runs in
    * the same scan as tokenization. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailRe, "<EMAIL>"),
      LongNumRe, "<NUM>")

  /** Aggressive text normalization for near-exact dedup: lowercase,
    * strip everything outside [a-z0-9] + whitespace, collapse
    * whitespace runs, trim. Catches the re-encoded / re-punctuated /
    * case-shifted copies exact dedup misses, at zero pair-join cost.
    * The character classes are written out explicitly (no \s): Java
    * regex \s includes \x0B, RE2 (DuckDB/Go) does not — the explicit
    * class makes every engine rewrite identically. */
  def normalizeText(text: Column): Column =
    trim(
      regexp_replace(
        regexp_replace(lower(text), "[^a-z0-9 \n\t\r]", " "),
        "[ \n\t\r]+", " "))

  /** URL canonicalization — the first rung of Common-Crawl-style
    * dedup, where most duplication is the SAME page re-crawled under
    * cosmetically different URLs. Normalizations applied (each a
    * standard canonicalizer rule): drop the fragment; lowercase
    * scheme and host; strip a leading `www.`; strip the scheme's OWN
    * default port (`:80` for http, `:443` for https — never
    * cross-scheme); strip one trailing slash from the path;
    * drop tracking parameters (`utm_*`, `ref=`, `fbclid=`); sort the
    * surviving query parameters. Scheme differences (http vs https)
    * are PRESERVED — they can serve different content.
    *
    * Pure codegen'd string/array ops (split / filter / array_sort /
    * anchored regexp_replace with no backrefs), chosen so an
    * external SQL engine replays the same bytes — the same
    * portability contract as [[normalizeText]]. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val baseAndQuery = split(noFrag, "\\?", 2)
    val base = element_at(baseAndQuery, 1)
    val query = when(size(baseAndQuery) > 1, element_at(baseAndQuery, 2))
      .otherwise(lit(""))
    val params = array_sort(filter(split(query, "&"), p =>
      !(p.startsWith("utm_") || p.startsWith("ref=") ||
        p.startsWith("fbclid=") || p === "")))
    val schemeAndRest = split(base, "//", 2)
    val scheme = element_at(schemeAndRest, 1)
    // every sub-expression below is TOTAL (no ANSI-throwing
    // element_at on a maybe-short array): a non-hierarchical input
    // ("mailto:…", a relative path, garbage) flows through as empty
    // strings and the final selector returns it untouched
    val hostPath = when(size(schemeAndRest) > 1, element_at(schemeAndRest, 2))
      .otherwise(lit(""))
    val host0 = element_at(split(hostPath, "/", 2), 1)
    val path = hostPath.substr(length(host0) + 1, length(hostPath))
    val lscheme = lower(scheme)
    // default-port strip is scheme-conditional: :80 is only http's
    // default and :443 only https's — "http://h:443/x" serves a
    // DIFFERENT endpoint than "http://h/x" and must stay distinct
    val hostNoWww = regexp_replace(lower(host0), "^www\\.", "")
    val host = when(lscheme === "http:", regexp_replace(hostNoWww, ":80$", ""))
      .when(lscheme === "https:", regexp_replace(hostNoWww, ":443$", ""))
      .otherwise(hostNoWww)
    val canonBase = concat(lscheme, lit("//"), host,
      regexp_replace(path, "/$", ""))
    val canonQuery = array_join(params, "&")
    val canon = when(canonQuery === "", canonBase)
      .otherwise(concat(canonBase, lit("?"), canonQuery))
    // no "//" → not a hierarchical URL: pass through opaque (only
    // the fragment stripped) rather than fabricating a scheme
    when(size(schemeAndRest) > 1, canon).otherwise(noFrag)
  }

  /** Main-text extraction from raw HTML — the crawl stage between
    * URL filtering and line-level dedup (the trafilatura/jusText
    * role, as a deterministic codegen'd column chain rather than a
    * DOM parser): script/style/comment blocks removed, block-level
    * closers (`</p> </div> </li> </h1..6> </tr>` and `<br>`) become
    * newlines BEFORE tags strip so paragraph structure survives into
    * [[graft.operators.Dedup.dedupLines]], remaining tags dropped,
    * the six ubiquitous entities decoded (`&amp;` LAST, so
    * `&amp;lt;` yields `&lt;`, not `<`), whitespace runs collapsed,
    * blank lines squeezed. Every step is an RE2-compatible
    * regexp_replace / literal replace — no lookahead, no backrefs —
    * so an engine replaying the same chain gets the same bytes.
    * Known limitation (shared by any regex extractor): a bare
    * `< ... >` span in TEXT content is stripped like a tag. */
  def htmlExtract(html: Column): Column = {
    val noScript =
      regexp_replace(html, "(?is)<script[^>]*>.*?</script>", "")
    val noStyle =
      regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", "")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", "")
    val breaks = regexp_replace(noComment,
      "(?i)(</(p|div|li|h[1-6]|tr)>|<br\\s*/?>)", "\n")
    val noTags = regexp_replace(breaks, "<[^>]+>", "")
    val ent = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    val sp = regexp_replace(ent, "[ \t]+", " ")
    val nl = regexp_replace(sp, " ?\n ?", "\n")
    trim(regexp_replace(nl, "\n{2,}", "\n"), " \n")
  }

  /** Registered host of a URL: the authority with userinfo, port,
    * path/query/fragment, and a leading `www.` stripped, lowercased —
    * the key domain-level crawl policies (blocklists, per-site quota)
    * group on. Total like [[canonicalizeUrl]]: a non-hierarchical
    * input (no "//") yields null rather than a fabricated host.
    * Bracketed IPv6 authorities normalize to the bare address —
    * `https://[::1]:8080/x` and `https://[::1]/y` both key on `::1`
    * (the port strip keeps a closing bracket, then the brackets
    * drop), so IPv6 hosts group consistently with registered-name
    * semantics instead of keeping framing brackets in the key. */
  def urlHost(url: Column): Column = {
    val rest = split(url, "//", 2)
    val hostPath = when(size(rest) > 1, element_at(rest, 2))
      .otherwise(lit(null).cast("string"))
    val authority = element_at(split(hostPath, "[/?#]", 2), 1)
    val noUser = regexp_replace(authority, "^[^@]*@", "")
    // ':port' strips only OUTSIDE a bracketed IPv6 literal: the
    // optional captured ']' survives, so '[::1]:8080' -> '[::1]'
    // while '[2001:db8::1]' (no trailing :port) is untouched
    val noPort = regexp_replace(lower(noUser), "(\\])?:[0-9]*$", "$1")
    val noWww = regexp_replace(noPort, "^www\\.", "")
    val host = regexp_replace(noWww, "^\\[([^\\]]*)\\]$", "$1")
    when(host === "", lit(null).cast("string")).otherwise(host)
  }

  /** Order-sensitive rolling document fingerprint over tokens:
    * fold of rot-left-5 XOR token-hash. Pure bitwise ops — no
    * overflow, ANSI-safe, deterministic. The fast production default
    * (xxhash64 per token, fully codegen'd). */
  def rollingFingerprint(text: Column): Column =
    aggregate(
      tokens(text),
      lit(0L),
      (acc, t) =>
        shiftleft(acc, 5).bitwiseOR(shiftrightunsigned(acc, 59))
          .bitwiseXOR(xxhash64(t)))

  /** Order-sensitive polynomial fingerprint over tokens:
    * acc' = (acc * 31 + h(token)) mod (2^31 - 1), with h = the first
    * 7 hex chars of md5 as an integer. Same contract as
    * [[rollingFingerprint]] but every step is engine-portable
    * arithmetic (md5 + base conversion + modular fold), so an
    * external SQL engine can replay it bit-exactly — the
    * oracle-checkable variant. All intermediates < 2^36: ANSI-safe,
    * no overflow. */
  def polyFingerprint(text: Column): Column =
    aggregate(
      transform(tokens(text),
        // same value as conv(substring(md5(t), 1, 7), 16, 10)::long,
        // computed from the raw digest (Md5MinHashSpec pins equality)
        t => graft.expressions.Md5MinHashSig.prefix(t, 7)),
      lit(0L),
      (acc, h) => pmod(acc * lit(31L) + h, lit(2147483647L)))

  /** The fixed alphabet the char-diversity profile histograms over
    * (the synthetic-corpus charset; real deployments extend it). */
  val diversityAlphabet: String = "abcdefghijklmnopqrstuvwxyz "

  /** Confusable (homoglyph) characters and their ASCII targets — the
    * spam-evasion alphabet: Cyrillic а е о р с х у і ѕ and Greek
    * ο α ν render identically to Latin letters, so "viаgra" slips
    * every ASCII keyword filter while reading as "viagra". ONE
    * constant pair drives the Spark expression AND the oracle SQL
    * (both engines implement Postgres translate). Written as \\u
    * escapes per the §5 rule — composed/confusable spellings are
    * indistinguishable in an editor. */
  val homoglyphFrom: String =
    "\u0430\u0435\u043e\u0440\u0441\u0445\u0443\u0456\u0455" + // Cyrillic a e o p c x y i s
      "\u03bf\u03b1\u03bd" // Greek omicron/alpha/nu
  val homoglyphTo: String = "aeopcxyis" + "oav"

  /** Map confusables to their ASCII look-alikes (1:1 translate). */
  def homoglyphNormalize(text: Column): Column =
    translate(text, homoglyphFrom, homoglyphTo)

  /** The FULL Unicode fold ([[graft.expressions.UnicodeFold]]:
    * NFKC + ROOT lowercase + combining-mark strip + NFC) composed
    * with the confusable translate — NFKC folds width /
    * compatibility / case / marks but deliberately NOT confusables
    * (Cyrillic а is not compat-equivalent to Latin a), so the two
    * stages are complements, not alternatives. The production
    * normalization for multilingual dedup / decontamination; not
    * SQL-replayable (spec-pinned + fixture-subset oracle — the F3/F4
    * promotion pattern). */
  def unicodeFold(text: Column, withHomoglyphs: Boolean = true): Column = {
    val folded = graft.expressions.UnicodeFold(text)
    if (withHomoglyphs) homoglyphNormalize(folded) else folded
  }

  /** Count of confusable characters present. */
  def homoglyphCount(text: Column): Column =
    (length(text) - length(translate(text, homoglyphFrom, "")))
      .cast("long")

  /** Tokens mixing ASCII letters WITH confusables — the evasion
    * signature (an all-Cyrillic word is just Russian; "viаgra" with
    * one swapped а is an attack). */
  def mixedScriptTokenCount(text: Column): Column =
    size(filter(tokens(text),
      t => t.rlike("[a-z]") && t.rlike(s"[$homoglyphFrom]")))
      .cast("long")

  /** Luhn (mod-10) checksum over a digit string — TRUE iff the
    * number self-validates. The checksum is what separates a real
    * card number from a phone number, order id, or timestamp that
    * happens to be 13–19 digits: a regex-only PII scrubber overfires
    * on all of those (~90% of random digit runs fail Luhn, so the
    * check removes ~10x the false positives). From the right,
    * every second digit doubles (−9 when >9); valid ⇔ sum % 10 = 0.
    * Pure per-row integer HOF arithmetic — scan-fused,
    * engine-portable (the SQL replay is the same substring walk). */
  def luhnValid(numStr: Column): Column = {
    val n = length(numStr)
    val total = aggregate(
      sequence(lit(1), n),
      lit(0),
      (acc, i) => {
        val d = call_function("substring", numStr, n - i + lit(1), lit(1))
          .cast("int")
        val dd = d * 2
        acc + when(pmod(i, lit(2)) === 0,
          when(dd > 9, dd - 9).otherwise(dd)).otherwise(d)
      })
    pmod(total, lit(10)) === 0
  }

  /** Card-number candidates: maximal 13–19 digit runs. */
  def cardCandidates(text: Column): Column =
    regexp_extract_all(text, lit("[0-9]{13,19}"), lit(0))

  /** CHARACTER-DIVERSITY profile — the gibberish/keyboard-mash
    * signal (collapsed-char spam like "aaaa…" or two-key mashing
    * scores near 1e6; organic English sits far lower): per-character
    * counts over a FIXED alphabet via the length-of-removal trick
    * (the badwords-counting precedent — `translate` here, `replace`
    * in SQL; exact, scan-fused, no per-char explode), then the
    * Rényi-2 collision probability Σc² / n² in exact ppm. Shannon
    * entropy needs libm ln — not engine-portable; collision
    * probability is the same monotone repetitiveness axis in pure
    * LONG arithmetic (no IEEE op anywhere). Safe to 2^63: n ≤ 3e9
    * alphabet chars per doc before 1e6·Σc² can overflow — far past
    * any document.
    *
    * @return struct(n_alpha, n_distinct_alpha, collision_ppm) */
  def charDiversity(text: Column,
                    alphabet: String = diversityAlphabet): Column = {
    require(alphabet.nonEmpty && alphabet.distinct == alphabet,
      "alphabet must be non-empty with distinct characters")
    val counts = alphabet.map { c =>
      (length(text) - length(translate(text, c.toString, "")))
        .cast("long")
    }
    val nAlpha = counts.reduce(_ + _)
    val sumSq = counts.map(c => c * c).reduce(_ + _)
    val nDistinct = counts.map(c => when(c > 0, 1L).otherwise(0L))
      .reduce(_ + _)
    struct(nAlpha.as("n_alpha"), nDistinct.as("n_distinct_alpha"),
      when(nAlpha > 0,
        call_function("div", lit(1000000L) * sumSq, nAlpha * nAlpha))
        .otherwise(lit(0L)).as("collision_ppm"))
  }
}
