package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level statistics for the training-data pipeline: vocabulary
  * / document-frequency tables and length profiles. One explode +
  * one map-side-combined aggregation each — the shuffle carries
  * |vocab| partial counts, not tokens.
  */
object Corpus {

  /** Document frequency per distinct token (the table behind prefix
    * filtering, idf weighting, and stopword discovery). */
  def tokenDf(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(TextFunctions.tokenSet(col(textCol))).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("df"))

  /** Top-k characteristic terms per document, ranked by
    * (tf desc, df asc, token asc) — the tf-idf ordering without a
    * float idf: for fixed tf, rarer (lower-df) terms win, which is
    * exactly idf's tie-break, and integer ranks stay bit-stable
    * across engines (ln() is libm-dependent). Two map-side-combined
    * aggregations + one window; the df table joins on token
    * (broadcast when vocab is bounded, shuffle otherwise — AQE
    * decides from size stats). */
  def tfIdfTopTerms(docs: DataFrame, k: Int, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    // tf feeds both the df aggregation and the final join — persist
    // the compact (doc, tok, tf) table and materialize it eagerly so
    // the corpus is tokenized once, not once per branch (at 100 TB
    // this is the checkpoint of the term-frequency table)
    val tf = docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    tf.count()
    val df_ = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("tf").desc, col("df").asc, col("tok").asc)
    CacheOps.materializeAndRelease(
      tf.join(df_, "tok")
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col(idCol), col("rank"), col("tok"), col("tf"), col("df")),
      tf)
  }

  /** Corpus bigram counts (adjacent token pairs) — the n-gram LM /
    * collocation table. Explode + one combined count; the shuffle
    * carries |distinct bigrams| partials. */
  def bigramCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(TextFunctions.shingles(
        TextFunctions.tokens(col(textCol)), 2)).as("bigram"))
      .groupBy("bigram")
      .agg(count(lit(1)).as("n"))

  /** Benchmark decontamination: flag corpus documents whose distinct
    * word n-grams overlap a benchmark set by >= tau.
    *
    * The benchmark's distinct shingle set is small (eval suites are
    * KBs–MBs, the corpus is the 100 TB side) — broadcast it; the
    * corpus side is one explode + one broadcast-hash semi-count +
    * one groupBy, no shuffle of text. Output: one row per corpus doc
    * with its distinct-shingle count, overlap count, and flag. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, shingleN: Int,
                    tau: Double, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    def sh(c: Column) = array_distinct(
      TextFunctions.shingles(TextFunctions.tokens(c), shingleN))
    val benchSh = benchmark
      .select(explode(sh(col(textCol))).as("sh")).distinct()
    // tokenize+shingle the (big) corpus side ONCE: the cached
    // (id, shingles) table feeds both the overlap count and the
    // per-doc totals, instead of re-deriving shingles per branch
    val corpSets = corpus.select(col(idCol), sh(col(textCol)).as("shs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    corpSets.count()
    val corpSh = corpSets.select(col(idCol), explode(col("shs")).as("sh"))
    val overlap = corpSh.join(broadcast(benchSh), "sh")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_overlap"))
    CacheOps.materializeAndRelease(
      corpSets.select(col(idCol),
          size(col("shs")).cast("long").as("n_shingles"))
        .join(overlap, Seq(idCol), "left")
        .na.fill(0L, Seq("n_overlap"))
        .withColumn("contaminated",
          col("n_overlap").cast("double") /
            greatest(col("n_shingles"), lit(1L)) >= tau),
      corpSets)
  }

  /** Corpus length profile per grouping key: docs, total/mean token
    * counts — the cheap first look at a new 100 TB crawl. */
  def lengthProfile(docs: DataFrame, keys: Seq[String],
                    textCol: String = "text"): DataFrame =
    docs.select((keys.map(col) :+
        TextFunctions.tokenCount(col(textCol)).cast("long").as("__n")): _*)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__n")).as("total_tokens"),
        (sum(col("__n")).cast("double") / count(col("__n"))).as("mean_tokens"))
}
