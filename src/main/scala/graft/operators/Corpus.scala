package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame}
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
