package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Preference-pair assembly for DPO/RLHF-style training — the stage
  * after dialogue assembly ([[WindowOps.sessionTranscripts]]) that
  * turns rated candidate responses into (prompt, chosen, rejected)
  * rows (Rafailov et al. 2023's data shape). Reference analog: none
  * (the reference predates preference tuning); the table-merge
  * discipline follows its annotation collapse
  * (proteofav/annotation.py:19-60).
  *
  * Pairing is DETERMINISTIC per prompt: chosen = argmax by
  * (rating, then SMALLEST id), rejected = argmin by (rating, then
  * LARGEST id) — so when every rating ties the pair is still pinned
  * (min-id vs max-id row) and chosen ≠ rejected whenever the prompt
  * has ≥ 2 candidates. Rows with a NULL rating are dropped (no
  * preference evidence), prompts with < 2 candidates are dropped (no
  * pair). `margin` = chosen_rating − rejected_rating is emitted for
  * downstream filtering (margin 0 pairs carry no preference signal;
  * dropping them is the caller's policy, not silently ours).
  *
  * Scale shape: ONE shuffle on the prompt — both extrema ride a
  * single map-side-combined min/max over (rating, id, payload)
  * structs; no window over the candidate stream, no self-join. The
  * struct comparison never reaches the payload field: (rating, -id)
  * is already a total order (ids unique).
  */
object Preference {

  def dpoPairs(responses: DataFrame, promptCol: String = "prompt",
               responseCol: String = "response",
               ratingCol: String = "rating",
               idCol: String = "id"): DataFrame = {
    val cand = struct(
      col(ratingCol).cast("double").as("rating"),
      (-col(idCol)).as("nid"),
      col(idCol).as("id"),
      col(responseCol).as("resp"))
    responses
      .filter(col(ratingCol).isNotNull)
      .groupBy(col(promptCol).as("prompt"))
      .agg(count(lit(1)).as("n_candidates"),
        max(cand).as("c"), min(cand).as("rj"))
      .filter(col("n_candidates") >= 2)
      .select(col("prompt"),
        col("n_candidates").cast("long").as("n_candidates"),
        col("c").getField("resp").as("chosen"),
        col("rj").getField("resp").as("rejected"),
        col("c").getField("rating").as("chosen_rating"),
        col("rj").getField("rating").as("rejected_rating"),
        col("c").getField("id").as("chosen_id"),
        col("rj").getField("id").as("rejected_id"))
      .withColumn("margin",
        col("chosen_rating") - col("rejected_rating"))
  }
}
