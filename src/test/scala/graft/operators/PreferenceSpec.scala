package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PreferenceSpec extends SparkSpec {
  import sqlImplicits._

  test("dpoPairs: max-vs-min with id-broken ties; singletons and " +
    "null ratings dropped") {
    val df = Seq(
      // prompt A: clear winner/loser
      ("A", "a-best", 5.0, 1L), ("A", "a-mid", 3.0, 2L),
      ("A", "a-worst", 1.0, 3L),
      // prompt B: ALL ratings tie → pair pinned to (min id, max id)
      ("B", "b1", 2.0, 10L), ("B", "b2", 2.0, 11L), ("B", "b3", 2.0, 12L),
      // prompt C: singleton → no pair
      ("C", "c1", 9.0, 20L),
      // prompt D: one rated + one null-rated → effectively singleton
      ("D", "d1", 4.0, 30L), ("D", "d-null", Double.NaN, 31L))
      .map { case (p, r, v, i) =>
        (p, r, if (v.isNaN) None else Some(v), i) }
      .toDF("prompt", "response", "rating", "id")
    val out = Preference.dpoPairs(df)
      .orderBy("prompt")
      .select("prompt", "n_candidates", "chosen", "rejected",
        "chosen_id", "rejected_id", "margin")
      .as[(String, Long, String, String, Long, Long, Double)]
      .collect().toSeq
    assert(out == Seq(
      ("A", 3L, "a-best", "a-worst", 1L, 3L, 4.0),
      ("B", 3L, "b1", "b3", 10L, 12L, 0.0)))
  }

  test("dpoPairs: rating ties at the top pick the SMALLEST id as " +
    "chosen, at the bottom the LARGEST id as rejected") {
    val df = Seq(
      ("P", "r1", 5.0, 7L), ("P", "r2", 5.0, 3L), // top tie → id 3
      ("P", "r3", 1.0, 4L), ("P", "r4", 1.0, 9L)) // bottom tie → id 9
      .toDF("prompt", "response", "rating", "id")
    val out = Preference.dpoPairs(df)
      .select("chosen_id", "rejected_id", "chosen", "rejected")
      .as[(Long, Long, String, String)].head()
    assert(out == ((3L, 9L, "r2", "r4")))
  }

  test("plan shape: one shuffle, no window, no join") {
    val df = Seq(("P", "r1", 5.0, 7L), ("P", "r2", 4.0, 3L))
      .toDF("prompt", "response", "rating", "id")
    val plan = Preference.dpoPairs(df)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Window"),
      s"pairing must be a single aggregation:\n$plan")
    assert("Exchange".r.findAllIn(plan).length == 1,
      s"expected exactly one shuffle:\n$plan")
  }
}
