package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for joins whose key distribution is
  * power-law (hot entities, hot tokens — routine at 100 TB where one
  * key can hold 1000× the median and pin a single reducer).
  *
  * Salted join: the skewed (large, many-rows-per-key) side gets a
  * random-but-deterministic salt in [0, buckets); the small side
  * replicates `buckets`× with every salt value. The join key becomes
  * (key, salt), spreading each hot key over `buckets` reducers.
  * Complements AQE's skew-join splitting (which handles partition-
  * level skew post-shuffle; salting also fixes single-KEY hotspots
  * AQE cannot split).
  */
object Skew {

  /** Per-row salt: whole-row hash mixed with the row's position
    * (monotonically_increasing_id). The position term matters on
    * duplicate-heavy hot keys — a pre-dedup table can hold millions
    * of BYTE-IDENTICAL rows for one hot key, and a pure content hash
    * would send every copy to the same bucket, recreating the exact
    * single-reducer hotspot salting exists to break. Join
    * correctness never depends on WHICH salt a row gets (the small
    * side carries every salt value), so positional mixing is safe. */
  private def salt(df: DataFrame, buckets: Int): Column =
    pmod(xxhash64(
      df.columns.toIndexedSeq.map(col) :+ monotonically_increasing_id(): _*),
      lit(buckets)).cast("int")

  /** Inner/left-family equi-join with a salted key: `big` is salted,
    * `small` is replicated buckets×. Result equals the unsalted
    * join FOR inner/left/left_semi/left_anti only — a right/full
    * outer join would emit each unmatched small-side row once per
    * replica, so those types are rejected. */
  def saltedJoin(big: DataFrame, small: DataFrame,
                 keys: Seq[(String, String)], buckets: Int,
                 how: String = "inner"): DataFrame = {
    require(buckets > 0)
    val okHow = Set("inner", "cross", "left", "leftouter", "left_outer",
      "semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti")
    require(okHow(how.toLowerCase(java.util.Locale.ROOT).replace(" ", "")),
      s"saltedJoin is only correct for inner/left-family joins; '$how' " +
        "would duplicate every unmatched replicated small-side row " +
        "buckets times")
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "saltedJoin reserves the column name __salt; rename the input column")
    val b = big.withColumn("__salt", salt(big, buckets))
    val s = small.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    val cond = (keys.map { case (l, r) => b(l) === s(r) } :+
      (b("__salt") === s("__salt"))).reduce(_ && _)
    b.join(s, cond, how).drop("__salt")
  }

  /** Per-key frequency profile — pick the keys worth salting
    * (everything above `minCount`). One pass, map-side combined. */
  def hotKeys(df: DataFrame, keys: Seq[String], minCount: Long): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
}
