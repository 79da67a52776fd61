package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range self-join ("contacts").
  *
  * ProteoFAV finds residue contacts with a cKDTree over all atom
  * coordinates on one node (proteofav/structures.py:366,382). That
  * cannot scale; the Spark-first equivalent is grid bucketing: hash
  * each row to a cell of width `eps`, replicate one side into its
  * three neighbouring cells, equi-join on the cell id, then apply the
  * exact distance predicate. Candidate generation is a plain shuffle
  * equi-join — never a theta/cross join — so it scales linearly in
  * rows × local density. Each qualifying pair is produced exactly
  * once (the left row matches the right row's cell exactly once).
  */
object RangeJoin {

  /** Pairs (a, b) with a.partition == b.partition, |a.v − b.v| <= eps
    * and a.id < b.id. Output columns: partition key, a_id, b_id,
    * a_v, b_v. */
  def selfRangeJoin(df: DataFrame, partitionKey: String, idCol: String,
                    valueCol: String, eps: Double): DataFrame = {
    val cell = floor(col(valueCol) / eps).cast("long")
    val a = df.select(
      col(partitionKey).as("pk"), col(idCol).as("a_id"),
      col(valueCol).as("a_v"),
      explode(array(cell - 1, cell, cell + 1)).as("cell"))
    val b = df.select(
      col(partitionKey).as("pk2"), col(idCol).as("b_id"),
      col(valueCol).as("b_v"), cell.as("cell2"))
    a.join(b,
        a("cell") === b("cell2") && a("pk") === b("pk2") &&
          a("a_id") < b("b_id") &&
          abs(a("a_v") - b("b_v")) <= eps)
      .select(col("pk").as(partitionKey), col("a_id"), col("b_id"),
        col("a_v"), col("b_v"))
  }
}
