package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import sqlImplicits._

  test("two components and a singleton resolve to min ids") {
    // 1-2, 2-3 (chain) | 10-11 | 99 isolated
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 99L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val out = Graph.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 99L -> 99L))
  }

  test("long chain converges within diameter rounds") {
    val n = 20
    val nodes = (1 to n).map(_.toLong).toDF("id")
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong))
      .toDF("a_id", "b_id")
    val out = Graph.connectedComponents(nodes, edges, maxIter = n)
      .as[(Long, Long)].collect()
    assert(out.forall(_._2 == 1L) && out.length == n)
  }

  test("edge direction does not matter") {
    val nodes = Seq(5L, 6L).toDF("id")
    val edges = Seq((6L, 5L)).toDF("a_id", "b_id") // reversed
    val out = Graph.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(5L -> 5L, 6L -> 5L))
  }
}
