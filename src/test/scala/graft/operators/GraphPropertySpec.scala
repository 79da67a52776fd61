package graft.operators

import graft.SparkSpec

/** Randomized cross-check: distributed min-label propagation must
  * equal a local union-find on arbitrary graphs (chains, cliques,
  * singletons, dense/sparse mixes). */
class GraphPropertySpec extends SparkSpec {
  import sqlImplicits._

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // min node id per component == find with min-root union above
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  test("connectedComponents equals union-find on 25 random graphs") {
    val rnd = new scala.util.Random(73)
    (1 to 25).foreach { trial =>
      val n = rnd.nextInt(35) + 5
      val m = rnd.nextInt(2 * n)
      val edges = Seq.fill(m)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val expected = unionFind(n, edges)
      val got = Graph.connectedComponents(
          (0 until n).map(_.toLong).toDF("id"),
          if (edges.isEmpty) Seq((0L, 0L)).toDF("a_id", "b_id").limit(0)
          else edges.toDF("a_id", "b_id"),
          maxIter = n)
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"trial $trial: n=$n edges=$edges")
    }
  }

  test("connectedComponentsStars equals union-find on 25 random graphs") {
    val rnd = new scala.util.Random(89)
    (1 to 25).foreach { trial =>
      val n = rnd.nextInt(35) + 5
      val m = rnd.nextInt(2 * n)
      val edges = Seq.fill(m)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val expected = unionFind(n, edges)
      val got = Graph.connectedComponentsStars(
          (0 until n).map(_.toLong).toDF("id"),
          if (edges.isEmpty) Seq((0L, 0L)).toDF("a_id", "b_id").limit(0)
          else edges.toDF("a_id", "b_id"),
          maxIter = n)
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"trial $trial: n=$n edges=$edges")
    }
  }

  test("both variants label edge-only ids (roots and children) consistently") {
    // node list covers only id 9; the edge introduces 5 (the root)
    val nodes = Seq(9L).toDF("id")
    val edges = Seq((5L, 9L)).toDF("a_id", "b_id")
    val expected = Map(5L -> 5L, 9L -> 5L)
    assert(Graph.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap == expected)
    assert(Graph.connectedComponentsStars(nodes, edges)
      .as[(Long, Long)].collect().toMap == expected)
  }

  test("stars variant converges in O(log d) rounds on a 200-node chain") {
    val n = 200
    // plain min-label propagation needs ~n rounds on a path; the
    // alternating-stars contraction must finish far under that
    val edges = (0 until n - 1).map(i => (i.toLong, i + 1L))
    val got = Graph.connectedComponentsStars(
        (0 until n).map(_.toLong).toDF("id"),
        edges.toDF("a_id", "b_id"),
        maxIter = 20)
      .as[(Long, Long)].collect()
    assert(got.length == n && got.forall(_._2 == 0L))
  }
}
