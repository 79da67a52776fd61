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

  test("string ids resolve correctly on a diameter-3 chain") {
    // regression: the decimal-cast sum metric nulled out on
    // non-numeric ids and declared convergence after one round,
    // silently splitting any cluster of diameter >= 2
    val nodes = Seq("doc_a", "doc_b", "doc_c", "doc_d", "doc_z").toDF("id")
    val edges = Seq(("doc_a", "doc_b"), ("doc_b", "doc_c"),
      ("doc_c", "doc_d")).toDF("a_id", "b_id")
    val out = Graph.connectedComponents(nodes, edges)
      .as[(String, String)].collect().toMap
    assert(out == Map("doc_a" -> "doc_a", "doc_b" -> "doc_a",
      "doc_c" -> "doc_a", "doc_d" -> "doc_a", "doc_z" -> "doc_z"))
  }

  test("self-loop-only ids and duplicate node rows: both impls agree") {
    // id 9 exists only as a self-loop edge; node 7 is listed twice
    val nodes = Seq(7L, 7L, 8L).toDF("id")
    val edges = Seq((9L, 9L)).toDF("a_id", "b_id")
    val a = Graph.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().sorted.toSeq
    val b = Graph.connectedComponentsStars(nodes, edges)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(a == Seq((7L, 7L), (8L, 8L), (9L, 9L)))
    assert(b == a)
  }

  test("pageRankTicks: exact ticks, dangling redistribution, determinism") {
    // 0->1, 0->2, 1->2, 3->2; node 2 dangling. Expected ranks after
    // 3 iterations hand-derived AND cross-checked against the DuckDB
    // replay of the identical tick arithmetic — pinning the constants
    // pins the whole iteration (damping 17/20, one floor per term)
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (3L, 2L))
      .toDF("src", "dst")
    val got = Graph.pageRankTicks(edges, iters = 3)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq(
      (0L, 133664550781L), (1L, 205765136718L),
      (2L, 526905761718L), (3L, 133664550781L)))
    // mass conservation: flooring drops <= (E + N + 1) ticks per
    // iteration; nothing else may leak
    val total = got.map(_._2).sum
    assert(total <= 1000000000000L &&
      total >= 1000000000000L - 3L * (4 + 4 + 1) * 2,
      s"mass leaked: $total")
    // deterministic across runs (no float accumulation order)
    val again = Graph.pageRankTicks(edges, iters = 3)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(again == got)
    // parallel edges vote once each: doubling an edge shifts rank
    val multi = Graph.pageRankTicks(
      edges.union(Seq((0L, 1L)).toDF("src", "dst")), iters = 1)
      .as[(Long, Long)].collect().toMap
    val single = Graph.pageRankTicks(edges, iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(multi(1L) > single(1L),
      "a second 0->1 edge must raise node 1's rank")
  }
  test("pageRankTicksSeeded: mass stays on/flows from seeds; all-seeds = uniform") {
    import sqlImplicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L), (5L, 9L))
      .toDF("src", "dst")
    val allNodes = Seq(1L, 2L, 3L, 4L, 5L, 9L).toDF("node")
    // seeds = every node reduces term-for-term to the uniform form
    val uniform = graft.operators.Graph.pageRankTicks(edges, iters = 3)
      .as[(Long, Long)].collect().toMap
    val seededAll = graft.operators.Graph
      .pageRankTicksSeeded(edges, allNodes, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(seededAll == uniform)
    // seeds = {1}: init mass entirely on node 1; node 4 (no inbound,
    // not a seed) holds ZERO rank forever; ranks deterministic
    val s1 = graft.operators.Graph
      .pageRankTicksSeeded(edges, Seq(1L).toDF("node"), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(s1.keySet == uniform.keySet)
    assert(s1(4L) == 0L, s"non-seed source node gained mass: $s1")
    assert(s1(1L) > 0L && s1(2L) > 0L)
    // 9 is only reachable from the non-seed 5 -> zero after round 1
    assert(s1(9L) == 0L, s"unreachable-from-seed node gained mass: $s1")
    val again = graft.operators.Graph
      .pageRankTicksSeeded(edges, Seq(1L).toDF("node"), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(again == s1)
    // a seed set disjoint from the graph fails loudly
    intercept[IllegalArgumentException](graft.operators.Graph
      .pageRankTicksSeeded(edges, Seq(777L).toDF("node"), iters = 1)
      .collect())
  }

  test("anchorTermProfile: host-deduped term counts, spam host pinned") {
    // one spammy host repeats "best casino" 4 times; two honest
    // hosts each say "casino review" once. n_links counts inlinks,
    // n_hosts counts DISTINCT hosts — the anti-spam axis.
    val anchors = (
      Seq.fill(4)(("https://spam.example/p1", "https://t.org/x",
        "Best Casino")) ++ Seq(
        ("https://www.a.org/r", "https://t.org/x", "casino review"),
        ("https://b.org:8080/r", "https://t.org/x", "Casino review"),
        ("https://b.org/other", "https://t.org/y", "casino")))
      .toDF("src_url", "dst_url", "anchor")
    val got = graft.operators.Graph.anchorTermProfile(anchors)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // terms lowercase; www./port strip means a.org and b.org are the
    // honest hosts and spam.example collapses to ONE host
    assert(got(("https://t.org/x", "casino")) == ((6L, 3L)))
    assert(got(("https://t.org/x", "best")) == ((4L, 1L)))
    assert(got(("https://t.org/x", "review")) == ((2L, 2L)))
    assert(got(("https://t.org/y", "casino")) == ((1L, 1L)))
    // a null host still groups (the inlink existed) — one bucket
    val withNull = anchors.union(
      Seq(("no-scheme-at-all", "https://t.org/y", "casino"),
        ("also-unparseable", "https://t.org/y", "casino"))
        .toDF("src_url", "dst_url", "anchor"))
    val ny = graft.operators.Graph.anchorTermProfile(withNull)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(ny(("https://t.org/y", "casino")) == ((3L, 2L)))
  }

  test("labelPropagation: two triangles bridged by one edge keep " +
      "their own min labels") {
    import sqlImplicits._
    // triangle A {1,2,3}, triangle B {10,11,12}, bridge 3-10
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L), (3L, 10L)).toDF("src", "dst")
    val out = Graph.labelPropagation(edges, iters = 3)
      .as[(Long, Long)].collect().toMap
    // hand-traced: A converges to 1 by tick 2; B's min-tie cascade
    // (11,12 -> 10's label 3 at tick 2; 10 -> majority 3 at tick 3)
    // lands the whole B triangle on 3 — TWO distinct communities,
    // neither bleeding across the bridge
    assert(Seq(1L, 2L, 3L).forall(out(_) == 1L), out.toString)
    assert(Seq(10L, 11L, 12L).forall(out(_) == 3L), out.toString)
    assert(out.values.toSet.size == 2, out.toString)
  }

  test("labelPropagation: multi-edges collapse to one vote") {
    import sqlImplicits._
    // 5 parallel edges 1-2 must not outvote the 3 distinct
    // neighbors {3,4,5} of node 2 all carrying label 0 via node 0
    val star = Seq((0L, 3L), (0L, 4L), (0L, 5L),
      (3L, 2L), (4L, 2L), (5L, 2L))
    val multi = Seq.fill(5)((1L, 2L))
    val edges = (star ++ multi).toDF("src", "dst")
    val l1 = Graph.labelPropagation(edges, iters = 2)
      .as[(Long, Long)].collect().toMap
    // tick1: 3,4,5 -> 0 (min of {0,2}); 2 -> 1? no: neighbors of 2
    // are {1,3,4,5} one vote each, min label 1 wins the 4-way tie;
    // tick2: 2's neighbors {1,3,4,5} now carry {lab(1),0,0,0} -> 0
    assert(l1(2L) == 0L, l1.toString)
  }

  test("triangleStats: K4 census — 4 triangles, cc = 1") {
    import sqlImplicits._
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val r = Graph.triangleStats(k4)
      .as[(Long, Long, Long, Long, Long)].head()
    // 4 nodes, 6 edges, wedges = 4 * C(3,2) = 12, triangles = 4,
    // cc = 3*4/12 = 1 -> 1e6 ppm
    assert(r == ((4L, 6L, 12L, 4L, 1000000L)))
  }

  test("triangleStats: a star has wedges but no triangles") {
    import sqlImplicits._
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("src", "dst")
    val r = Graph.triangleStats(star)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(r == ((5L, 4L, 6L, 0L, 0L)))
  }

  test("triangleStats: directed duplicates and self-loops collapse") {
    import sqlImplicits._
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (3L, 1L),
      (1L, 3L)).toDF("src", "dst")
    val r = Graph.triangleStats(messy)
      .as[(Long, Long, Long, Long, Long)].head()
    // simple triangle on {1,2,3}: 3 edges, 3 wedges, 1 triangle
    assert(r == ((3L, 3L, 3L, 1L, 1000000L)))
  }
}
