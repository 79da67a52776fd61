package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed graph primitives for the dedup pipeline.
  *
  * Near-dup PAIRS are only half the job: to actually drop duplicates
  * you need the transitive closure — if A~B and B~C, then {A,B,C} is
  * one duplicate cluster and one representative survives. Reference
  * pipelines do this with union-find on one machine; the Spark-first
  * shape is iterative min-label propagation (Pregel-style), which is
  * a join + map-side-combined min aggregation per round.
  *
  * Rounds needed = graph diameter. Near-dup clusters are dense and
  * shallow (diameter 2-4), so the loop converges in a handful of
  * shuffles even at 100 TB; for adversarially long chains the
  * large-star/small-star variant (Kiveris et al., "Connected
  * Components in MapReduce") halves diameter per round — same
  * join+min building blocks, swap the message rule.
  */
object Graph {

  /** Connected components by min-label propagation.
    *
    * @param nodes one column = node id (numeric/string)
    * @param edges undirected edge list
    * @return (id, component) — component = min node id reachable,
    *         every input node present (singletons map to themselves)
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          aCol: String = "a_id", bCol: String = "b_id",
                          maxIter: Int = 25): DataFrame = {
    val idCol = nodes.columns.head
    // Symmetric edges, deduped once, cached: reused every round.
    // Both directions come from ONE explode over ONE scan — a
    // union(edges, edges.swapped) would evaluate the (often
    // expensive: near-dup pair generation) edge plan twice during
    // materialization. Hash-partitioned by src so every round's
    // message join reuses the cached partitioning instead of
    // re-shuffling the edge set.
    // Iterative DataFrames MUST truncate lineage each round:
    // labels_{n+1} references labels_n twice (self + messages), so
    // without truncation the LOGICAL plan doubles per iteration and
    // Catalyst analysis alone goes exponential — persist() only
    // short-circuits execution, not analysis. localCheckpoint(eager)
    // rebases the plan on the materialized RDD; on a real cluster
    // with flaky executors, reliable checkpoint() to DFS is the
    // drop-in hardened variant.
    val sym = edges.select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nSym = sym.count()
    // Only nodes touched by an edge can ever change label; propagate
    // over those and append the (at 100 TB: vastly larger) singleton
    // set once at the end. Init from the edge endpoints themselves so
    // edge ids absent from `nodes` still resolve (as before, via the
    // message union).
    // NOT eagerly checkpointed (r18): the init plan is one distinct
    // over the cached sym — depth 1, no analysis blowup — and its two
    // round-1 consumers share the distinct's Exchange (reuse), so the
    // checkpoint job bought nothing but a scheduling round-trip.
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("comp"))
    // Convergence check. For NUMERIC ids: labels only decrease, so
    // sum(comp) is a monotone metric — one cheap agg per round
    // instead of a change-count join. Summed as DECIMAL(38,0): a
    // double sum would lose ULPs at ~1e12 nodes and could declare
    // convergence one round early. Empty input sums to null →
    // normalize to 0 (the loop then converges immediately on the
    // empty fixpoint). For NON-numeric ids (the doc promises string
    // ids) the decimal cast yields null for every row and the sum
    // metric would freeze at 0 — declaring convergence after ONE
    // round and silently splitting clusters — so those use an exact
    // changed-row join per round instead.
    val numericComp = labels.schema("comp").dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val d = df.agg(sum(col("comp").cast("decimal(38,0)"))).head().getDecimal(0)
      if (d == null) java.math.BigDecimal.ZERO else d
    }
    var prevSum = if (numericComp) labelSum(labels) else null
    var iter = 0
    // labels is empty iff sym is — the count the cache materialization
    // already paid answers the emptiness probe for free (r18; was a
    // separate labels.isEmpty job)
    var converged = nSym == 0L
    while (iter < maxIter && !converged) {
      val msgs = sym.join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("comp"))
      val next = labels.unionByName(msgs)
        .groupBy("id").agg(min("comp").as("comp"))
        .localCheckpoint(true) // materializes + truncates lineage
      converged =
        if (numericComp) {
          val nextSum = labelSum(next)
          val same = nextSum.compareTo(prevSum) == 0
          prevSum = nextSum
          same
        } else next.select(col("id"), col("comp").as("__n"))
          .join(labels.select(col("id"), col("comp").as("__o")), Seq("id"))
          .where(col("__n") =!= col("__o")).isEmpty
      labels = next
      iter += 1
    }
    sym.unpersist(false)
    // Singletons (nodes with no incident edge) never change label —
    // they were excluded from every propagation round; append them
    // here with comp = own id. One anti-join, once, instead of
    // dragging the whole corpus through every iteration's shuffles.
    // distinct: duplicate rows in `nodes` must not duplicate label
    // rows (and keeps the output cardinality contract identical to
    // connectedComponentsStars, which q_dedup_cluster[_stars] pins)
    val allNodes = nodes.select(col(idCol).as("id")).distinct()
    val singletons = allNodes
      .join(labels.select("id"), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("comp"))
    labels = labels.unionByName(singletons)
    // Silent non-convergence would OVER-RETAIN duplicates downstream
    // (several reps for one true cluster) — fail loudly instead; the
    // caller raises maxIter (rounds needed = graph diameter) or moves
    // to the large-star/small-star variant for pathological chains.
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "graph diameter exceeds maxIter; raise it (diameter rounds " +
          "are needed) or switch to the diameter-halving " +
          "connectedComponentsStars variant")
    labels
  }

  /** Connected components by alternating large-star / small-star
    * (Kiveris et al., "Connected Components in MapReduce and
    * Beyond") — rounds needed are O(log diameter), not O(diameter):
    * the hardened variant for adversarially long chains where
    * min-label propagation's round count (= diameter) is the
    * bottleneck. Near-dup graphs are shallow, so [[connectedComponents]]
    * is the default; this is the path-graph / social-graph path.
    *
    * Each round is two grouped transforms over the edge list:
    *   large-star: per node u with m = min(Γ(u) ∪ {u}), rewire every
    *     neighbor v > u to (v, m);
    *   small-star: per node u with m = min(Γ≤(u) ∪ {u}) over the
    *     neighbors v ≤ u, rewire each of them (and u) to m.
    * The edge list contracts toward stars rooted at component
    * minima; fixpoint = edge set unchanged, checked via a
    * deterministic (count, sum-of-xxhash64) multiset signature:
    * different edge sets colliding on BOTH count and hash-sum is
    * ~2^-64 — accepted over an exact except()-count, which would add
    * a full extra join per round.
    * Same output contract as [[connectedComponents]]. */
  def connectedComponentsStars(nodes: DataFrame, edges: DataFrame,
                               aCol: String = "a_id", bCol: String = "b_id",
                               maxIter: Int = 25): DataFrame = {
    val idCol = nodes.columns.head
    def nonLoopDistinct(df: DataFrame): DataFrame =
      df.filter(col("u") =!= col("v")).distinct()
    // deterministic multiset signature of the (distinct) edge set:
    // count + decimal sum of per-edge hashes (order-independent)
    def signature(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(count(lit(1)),
        sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)"))).head()
      (r.getLong(0),
        Option(r.getDecimal(1)).getOrElse(java.math.BigDecimal.ZERO))
    }
    // edge endpoints materialized ONCE: the loop filter below drops
    // self-loops, but an id appearing ONLY in a self-loop edge must
    // still reach the output (connectedComponents initializes from
    // raw endpoints and keeps it; the id-coverage contract matches)
    val raw = edges.select(col(aCol).as("u"), col(bCol).as("v"))
      .localCheckpoint(true)
    // canonical direction child -> parent (u > v means u points at v)
    var cur = nonLoopDistinct(raw)
      .localCheckpoint(true)
    var sig = signature(cur)
    var iter = 0
    var converged = cur.isEmpty
    while (iter < maxIter && !converged) {
      // ---- large-star: symmetric neighbor view
      val symm = cur.unionByName(cur.select(col("v").as("u"), col("u").as("v")))
      val mins = symm.groupBy("u")
        .agg(least(min(col("v")), col("u")).as("m"))
      val large = nonLoopDistinct(
        symm.join(mins, "u")
          .filter(col("v") > col("u"))
          .select(col("v").as("u"), col("m").as("v")))
        .localCheckpoint(true)
      // ---- small-star over the large-star output: every edge is
      // already canonically child > parent (large-star emits (v, m)
      // with m <= u < v and nonLoopDistinct drops equality), so the
      // published "v <= u only" restriction is the whole set here
      val smallMin = large.groupBy("u")
        .agg(least(min(col("v")), col("u")).as("m"))
      val next = nonLoopDistinct(
        large.join(smallMin, "u")
          .select(col("v").as("u"), col("m").as("v"))
          .unionByName(smallMin.select(col("u"), col("m").as("v"))))
        .localCheckpoint(true)
      val nextSig = signature(next)
      converged = nextSig == sig
      cur = next
      sig = nextSig
      iter += 1
    }
    if (!converged && !cur.isEmpty)
      throw new IllegalStateException(
        s"connectedComponentsStars did not converge in $maxIter rounds")
    // Fixpoint edges are (node -> component min) stars. Children
    // appear as label rows; component ROOTS only appear on the comp
    // side — include them (plus node-list singletons) as
    // self-labeled rows so edge-only root ids are not dropped
    // (matching connectedComponents' id coverage: nodes ∪ edge
    // endpoints).
    val labels = cur.select(col("u").as("id"), col("v").as("comp"))
    val allIds = nodes.select(col(idCol).as("id"))
      .unionByName(raw.select(col("u").as("id")))
      .unionByName(raw.select(col("v").as("id")))
      .unionByName(labels.select(col("comp").as("id")))
      .distinct()
    val roots = allIds
      .join(labels.select("id"), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("comp"))
    labels.unionByName(roots)
  }

  /** PageRank in EXACT integer-tick arithmetic — the web-scale
    * link-graph quality signal (Common Crawl publishes host-level
    * rank tables computed exactly this way; CCNet-era pipelines rank
    * hosts before sampling). Every quantity is a long tick of the
    * total probability mass (`totalTicks` = 1.0), damping 0.85 is the
    * exact rational 17/20, and every per-edge contribution floors
    * once as `(rank · 17) div (20 · outdeg)` — so the result is
    * bit-identical across engines, partitionings and retries (no
    * float accumulation order), and the DuckDB oracle replays the
    * whole iteration by recursive CTE.
    *
    * Semantics: rank⁰ = ⌊total/N⌋ per node; rank^{t+1}(v) =
    * ⌊0.15·total/N⌋ + Σ_{(u,v)∈E} ⌊rank(u)·17 / (20·outdeg(u))⌋ +
    * ⌊D·17/(20·N)⌋ where D = Σ dangling rank (outdeg-0 mass is
    * redistributed uniformly, the standard correction). Parallel
    * edges count once each (a page linking twice votes twice —
    * callers wanting simple-graph semantics distinct the edges
    * first). Flooring drops ≤ 1 tick per term, so total mass shrinks
    * by ≤ (|E|+N+1) ticks per iteration — at the default 1e12 ticks
    * that is relative error < 1e-6 per iteration on any realistic
    * graph, and exactly reproducible everywhere.
    *
    * Scale shape: the canonical distributed PageRank — per iteration
    * ONE equi-join of the rank frontier to the (bounded, persisted)
    * degree table and edge list, one map-side-combined aggregation
    * keyed on dst, and the dangling-mass term as an IN-PLAN scalar
    * aggregate (a 1-row sum cross-joined back, which Spark executes
    * as a broadcast of one row) — NOT a per-iteration driver action.
    * The dangling-node set is static (outdeg is a property of the
    * edge list), so each node carries a `has_out` flag computed once
    * at setup and the scalar is one map-side-combined sum over the
    * already-persisted frontier. Iterations therefore launch ZERO
    * jobs each: every intermediate frontier is persisted LAZILY
    * (both consumers — next's contrib join and next-next's dangling
    * sum — read the cache once it is built by the terminal action),
    * and lineage is truncated by an eager localCheckpoint only every
    * `chkEvery` rounds, bounding logical-plan growth (the frontier
    * feeds two branches per round → tree size ≤ 2^chkEvery between
    * truncations) while amortizing the per-job floor that dominated
    * the toy-scale bench (3 iterations used to cost 5 driver
    * actions; now: the node count + one final materialization). */
  def pageRankTicks(edges: DataFrame, iters: Int,
                    srcCol: String = "src", dstCol: String = "dst",
                    totalTicks: Long = 1000000000000L,
                    chkEvery: Int = 4): DataFrame =
    pageRankTicksImpl(edges, iters, srcCol, dstCol, totalTicks,
      chkEvery, seeds = None)

  /** PERSONALIZED PageRank in the same exact tick arithmetic —
    * TrustRank (Gyöngyi et al. 2004): the teleport mass (3/20 of
    * every node's rank, plus all dangling mass) returns ONLY to the
    * seed set instead of uniformly to all nodes, so authority flows
    * outward from trusted seeds and spam clusters far from them
    * starve — the crawl-pipeline trust signal that demotes link
    * farms host-rank alone cannot. `seeds` is one column of node ids
    * (rows not in the graph's node universe are ignored; must
    * intersect it). Arithmetic: rank⁰ = ⌊total/|S|⌋ on seeds, 0
    * elsewhere; per iteration seeds receive ⌊3·total/(20·|S|)⌋ +
    * ⌊D·17/(20·|S|)⌋ on top of the link contributions every node
    * gets. Same plan shape, persistence and lineage discipline as
    * [[pageRankTicks]] — the seed flag rides the node universe
    * exactly like has_out. With seeds = all nodes this reduces
    * term-for-term to the uniform iteration. */
  def pageRankTicksSeeded(edges: DataFrame, seeds: DataFrame, iters: Int,
                          srcCol: String = "src", dstCol: String = "dst",
                          totalTicks: Long = 1000000000000L,
                          chkEvery: Int = 4): DataFrame =
    pageRankTicksImpl(edges, iters, srcCol, dstCol, totalTicks,
      chkEvery, seeds = Some(seeds))

  private def pageRankTicksImpl(edges: DataFrame, iters: Int,
                                srcCol: String, dstCol: String,
                                totalTicks: Long,
                                chkEvery: Int,
                                seeds: Option[DataFrame]): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(totalTicks >= 1L, "totalTicks must be positive")
    require(chkEvery >= 1, s"chkEvery must be >= 1, got $chkEvery")
    val e0 = edges.select(col(srcCol).as("esrc"), col(dstCol).as("edst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e0.groupBy("esrc").agg(count(lit(1)).as("outdeg"))
    // outdeg PRE-JOINED into the persisted edge table once: every
    // iteration's contrib pass is then ONE equi-join (frontier ⋈ e)
    // instead of frontier ⋈ deg ⋈ e — outdeg is iteration-invariant,
    // so carrying it on the edge row trades |E| longs of storage for
    // a whole join per round
    val e = e0.join(deg, "esrc")
      .select(col("esrc"), col("edst"), col("outdeg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // node universe with the static dangling flag: has_out ⇔ the node
    // has at least one outgoing edge (deg membership)
    val nodes = e0.select(col("esrc").as("node"))
      .unionByName(e0.select(col("edst").as("node"))).distinct()
      .join(deg.select(col("esrc").as("node"), lit(true).as("has_out")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("has_out"), lit(false)).as("has_out"))
    // seed flag rides the node universe (the has_out pattern):
    // uniform PageRank = every node is a seed; TrustRank = the
    // caller's set, intersected with the graph (an id outside the
    // universe can neither hold nor receive teleport mass). ONE
    // persisted node table either way.
    val seededP = (seeds match {
      case None => nodes.withColumn("is_seed", lit(true))
      case Some(sd) =>
        val sCol = sd.columns.head
        nodes.join(
          sd.select(col(sCol).as("node")).distinct()
            .withColumn("__s", lit(true)),
          Seq("node"), "left")
          .select(col("node"), col("has_out"),
            coalesce(col("__s"), lit(false)).as("is_seed"))
    }).persist(StorageLevel.MEMORY_AND_DISK)
    val n = seededP.count()
    require(n >= 1, "pageRankTicks needs at least one edge")
    // teleport denominator = |seeds| (uniform case: |nodes|)
    val nS = seeds match {
      case None => n
      case Some(_) =>
        seededP.filter(col("is_seed")).count()
    }
    require(nS >= 1,
      "pageRankTicksSeeded: no seed id is a node of the graph")
    val base = (3L * totalTicks) / (20L * nS)
    val pending = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var rank = seededP.withColumn("rank",
        when(col("is_seed"), lit(totalTicks / nS)).otherwise(lit(0L)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    pending += rank
    try {
      for (i <- 1 to iters) {
        val contrib = rank
          .join(e, col("node") === col("esrc"))
          .select(col("edst").as("cnode"),
            expr("(rank * 17) div (20 * outdeg)").as("c"))
          .groupBy("cnode").agg(sum("c").as("contrib"))
        // dangling mass of THIS frontier as a 1-row aggregate joined
        // into the plan — exact long sum, bit-identical to the old
        // driver-collected scalar, zero extra driver round-trips
        val dang = rank.agg(coalesce(
          sum(when(!col("has_out"), col("rank")).otherwise(lit(0L))),
          lit(0L)).as("dang_mass"))
        val next = seededP
          .join(contrib, col("node") === col("cnode"), "left")
          .crossJoin(dang)
          .select(col("node"), col("has_out"), col("is_seed"),
            (when(col("is_seed"), lit(base)).otherwise(lit(0L)) +
              coalesce(col("contrib"), lit(0L)) +
              when(col("is_seed"),
                expr(s"(dang_mass * 17) div (${20L * nS})"))
                .otherwise(lit(0L))).as("rank"))
        rank =
          if (i % chkEvery == 0) {
            // eager truncation: materializes, rebases the plan, and
            // lets the superseded cached frontiers go
            val r = next.localCheckpoint(true)
            pending.foreach(_.unpersist(false)); pending.clear()
            r
          } else {
            val r = next.persist(StorageLevel.MEMORY_AND_DISK)
            pending += r; r
          }
      }
      // ONE terminal materialization: runs every deferred round,
      // building each intermediate frontier's cache exactly once
      val out = rank.select(col("node"), col("rank")).localCheckpoint(true)
      pending.foreach(_.unpersist(false))
      out
    } finally {
      e0.unpersist(false); e.unpersist(false); seededP.unpersist(false)
    }
  }

  /** Anchor-term profile of the link graph — the OTHER thing WAT is
    * for besides edges ([[graft.sources.Wat.anchorTexts]]): per
    * (target URL, anchor term), how many inlinks use the term and
    * how many DISTINCT SOURCE HOSTS do. The host breadth is the
    * anti-spam axis (one host repeating "best casino" ten thousand
    * times is n_links = 10000 but n_hosts = 1; ranking and
    * pair-mining read n_hosts); term source = whitespace tokens of
    * the lowercased anchor, host = [[TextFunctions.urlHost]] on the
    * source URL (null hosts group as one unparseable bucket rather
    * than vanishing — the inlink still existed).
    *
    * Scale shape: exact distinct via the explicit TWO-LEVEL
    * aggregation — (dst, term, host) first (map-side combined, the
    * spammy-host fan-in collapses before it ever shuffles), then
    * (dst, term) counting group rows. No count_distinct expand, no
    * join; both exchanges key on (dst, term)-prefixed tuples so the
    * second is narrow. Skew note: a viral target URL is bounded by
    * its distinct (term, host) combinations after level 1, not by
    * its raw inlink count.
    *
    * @param anchors (src_url, dst_url, anchor) — the
    *                [[graft.sources.Wat.anchorTexts]] contract
    * @return (dst_url, term, n_links, n_hosts)
    */
  def anchorTermProfile(anchors: DataFrame): DataFrame =
    anchors
      .select(col("dst_url"),
        graft.functions.TextFunctions.urlHost(col("src_url"))
          .as("src_host"),
        explode(graft.functions.TextFunctions.tokens(
          lower(col("anchor")))).as("term"))
      .groupBy("dst_url", "term", "src_host")
      .agg(count(lit(1)).as("n"))
      .groupBy("dst_url", "term")
      .agg(sum("n").as("n_links"), count(lit(1)).as("n_hosts"))

  /** SYNCHRONOUS LABEL PROPAGATION (community detection — Raghavan
    * et al. 2007) over the UNDIRECTED simple graph, made fully
    * deterministic and hence hash-checkable: labels start as node
    * ids; each tick every node adopts the label most frequent among
    * its neighbors, ties broken by SMALLEST label (classic LPA picks
    * randomly — a hash-checked operator cannot), for a FIXED tick
    * count (convergence-stop is order-dependent; fixed ticks are
    * exact, the pageRankTicks discipline). The link-spam use: after
    * a few ticks, tightly interlinked host clusters (link farms)
    * collapse onto one label while organic neighborhoods stay mixed
    * — the cluster-size rollup is the demotion signal.
    *
    * Integer-only state, so results are bit-identical across
    * partitionings and engines. Per tick: ONE join (edges ⋈ labels,
    * both sides hash-partitioned on the join key), ONE (dst, label)
    * count (map-side combined — a node's repeated-label votes
    * collapse before the shuffle), ONE per-node argmax as a
    * max(struct(count, −label)) aggregate — never a window over the
    * vote stream. Edges symmetrize + dedup ONCE (persisted);
    * iteration state rebases via eager localCheckpoint each tick.
    *
    * @param edges directed (src, dst) pairs; symmetrized internally,
    *              self-loops dropped, multi-edges collapse (a vote
    *              per NEIGHBOR, not per link)
    * @return (node, lab) after `iters` ticks
    */
  def labelPropagation(edges: DataFrame, iters: Int,
                       srcCol: String = "src",
                       dstCol: String = "dst"): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val base = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
    val sym = base
      .unionByName(base.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("lab", col("node"))
      .localCheckpoint(true)
    try {
      for (_ <- 1 to iters) {
        val votes = sym
          .join(labels, sym("src") === labels("node"))
          .select(col("dst"), col("lab"))
          .groupBy("dst", "lab").agg(count(lit(1)).as("c"))
        val next = votes
          .groupBy("dst")
          .agg(max(struct(col("c"), (-col("lab")).as("nl"))).as("m"))
          .select(col("dst").as("node"), (-col("m.nl")).as("lab"))
        val prev = labels
        labels = next.localCheckpoint(true)
        prev.unpersist(false)
      }
      labels
    } finally {
      sym.unpersist(false)
    }
  }

  /** EXACT TRIANGLE COUNT + global clustering coefficient — the
    * graph-shape statistic separating organic link neighborhoods
    * (high closure) from spray-pattern spam and scraper farms (star
    * shapes, near-zero closure). The FORWARD algorithm (Schank &
    * Wagner 2005): orient each undirected edge from its
    * (degree, id)-smaller endpoint to the larger, so every node's
    * out-degree is bounded by O(sqrt(E)) regardless of raw degree —
    * a celebrity host with 10M inlinks contributes wedges only
    * through its few HIGHER-ranked neighbors, not its 10M fans; the
    * wedge self-join that explodes on a raw adjacency stays bounded
    * by arboricity. Each triangle {u,v,w} (orientation order
    * u<v<w) appears as EXACTLY one wedge (u→v, u→w) whose closing
    * edge v→w exists — one join on the apex, one co-partitioned join
    * on the closing pair, all-long keys, no double counting to
    * divide away.
    *
    * Output (one row): n_nodes, n_edges (undirected simple),
    * n_wedges (Σ d(d−1)/2), n_triangles, and the global clustering
    * coefficient 3·triangles/wedges in exact ppm (pure long
    * floor-division — not even an IEEE op in the chain).
    */
  def triangleStats(edges: DataFrame,
                    srcCol: String = "src",
                    dstCol: String = "dst"): DataFrame = {
    val base = edges.select(col(srcCol).cast("long").as("s"),
        col(dstCol).cast("long").as("d"))
      .filter(col("s") =!= col("d"))
    // canonical undirected simple edges
    val e1 = base.select(least(col("s"), col("d")).as("a"),
        greatest(col("s"), col("d")).as("b"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cached = scala.collection.mutable.ArrayBuffer[DataFrame](e1)
    try {
      val deg = e1.select(col("a").as("n"))
        .unionByName(e1.select(col("b").as("n")))
        .groupBy("n").agg(count(lit(1)).as("deg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      cached += deg
      val nNodes = deg.agg(count(lit(1)).as("n_nodes"),
        sum(expr("deg * (deg - 1) div 2")).as("n_wedges"))
      val nEdges = e1.agg(count(lit(1)).as("n_edges"))
      // orient by (deg, id): u = the smaller endpoint under that order
      val withDeg = e1
        .join(deg.select(col("n").as("a"), col("deg").as("da")), "a")
        .join(deg.select(col("n").as("b"), col("deg").as("db")), "b")
      val lowerFirst = col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b"))
      val eo = withDeg.select(
          when(lowerFirst, col("a")).otherwise(col("b")).as("u"),
          when(lowerFirst, col("b")).otherwise(col("a")).as("v"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      cached += eo
      val wedges = eo.as("x").join(eo.as("y"),
          col("x.u") === col("y.u") && col("x.v") =!= col("y.v"))
        .select(col("x.v").as("cu"), col("y.v").as("cv"))
      val tri = wedges.join(eo,
          col("cu") === col("u") && col("cv") === col("v"))
        .agg(count(lit(1)).as("n_triangles"))
      val out = nNodes.crossJoin(nEdges).crossJoin(tri)
        .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
          col("n_triangles"),
          when(col("n_wedges") > 0,
            expr("(3000000 * n_triangles) div n_wedges"))
            .otherwise(lit(0L)).as("global_cc_ppm"))
      // materialize before releasing the cached intermediates
      out.localCheckpoint(true)
    } finally {
      cached.foreach(_.unpersist(false))
    }
  }

  /** COMPONENT-SIZE HISTOGRAM — the cluster-health audit over
    * [[connectedComponents]] (dedup clusters, host graphs): how many
    * components of each size exist. The two numbers a corpus owner
    * reads off it: the giant-component share (a near-total giant in
    * a near-dup graph means the threshold is too loose — one more
    * merge pass would collapse the corpus) and the singleton mass
    * (how much is untouched by clustering). Two map-side-combined
    * aggregations over the label table; output is bounded by the
    * number of DISTINCT sizes — at most O(√nodes). Labels come from
    * the STARS variant: a health audit runs on arbitrary graphs
    * (long chains included), so the O(log diameter) round count is
    * the right default — measured 8.0 s (min-label, ~diameter rounds
    * on the 97-node functional graph) vs the stars form at sf0.1;
    * the two variants' outputs are pinned identical by the CC spec
    * suite. */
  def componentSizes(nodes: DataFrame, edges: DataFrame,
                     aCol: String = "a_id",
                     bCol: String = "b_id"): DataFrame =
    connectedComponentsStars(nodes, edges, aCol, bCol)
      .groupBy("comp").agg(count(lit(1)).as("size"))
      .groupBy("size").agg(count(lit(1)).as("n_components"))
}
