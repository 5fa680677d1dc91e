package graft.operators

import graft.Rnd.rnd
import graft.{QDef, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.12 Graph analytics over relational edges.
  *
  * Companion to `dedup_cluster` (label-propagation connected components in
  * Dedup.scala): that covers equivalence-class discovery, this covers
  * fixed-point score propagation — the two iterative-graph shapes a
  * Spark-native engine needs. The iteration idiom is the same:
  * `localCheckpoint()` between rounds truncates the exponentially-inlining
  * lineage (measured in round 2: 8.3 s → 3.0 s for the clustering query).
  */
object Graph {

  /** Part co-purchase edge list (a < b): a pair of parts becomes an edge
    * when co-purchased in >= TriangleSupport orders — the support-threshold
    * sparsification that keeps a co-occurrence graph from densifying as the
    * corpus grows (pair instances are bounded per order by items², never
    * corpus²). Shared by `graph_triangles` (motif counting) and
    * `graph_kcore` (dense-subgraph peeling) — the classic pairing: every
    * triangle lives entirely inside the 2-core, so peeling first is the
    * standard prefilter before motif work. */
  private def coEdges(s: SparkSession, dir: String): DataFrame = {
    val li = T.lineitem(s, dir).select(col("l_orderkey"), col("l_partkey"))
    li.as("x").join(li.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
      .groupBy(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
      .agg(count(lit(1)).as("w"))
      .where(col("w") >= graft.GraftConfig.TriangleSupport)
      .select("a", "b")
  }

  private val coSql =
    s"""co AS (
       |  SELECT x.l_partkey AS a, y.l_partkey AS b
       |  FROM lineitem x JOIN lineitem y
       |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
       |  GROUP BY 1, 2 HAVING count(*) >= ${graft.GraftConfig.TriangleSupport})""".stripMargin

  /** Degree-ordered oriented edge frame: each undirected edge points from
    * its lower-(degree, id) endpoint, so every triangle is enumerated
    * exactly once from its lowest vertex and per-vertex wedge work is
    * bounded by out-degree² — the arboricity bound that keeps hub vertices
    * from exploding the wedge join (id-only orientation leaves a
    * high-degree hub with ALL its wedges in one join group; degree
    * ordering splits them across tasks). The (degree, id) tuple rides
    * along as a struct and orders lexicographically — no global rank
    * window needed. Shared by `graph_triangles` and `graph_cluster_coeff`
    * (both enumerate the same triangle set; orientation only affects WHERE
    * each triangle is counted from, so the id-ordered oracles are
    * unaffected). Columns: vs (source), vt (target), kt (target's
    * (d, v) struct, the wedge-dedup key). */
  private def orientedEdges(co: DataFrame): DataFrame = {
    val deg = co.select(col("a").as("v"))
      .unionAll(co.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    def dv(d: String, v: String) =
      struct(col(d).as("d"), col(v).as("v"))
    val aLow = dv("da", "a") < dv("db", "b")
    co
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .select(
        when(aLow, col("a")).otherwise(col("b")).as("vs"),
        when(aLow, col("b")).otherwise(col("a")).as("vt"),
        when(aLow, dv("db", "b")).otherwise(dv("da", "a")).as("kt"))
  }

  /** Triangle enumeration from a (checkpointed) oriented edge frame: the
    * wedge pass pairs out-edges of a shared low vertex, the closing pass
    * is one equi-join back onto the edge frame — each triangle exactly
    * once, emitted id-sorted as (s1 < s2 < s3). */
  private def triangles(e: DataFrame): DataFrame = {
    val wedges = e.as("e1").join(e.as("e2"),
        col("e1.vs") === col("e2.vs") && col("e1.kt") < col("e2.kt"))
      .select(col("e1.vs").as("v1"), col("e1.vt").as("v2"),
        col("e2.vt").as("v3"))
    wedges
      .join(e.select(col("vs").as("v2"), col("vt").as("v3")), Seq("v2", "v3"))
      .select(array_sort(array(col("v1"), col("v2"), col("v3"))).as("t"))
      .select(element_at(col("t"), 1).as("s1"),
        element_at(col("t"), 2).as("s2"),
        element_at(col("t"), 3).as("s3"))
  }

  val defs: Seq[QDef] = Seq(

    // Weighted PageRank over the customer-nation → supplier-nation trade
    // graph, 3 damped iterations (d = 0.85, uniform teleport 0.15/N).
    // The edge list is built with ONE pass over lineitem (two shuffled fact
    // joins + a broadcast supplier join) and collapses to ≤ N² aggregated
    // rows, after which every iteration is a nation-sized broadcast join +
    // partial-agg groupBy — at 100 TB the per-iteration cost is independent
    // of corpus size, which is exactly why PageRank-style propagation is
    // written over the AGGREGATED edge table, never the raw fact stream.
    // LEFT join vs the node table keeps rankless (dangling-dst) nations in
    // the vector with the teleport mass, identically in both engines.
    QDef(
      "graph_pagerank",
      (s, dir) => {
        val edges = T.customer(s, dir)
          .select(col("c_custkey"), col("c_nationkey").as("src"))
          .join(T.orders(s, dir).select(col("o_custkey"), col("o_orderkey")),
            col("c_custkey") === col("o_custkey"))
          .join(T.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey")),
            col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(T.supplier(s, dir)
              .select(col("s_suppkey"), col("s_nationkey").as("dst"))),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy("src", "dst").agg(count(lit(1)).as("w"))
          .localCheckpoint()
        val outw = edges.groupBy("src").agg(sum("w").as("outw"))
        val e = edges.join(outw, "src")
          .select(col("src"), col("dst"),
            (col("w").cast("double") / col("outw")).as("frac"))
        val nodes = T.nation(s, dir).select(col("n_nationkey").as("node"))
        var pr = nodes.withColumn("p", lit(0.04))
        for (_ <- 1 to 3) {
          val contrib = e.join(pr.withColumnRenamed("node", "src"), "src")
            .groupBy("dst").agg(sum(col("p") * col("frac")).as("c"))
          pr = nodes
            .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
            .select(col("node"),
              (lit(0.006) + lit(0.85) * coalesce(col("c"), lit(0.0))).as("p"))
            .localCheckpoint()
        }
        pr.select(col("node"), rnd(col("p"), 6).as("rank")).orderBy("node")
      },
      Some("""WITH edges AS (
             |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
             |  FROM customer c
             |  JOIN orders o ON o.o_custkey = c.c_custkey
             |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
             |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
             |  GROUP BY src, dst),
             |outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS outw
             |         FROM edges GROUP BY src),
             |e AS (SELECT src, dst, CAST(w AS DOUBLE) / outw AS frac
             |      FROM edges JOIN outw USING (src)),
             |nodes AS (SELECT n_nationkey AS node FROM nation),
             |pr0 AS (SELECT node, CAST(0.04 AS DOUBLE) AS p FROM nodes),
             |c1 AS (SELECT dst, sum(p * frac) AS c
             |       FROM e JOIN pr0 ON pr0.node = e.src GROUP BY dst),
             |pr1 AS (SELECT node, 0.006 + 0.85 * coalesce(c, 0.0) AS p
             |        FROM nodes LEFT JOIN c1 ON c1.dst = nodes.node),
             |c2 AS (SELECT dst, sum(p * frac) AS c
             |       FROM e JOIN pr1 ON pr1.node = e.src GROUP BY dst),
             |pr2 AS (SELECT node, 0.006 + 0.85 * coalesce(c, 0.0) AS p
             |        FROM nodes LEFT JOIN c2 ON c2.dst = nodes.node),
             |c3 AS (SELECT dst, sum(p * frac) AS c
             |       FROM e JOIN pr2 ON pr2.node = e.src GROUP BY dst),
             |pr3 AS (SELECT node, 0.006 + 0.85 * coalesce(c, 0.0) AS p
             |        FROM nodes LEFT JOIN c3 ON c3.dst = nodes.node)
             |SELECT node, floor((p) * 1e6 + 0.5) / 1e6 AS rank
             |FROM pr3 ORDER BY node""".stripMargin)),

    // Connected components over a GENERAL edge table (the relational
    // counterpart of dedup_cluster's LSH-pair clustering), ITERATED TO
    // FIXPOINT with alternating large-star/small-star contraction
    // [PK — Kiveris et al., "Connected Components in MapReduce and
    // Beyond"] over the bipartite customer–supplier graph of high-value
    // DOMESTIC trades (same-nation pairs — without the restriction, hub
    // suppliers weld everything into one component). Node ids interleave
    // the two sides (customer → 2k, supplier → 2k+1) so one label space
    // covers both. Why star-contraction and not min-label propagation:
    // propagation advances the minimum ONE EDGE HOP per round — diameter-
    // many rounds (measured 15 at sf0.1, and a pointer-jump step does not
    // compound because plateau labels do not form chains) — while the
    // alternating phases rewire edges toward component minima and
    // converge in O(log n) alternations (measured 6 on the same graph).
    // Each phase is one partial-agg min + one equi-join that REUSES the
    // groupBy's hash partitioning + a distinct on the shrunken edge set;
    // per-round cost O(edges) with the edge set contracting monotonically
    // toward one star per component. localCheckpoint truncates lineage
    // per round; the equality check (count compare, then set-difference
    // only when counts tie) reads checkpointed rounds — no recompute.
    // RAISES past the round budget. At fixpoint the star centers are the
    // true component minima, which the oracle expresses as a recursive
    // reachability CTE — no round count to keep in sync across engines.
    QDef(
      "graph_cc",
      (s, dir) => {
        val edges = T.orders(s, dir)
          .where(col("o_totalprice") > 400000.0)
          .select(col("o_orderkey"), col("o_custkey"))
          .join(T.customer(s, dir).select(col("c_custkey"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(T.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey")),
            col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(T.supplier(s, dir)
              .select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .select((col("o_custkey") * 2L).as("a"),
            (col("l_suppkey") * 2L + 1L).as("b"))
          .distinct()
          .localCheckpoint()
        // large-star: every neighbor ABOVE u rewires to u's minimum;
        // small-star: every neighbor at-or-below u (and u itself) does.
        // m(u) = min(N(u) ∪ {u}) comes from an unordered window over the
        // node key — ONE exchange per phase (the per-row m rides along;
        // no groupBy + join-back), and only the small phase pays a
        // distinct: duplicate edges between phases cannot change any
        // min and stay bounded by the undirected edge count.
        def star(e: DataFrame, large: Boolean): DataFrame = {
          val und = e.unionAll(e.select(col("b").as("a"), col("a").as("b")))
          val w = org.apache.spark.sql.expressions.Window.partitionBy("a")
          val withM = und.withColumn("m", least(col("a"), min("b").over(w)))
          val side = if (large) withM.where(col("b") > col("a"))
                     else withM.where(col("b") <= col("a"))
          val withSelf = if (large) side.select(col("m"), col("b"))
                         else side.select(col("m"), col("b"))
                           .unionAll(withM.select(col("m"), col("a").as("b")))
          val out = withSelf.where(col("b") =!= col("m"))
            .select(col("m").as("a"), col("b"))
          if (large) out else out.distinct()
        }
        var e = edges
        var n = e.count()
        var changed = 1L
        var rounds = 0
        while (changed > 0L && rounds < graft.GraftConfig.MaxCcRounds) {
          val next = star(star(e, large = true), large = false)
            .localCheckpoint()
          val nn = next.count()
          // set equality on distinct edge lists: equal counts + empty
          // one-sided difference ⇔ equal sets (difference only runs on tie)
          changed = if (nn != n) 1L else next.except(e).count()
          e = next; n = nn
          rounds += 1
        }
        require(changed == 0L,
          s"connected components did not reach fixpoint within ${graft.GraftConfig.MaxCcRounds} rounds")
        // fixpoint edge set = one star per component: center a = component
        // minimum, members = spokes ∪ the center itself
        e.unionAll(e.select(col("a"), col("a")).distinct())
          .groupBy(col("a").as("component"))
          .agg(count(lit(1)).as("n_nodes"), min("b").as("min_node"))
          .orderBy("component")
      },
      Some("""WITH RECURSIVE edges AS (
             |  SELECT DISTINCT o.o_custkey * 2 AS a, l.l_suppkey * 2 + 1 AS b
             |  FROM orders o
             |  JOIN customer c ON c.c_custkey = o.o_custkey
             |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
             |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
             |    AND s.s_nationkey = c.c_nationkey
             |  WHERE o.o_totalprice > 400000.0),
             |und AS (SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges),
             |nodes AS (SELECT DISTINCT a AS node FROM und),
             |reach(node, lbl) AS (
             |  SELECT node, node FROM nodes
             |  UNION
             |  SELECT e.b, r.lbl FROM reach r JOIN und e ON e.a = r.node),
             |fin AS (SELECT node, min(lbl) AS lbl FROM reach GROUP BY node)
             |SELECT lbl AS component, count(*) AS n_nodes,
             |  CAST(min(node) AS BIGINT) AS min_node
             |FROM fin GROUP BY lbl ORDER BY component""".stripMargin)),

    // Triangle enumeration over the part co-purchase graph — the third
    // iterative-free graph shape (components, propagation, and now motif
    // counting). Two scale levers, both standard:
    //   1. SUPPORT THRESHOLD: an edge is a part pair co-purchased in >= 2
    //      orders — the sparsification that keeps a co-occurrence graph
    //      from densifying as the corpus grows (pair instances are bounded
    //      per order by items², never corpus²).
    //   2. DEGREE-ORDERED ORIENTATION: each undirected edge points from its
    //      lower-(degree, id) endpoint, so every triangle is enumerated
    //      exactly once from its lowest vertex and per-vertex wedge work is
    //      bounded by out-degree² — the arboricity bound that keeps hub
    //      vertices from exploding the wedge join (id-only orientation
    //      leaves a high-degree hub with all its wedges; degree ordering
    //      splits them). The (degree, id) tuple rides along as a struct and
    //      orders lexicographically — no global rank window needed.
    // The wedge pass and the closing pass are plain equi-joins; the edge
    // frame is localCheckpoint'd once (it feeds three join sides). The
    // oracle enumerates naively in id order — same triangle set, since
    // orientation only affects WHERE each triangle is counted from.
    QDef(
      "graph_triangles",
      (s, dir) => {
        val e = orientedEdges(coEdges(s, dir)).localCheckpoint()
        triangles(e).orderBy("s1", "s2", "s3")
      },
      Some(s"""WITH $coSql
              |SELECT e1.a AS s1, e1.b AS s2, e2.b AS s3
              |FROM co e1
              |JOIN co e2 ON e2.a = e1.b
              |JOIN co e3 ON e3.a = e1.a AND e3.b = e2.b
              |ORDER BY 1, 2, 3""".stripMargin)),

    // k-core peeling — the dense-subgraph filter that completes the graph
    // family (components / propagation / motif / dense-subgraph): nodes of
    // degree < k are removed in ROUNDS until fixpoint, because removing a
    // node lowers its neighbors' degrees and can drag them under k too.
    // Output = every node of the k-core with its within-core degree.
    // Scale shape (see GraftConfig.KCoreK): each round is ONE partial-agg
    // degree count + TWO semi-joins on the current edge set — O(edges) per
    // round with the edge set shrinking monotonically — and the round
    // count is bounded by the graph's PEELING DEPTH, not its size (a
    // 100 TB co-occurrence graph peels in a handful of rounds; degeneracy
    // ordering is the sequential sibling, deliberately not used because it
    // serializes on one global order). Fixpoint detection is a pure edge
    // COUNT compare: a peel round only ever deletes rows, so an unchanged
    // count IS set equality — no except() needed (cheaper than graph_cc's
    // tie-break, which must handle rewritten rows). localCheckpoint per
    // round truncates the exponentially-inlining lineage; RAISES past the
    // round budget (an unconverged core is a correctness bug, not a
    // degraded answer). The oracle unrolls exactly KCoreMaxRounds rounds —
    // rounds past fixpoint are no-ops, so the engines agree whenever Spark
    // converges within budget.
    QDef(
      "graph_kcore",
      (s, dir) => {
        val k = graft.GraftConfig.KCoreK
        val maxRounds = graft.GraftConfig.KCoreMaxRounds
        val co = coEdges(s, dir)
        var und = co.unionAll(co.select(col("b").as("a"), col("a").as("b")))
          .localCheckpoint()
        var n = und.count()
        var changed = true
        var rounds = 0
        // Loop bound is maxRounds + 1, not maxRounds: count-compare fixpoint
        // detection needs one extra CONFIRMING no-op round after the last
        // deletion, so a graph whose peeling depth is exactly maxRounds
        // still converges inside the budget (the confirming round changes
        // nothing, so the oracle's maxRounds-round unroll agrees).
        while (changed && rounds < maxRounds + 1) {
          val keep = und.groupBy("a").agg(count(lit(1)).as("d"))
            .where(col("d") >= k).select("a")
          val next = und
            .join(keep, Seq("a"), "left_semi")
            .join(keep.select(col("a").as("b")), Seq("b"), "left_semi")
            .select(col("a"), col("b"))
            .localCheckpoint()
          val nn = next.count()
          changed = nn != n
          und = next; n = nn; rounds += 1
        }
        require(!changed,
          s"k-core peeling did not reach fixpoint within $maxRounds rounds")
        und.groupBy(col("a").as("node")).agg(count(lit(1)).as("degree"))
          .orderBy("node")
      },
      Some {
        val k = graft.GraftConfig.KCoreK
        val maxRounds = graft.GraftConfig.KCoreMaxRounds
        // MATERIALIZED is load-bearing: each round CTE is referenced three
        // times by the next (directly + twice through k_i), so DuckDB's
        // default CTE inlining would expand the unrolled chain 3^rounds-fold.
        val rounds = (1 to maxRounds).map { i =>
          s"""k$i AS MATERIALIZED (SELECT a FROM r${i - 1} GROUP BY a HAVING count(*) >= $k),
             |r$i AS MATERIALIZED (SELECT r.a, r.b FROM r${i - 1} r
             |  JOIN k$i x ON x.a = r.a JOIN k$i y ON y.a = r.b)""".stripMargin
        }.mkString(",\n")
        s"""WITH $coSql,
           |r0 AS MATERIALIZED (SELECT a, b FROM co UNION ALL SELECT b AS a, a AS b FROM co),
           |$rounds
           |SELECT a AS node, CAST(count(*) AS BIGINT) AS degree
           |FROM r$maxRounds GROUP BY a ORDER BY node""".stripMargin
      }),

    // Synchronous label propagation [PK — Raghavan et al. 2007, "Near
    // linear time algorithm to detect community structures"] over the
    // part co-purchase graph — the community-detection member of the
    // graph family (pagerank = importance, cc = reachability, triangles/
    // kcore = density, this = modularity structure). Determinized for
    // oracle parity: every node starts as its own label and each round
    // SIMULTANEOUSLY adopts its neighbors' most frequent label, ties to
    // the SMALLEST label (classic LPA breaks ties randomly and updates
    // asynchronously — both engine-divergent), for a FIXED LpRounds
    // rounds like graph_pagerank's damped iterations (LPA has no
    // fixpoint guarantee — bipartite-ish regions oscillate — so a round
    // budget IS the termination rule, identically on both engines).
    // Scale shape: one round = equi-join labels onto the edge list +
    // vote count groupBy + per-node argmax — all keyed on the node id,
    // O(edges) per round with partial aggregation on both groupBys; the
    // argmax is max(struct(count, -label)) — an AGGREGATE, not a window,
    // so votes combine map-side and nothing sorts. The edge list is
    // localCheckpoint'd once (three rounds would otherwise each replay
    // the co-purchase self-join) and each round's labels checkpoint to
    // truncate lineage, the family's established iteration idiom.
    QDef(
      "graph_label_prop",
      (s, dir) => {
        val co = coEdges(s, dir)
        val und = co.unionAll(co.select(col("b").as("a"), col("a").as("b")))
          .localCheckpoint()
        // Round 1 specialises algebraically: initial labels are the node ids
        // themselves, und's pairs are distinct (coEdges groupBy output), so
        // every neighbour vote has count 1 and the argmax tie-break
        // max(struct(c, -lab)) reduces to min neighbour id. One partial-agg
        // groupBy replaces the join + two groupBys AND the initial
        // distinct()+checkpoint that only existed to seed it. Rounds 2+ run
        // the general vote.
        var lab = und.groupBy(col("a"))
          .agg(min(col("b")).as("lab"))
          .select(col("a").as("node"), col("lab"))
          .localCheckpoint()
        for (_ <- 2 to graft.GraftConfig.LpRounds) {
          lab = und.join(lab, col("b") === col("node"))
            .groupBy(col("a"), col("lab"))
            .agg(count(lit(1)).as("c"))
            .groupBy(col("a"))
            .agg(max(struct(col("c").as("c"), (-col("lab")).as("nl"))).as("top"))
            .select(col("a").as("node"), (-col("top.nl")).as("lab"))
            .localCheckpoint()
        }
        lab.groupBy(col("lab").as("community"))
          .agg(count(lit(1)).as("n_nodes"),
            min("node").as("min_node"), max("node").as("max_node"))
          .orderBy("community")
      },
      Some {
        val rounds = (1 to graft.GraftConfig.LpRounds).map { i =>
          s"""v$i AS MATERIALIZED (
             |  SELECT und.a AS node, l.lab, count(*) AS c
             |  FROM und JOIN r${i - 1} l ON l.node = und.b GROUP BY 1, 2),
             |r$i AS MATERIALIZED (
             |  SELECT node, lab FROM (
             |    SELECT node, lab,
             |      row_number() OVER (PARTITION BY node ORDER BY c DESC, lab ASC) AS rn
             |    FROM v$i) WHERE rn = 1)""".stripMargin
        }.mkString(",\n")
        s"""WITH $coSql,
           |und AS MATERIALIZED (SELECT a, b FROM co UNION ALL SELECT b AS a, a AS b FROM co),
           |r0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS lab FROM und),
           |$rounds
           |SELECT lab AS community, count(*) AS n_nodes,
           |  min(node) AS min_node, max(node) AS max_node
           |FROM r${graft.GraftConfig.LpRounds} GROUP BY lab ORDER BY community""".stripMargin
      }),

    // Multi-source BFS with a bounded hop budget — the frontier-expansion
    // primitive the family's other members build past (cc converges
    // components, label_prop votes, kcore peels; none reports DISTANCE).
    // Per hop: frontier attaches to the checkpointed edge list with ONE
    // equi-join, dedupes with a partial-agg distinct, and drops
    // already-visited nodes with a LEFT ANTI join against ONE
    // incrementally accumulated visited frame (checkpointed per round —
    // not a per-round re-union of every level, which re-scanned and
    // re-shuffled O(rounds × V) across the run) — all linear in O(edges)
    // per round, no window, no collect, and the frontier SHRINKS as the
    // reachable set saturates (the sparse-doubling instinct from
    // dedup_suffix applied to graphs). Levels checkpoint per round (the
    // family's lineage discipline); the final rollup is one partial-agg
    // groupBy over the unioned level frames. At 100 TB: distance-bounded
    // expansion from a seed set is the "blast radius" query
    // (contaminated-document spread, abuse-ring neighborhoods) and each
    // hop is one shuffle of the CURRENT frontier only, never of the
    // visited set.
    QDef(
      "graph_bfs",
      (s, dir) => {
        val m = graft.GraftConfig.BfsSeedMod
        val co = coEdges(s, dir)
        val und = co.unionAll(co.select(col("b").as("a"), col("a").as("b")))
          .localCheckpoint()
        val seeds = und.select(col("a").as("node")).distinct()
          .where(col("node") % m === 0L)
          .withColumn("dist", lit(0L))
          .localCheckpoint()
        var levels = Vector(seeds)
        var frontier = seeds
        var visited = seeds.select("node").localCheckpoint()
        (1 to graft.GraftConfig.BfsRounds).foreach { r =>
          val next = und
            .join(frontier.select(col("node").as("b")), Seq("b"))
            .select(col("a").as("node")).distinct()
            .join(visited, Seq("node"), "left_anti")
            .withColumn("dist", lit(r.toLong))
            .localCheckpoint()
          levels = levels :+ next
          visited = visited.unionAll(next.select("node")).localCheckpoint()
          frontier = next
        }
        levels.reduce(_ unionAll _)
          .groupBy("dist")
          .agg(count(lit(1)).as("n_nodes"),
            sum("node").cast("long").as("sum_node"),
            min("node").as("min_node"), max("node").as("max_node"))
          .orderBy("dist")
      },
      Some {
        val m = graft.GraftConfig.BfsSeedMod
        val rounds = (1 to graft.GraftConfig.BfsRounds).map { i =>
          s"""f$i AS MATERIALIZED (
             |  SELECT DISTINCT und.a AS node, CAST($i AS BIGINT) AS dist
             |  FROM und JOIN f${i - 1} f ON und.b = f.node
             |  WHERE NOT EXISTS (SELECT 1 FROM v${i - 1} v WHERE v.node = und.a)),
             |v$i AS MATERIALIZED (
             |  SELECT node FROM v${i - 1} UNION ALL SELECT node FROM f$i)""".stripMargin
        }.mkString(",\n")
        val union = (0 to graft.GraftConfig.BfsRounds)
          .map(i => s"SELECT * FROM f$i").mkString(" UNION ALL ")
        s"""WITH $coSql,
           |und AS MATERIALIZED (SELECT a, b FROM co UNION ALL SELECT b AS a, a AS b FROM co),
           |f0 AS MATERIALIZED (
           |  SELECT DISTINCT a AS node, CAST(0 AS BIGINT) AS dist
           |  FROM und WHERE a % $m = 0),
           |v0 AS MATERIALIZED (SELECT node FROM f0),
           |$rounds
           |SELECT dist, count(*) AS n_nodes, CAST(sum(node) AS BIGINT) AS sum_node,
           |  min(node) AS min_node, max(node) AS max_node
           |FROM ($union) GROUP BY dist ORDER BY dist""".stripMargin
      }),

    // Neighborhood Jaccard over the co-purchase graph — the link-
    // prediction / entity-resolution score (|N(u)∩N(v)| / |N(u)∪N(v)|)
    // for every EDGE, ranked. One wedge join through the shared neighbor
    // builds common-neighbor counts (the triangle-counting shuffle, fanout
    // bounded by the support-threshold sparsification coEdges applies),
    // one partial-agg degree count, two broadcast-sized joins attach
    // degrees — no window until the final bounded top-k (total-ordered,
    // rank-pushdown LIMIT). The score ships as EXACT integer parts-per-
    // million (c·1e6 div union — BIGINT floor-division in both engines),
    // so cross-engine FP division can't flip a rank. At 100 TB: candidate
    // scoring for "similar entities" runs on the AGGREGATED pair table
    // (≤ edges of the sparsified graph), never on raw co-occurrence rows.
    QDef(
      "graph_jaccard",
      (s, dir) => {
        val co = coEdges(s, dir).localCheckpoint()
        val und = co.unionAll(co.select(col("b").as("a"), col("a").as("b")))
        val deg = und.groupBy("a").agg(count(lit(1)).as("d"))
        val common = und.select(col("a").as("u"), col("b").as("n"))
          .join(und.select(col("a").as("v"), col("b").as("n")), Seq("n"))
          .where(col("u") < col("v"))
          .groupBy("u", "v").agg(count(lit(1)).as("c"))
        co.select(col("a").as("u"), col("b").as("v"))
          .join(common, Seq("u", "v"))
          .join(deg.select(col("a").as("u"), col("d").as("du")), Seq("u"))
          .join(deg.select(col("a").as("v"), col("d").as("dv")), Seq("v"))
          .select(col("u"), col("v"), col("c"),
            (col("du") + col("dv") - col("c")).as("unn"),
            expr("(c * 1000000) div (du + dv - c)").as("jacc_ppm"))
          .orderBy(col("jacc_ppm").desc, col("u"), col("v"))
          .limit(20)
      },
      Some(s"""WITH $coSql,
             |und AS MATERIALIZED (SELECT a, b FROM co UNION ALL SELECT b AS a, a AS b FROM co),
             |deg AS MATERIALIZED (SELECT a, count(*) AS d FROM und GROUP BY 1),
             |common AS MATERIALIZED (
             |  SELECT x.a AS u, y.a AS v, count(*) AS c
             |  FROM und x JOIN und y ON x.b = y.b AND x.a < y.a
             |  GROUP BY 1, 2)
             |SELECT co.a AS u, co.b AS v, c.c AS c,
             |  d1.d + d2.d - c.c AS unn,
             |  (c.c * 1000000) // (d1.d + d2.d - c.c) AS jacc_ppm
             |FROM co
             |JOIN common c ON c.u = co.a AND c.v = co.b
             |JOIN deg d1 ON d1.a = co.a
             |JOIN deg d2 ON d2.a = co.b
             |ORDER BY jacc_ppm DESC, u, v LIMIT 20""".stripMargin)),

    // Local clustering-coefficient distribution — how CLIQUISH each node's
    // neighborhood is (cc(v) = 2·t(v) / d(v)(d(v)−1)), the community-
    // density signal that separates organic neighborhoods from spam rings
    // and near-duplicate clusters in a curation graph. Triangles come from
    // the SHARED degree-ordered enumeration (`orientedEdges`/`triangles` —
    // the graph_triangles shuffle): each triangle exactly once from its
    // lowest-(degree, id) vertex, so a high-degree hub's wedges split
    // across tasks instead of concentrating in one join group (id-only
    // orientation would leave a small-id hub with ALL its wedges — the
    // exact hazard the oriented frame exists to solve). One union credits
    // each member node from the already-sorted (s1, s2, s3) triple, a
    // partial-agg count + left join onto the degree table scores every
    // node with d ≥ 2 (zero-triangle nodes INCLUDED at cc = 0 — dropping
    // them would misreport the distribution), and the output is the
    // integer-exact ppm decile histogram: cc as (2e6·t) div (d(d−1)),
    // bucketed by div 1e5 — BIGINT floor-division in both engines, no FP
    // anywhere. At 100 TB the triangle fanout is bounded by the same
    // support-threshold sparsification as the rest of the family, and the
    // histogram is a partial-agg rollup over the node-scored table, never
    // the raw pair stream. Oracle unchanged: orientation only affects
    // WHERE a triangle is counted from, not the triangle set.
    QDef(
      "graph_cluster_coeff",
      (s, dir) => {
        val co = coEdges(s, dir).localCheckpoint()
        val und = co.unionAll(co.select(col("b").as("a"), col("a").as("b")))
        val deg = und.groupBy(col("a").as("node")).agg(count(lit(1)).as("d"))
        val tri = triangles(orientedEdges(co).localCheckpoint())
        val triPerNode = tri.select(col("s1").as("node"))
          .unionAll(tri.select(col("s2").as("node")))
          .unionAll(tri.select(col("s3").as("node")))
          .groupBy("node").agg(count(lit(1)).as("t"))
        deg.where(col("d") >= 2L)
          .join(triPerNode, Seq("node"), "left")
          .select(col("node"), col("d"), coalesce(col("t"), lit(0L)).as("t"))
          .withColumn("cc_ppm", expr("(2000000 * t) div (d * (d - 1))"))
          .withColumn("bucket", expr("cc_ppm div 100000"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_nodes"),
            sum("t").cast("long").as("sum_tri"),
            min("node").as("min_node"), max("node").as("max_node"))
          .orderBy("bucket")
      },
      Some(s"""WITH $coSql,
             |und AS MATERIALIZED (SELECT a, b FROM co UNION ALL SELECT b AS a, a AS b FROM co),
             |deg AS MATERIALIZED (SELECT a AS node, count(*) AS d FROM und GROUP BY 1),
             |tri AS MATERIALIZED (
             |  SELECT e1.a AS u, e1.b AS v, e2.b AS w
             |  FROM co e1 JOIN co e2 ON e1.b = e2.a
             |  JOIN co e3 ON e3.a = e1.a AND e3.b = e2.b),
             |tpn AS MATERIALIZED (
             |  SELECT node, count(*) AS t FROM (
             |    SELECT u AS node FROM tri
             |    UNION ALL SELECT v FROM tri
             |    UNION ALL SELECT w FROM tri)
             |  GROUP BY 1),
             |cc AS (
             |  SELECT deg.node, coalesce(tpn.t, 0) AS t,
             |    (2000000 * coalesce(tpn.t, 0)) // (deg.d * (deg.d - 1)) AS cc_ppm
             |  FROM deg LEFT JOIN tpn ON tpn.node = deg.node
             |  WHERE deg.d >= 2)
             |SELECT cc_ppm // 100000 AS bucket, count(*) AS n_nodes,
             |  CAST(sum(t) AS BIGINT) AS sum_tri,
             |  min(node) AS min_node, max(node) AS max_node
             |FROM cc GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
