package graft

import org.apache.spark.sql.functions._
import graft.queries.Graph

/** Properties for the web-graph operators (queries/Graph.scala). */
class GraphSpec extends SparkSpec {

  private def edgesOf(pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }

  // ----------------------------------------------------------- hyperball

  test("hyperBall: directed path closed form — exact in the sketch's coupon range") {
    // 0→1→2→3: out-ball of 0 grows 1,2,3,4; harmonic(0) = 1 + 1/2 + 1/3
    val path = edgesOf(Seq((0L, 1L), (1L, 2L), (2L, 3L)))
    val m = Graph.hyperBall(path, maxRounds = 5).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(m(0L) == ((4L, 1.0 + 0.5 + 1.0 / 3)), s"node 0: ${m(0L)}")
    assert(m(1L) == ((3L, 1.0 + 0.5)), s"node 1: ${m(1L)}")
    assert(m(2L) == ((2L, 1.0)), s"node 2: ${m(2L)}")
    assert(m(3L) == ((1L, 0.0)), s"sink has an empty out-ball: ${m(3L)}")
  }

  test("hyperBall: star + reversed edges = the in-harmonic the driver key computes") {
    // leaves 1..10 → center 0; REVERSED edges make ball(0) = everyone
    // who can reach 0, all at distance 1 → in-harmonic(0) = 10
    val star = edgesOf((1L to 10L).map(l => (l, 0L)))
    val rev = star.select(col("dst").as("src"), col("src").as("dst"))
    val m = Graph.hyperBall(rev, maxRounds = 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(m(0L) == ((11L, 10.0)), s"center: ${m(0L)}")
    (1L to 10L).foreach(l => assert(m(l) == ((1L, 0.0)), s"leaf $l: ${m(l)}"))
  }

  test("graph_harmonic_hyperball: deterministic, bounded, ball-monotone on the driver graph") {
    val a = SparkEntry.queries("graph_harmonic_hyperball")(spark, sfDir).collect()
    val b = SparkEntry.queries("graph_harmonic_hyperball")(spark, sfDir).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq,
      "HLL register-max merges must make the run deterministic")
    val nNodes = a.length
    a.foreach { r =>
      val ball = r.getLong(1)
      assert(ball >= 1L, s"every node reaches itself: $r")
      // HLL-mode estimates carry a few % error at lgK=10 — allow slack
      assert(ball <= math.ceil(nNodes * 1.1).toLong, s"ball exceeds graph: $r")
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= nNodes.toDouble, s"harmonic range: $r")
    }
  }

  // ---------------------------------------------------------------- hits

  test("graph_hits: star closed form — center is the only authority, leaves split hub mass") {
    val star = edgesOf((1L to 9L).map(l => (l, 0L)))
    val m = Graph.hits(star, iterations = 6).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(math.abs(m(0L)._2 - 1.0) < 1e-12, s"center auth: ${m(0L)}")
    assert(math.abs(m(0L)._1) < 1e-12, "center has no out-edges -> hub 0")
    (1L to 9L).foreach { l =>
      assert(math.abs(m(l)._1 - 1.0 / 9) < 1e-12, s"leaf hub: ${m(l)}")
      assert(math.abs(m(l)._2) < 1e-12, "leaves receive nothing")
    }
  }

  test("graph_hits matches a dense in-memory replay on the sf0.001 graph") {
    // the operator must equal the textbook power iteration run on the
    // COLLECTED edge list (test-only collect; sf0.001 is a few hundred
    // edges) — same L1 half-step normalization, same iteration count
    val eRows = SparkEntry.queries("graph_hits")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val edges = Tables.t(spark, sfDir, "lineitem")
      .selectExpr("l_orderkey % 500 AS src", "l_partkey % 500 AS dst")
      .filter(col("src") =!= col("dst")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    var hub = nodes.map(_ -> 1.0 / nodes.length).toMap
    var auth = Map.empty[Long, Double]
    for (_ <- 1 to 8) {
      val a0 = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map(e => hub(e._1)).sum }
      val aS = a0.values.sum
      auth = nodes.map(v => v -> (a0.getOrElse(v, 0.0) / aS)).toMap
      val h0 = edges.groupBy(_._1).map { case (u, es) =>
        u -> es.map(e => auth(e._2)).sum }
      val hS = h0.values.sum
      hub = nodes.map(v => v -> (h0.getOrElse(v, 0.0) / hS)).toMap
    }
    assert(eRows.keySet == nodes.toSet)
    nodes.foreach { v =>
      assert(math.abs(eRows(v)._1 - hub(v) * 1000) < 1e-3,
        s"hub($v): ${eRows(v)._1} vs ${hub(v) * 1000}")
      assert(math.abs(eRows(v)._2 - auth(v) * 1000) < 1e-3,
        s"auth($v): ${eRows(v)._2} vs ${auth(v) * 1000}")
    }
  }

  test("graph_hits driver key: stable across runs within float tolerance") {
    def m(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val a = m(SparkEntry.queries("graph_hits")(spark, sfDir).collect())
    val b = m(SparkEntry.queries("graph_hits")(spark, sfDir).collect())
    assert(a.keySet == b.keySet)
    a.foreach { case (k, (h1, a1)) =>
      assert(math.abs(h1 - b(k)._1) < 1e-4 && math.abs(a1 - b(k)._2) < 1e-4,
        s"node $k drifted: ${(h1, a1)} vs ${b(k)}")
    }
  }

  // ---------------------------------------------------------------- pagerank

  test("graph_pagerank: directed cycle is a fixpoint at uniform rank") {
    val n = 8
    val cycle = edgesOf((0 until n).map(i => (i.toLong, ((i + 1) % n).toLong)))
    val ranks = Graph.pageRank(cycle, iterations = 5).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ranks.size == n)
    ranks.values.foreach(v => assert(math.abs(v - 1.0 / n) < 1e-12,
      s"cycle rank drifted from uniform: $v"))
  }

  test("graph_pagerank: star center dominates and mass is conserved") {
    // 9 leaves all pointing at the center (node 0); center dangles
    val star = edgesOf((1L to 9L).map(l => (l, 0L)))
    val ranks = Graph.pageRank(star, iterations = 20).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val center = ranks(0L)
    val leaves = (1L to 9L).map(ranks)
    assert(leaves.forall(center > _), "center must out-rank every leaf")
    assert(leaves.distinct.size == 1, "leaves are symmetric")
    assert(math.abs(ranks.values.sum - 1.0) < 1e-9,
      s"rank mass not conserved: ${ranks.values.sum}")
  }

  test("graph_pagerank driver key: deterministic row set at sf0.001") {
    // exact equality on the NODE set only: partial-aggregation merge
    // order for double sums is not deterministic across executions, so a
    // rank landing near a rounding boundary can flip its last kept digit
    // — compare ranks with a tolerance instead of bit-for-bit
    def byNode(rows: Array[org.apache.spark.sql.Row]) = {
      val m = rows.map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(m.size == rows.length, "duplicate node rows") // toMap must not mask dupes
      m
    }
    val a = byNode(SparkEntry.queries("graph_pagerank")(spark, sfDir).collect())
    val b = byNode(SparkEntry.queries("graph_pagerank")(spark, sfDir).collect())
    assert(a.nonEmpty && a.keySet == b.keySet)
    a.foreach { case (n, v) =>
      assert(math.abs(v - b(n)) < 1e-5, s"node $n: $v vs ${b(n)}")
    }
  }

  // --------------------------------------------------------------- triangles

  private def undirected(pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    pairs.toDF("a", "b")
  }

  test("graph_triangle_count: closed forms on known graphs") {
    // K4: C(4,3) = 4 triangles
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    assert(Graph.triangleCount(undirected(k4)).head().getLong(0) == 4L)
    // square + one diagonal: exactly 2 triangles
    val sq = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L), (0L, 2L))
    assert(Graph.triangleCount(undirected(sq)).head().getLong(0) == 2L)
    // path: none
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L))
    assert(Graph.triangleCount(undirected(path)).head().getLong(0) == 0L)
  }

  test("graph_triangle_count: degree-ordered orientation matches id-ordered count") {
    // the driver oracle orients by id; the implementation orients by
    // (degree, id) — both must count the same triangles on a skewed graph
    // (hub node 0 connected to everything, plus a sparse ring)
    val hub = (1L to 12L).map(i => (0L, i))
    val ring = (1L to 11L).map(i => (i, i + 1))
    val und = undirected(hub ++ ring)
    val got = Graph.triangleCount(und).head().getLong(0)
    // each ring edge (i, i+1) forms one triangle with the hub: 11 total
    assert(got == 11L)
  }

  // --------------------------------------------------------------- knn graph

  test("emb_knn_graph: planted identical twin is every vector's top neighbor") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val dim = 16
    val rnd = new scala.util.Random(7L)
    val base = (0L until 40L).map(i => (i, Seq.fill(dim)(rnd.nextGaussian())))
    // twins: same vector, id + 1000 — they share every LSH bucket
    val twins = base.map { case (i, v) => (i + 1000L, v) }
    val e = (base ++ twins).toDF("vec_id", "ed")
    val knn = Graph.knnGraph(e, k = 3, nTables = 4, nPlanes = 6, dim = dim)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val top = knn.filter(_._4 == 1).map(t => t._1 -> (t._2, t._3)).toMap
    base.foreach { case (i, _) =>
      val (nb, cos) = top(i)
      assert(nb == i + 1000L && cos > 0.999999,
        s"vec $i: expected twin ${i + 1000}, got $nb @ $cos")
      val (nbT, cosT) = top(i + 1000L)
      assert(nbT == i && cosT > 0.999999)
    }
  }

  test("emb_knn_graph: k caps the per-source fan-out") {
    val rows = SparkEntry.queries("emb_knn_graph")(spark, sfDir)
    val maxPer = rows.groupBy("src").count().agg(max("count")).head().getLong(0)
    assert(maxPer <= 5L)
    assert(rows.filter(col("src") === col("nb")).isEmpty, "no self-edges")
  }

  test("bfsHops: golden distances on a branched path; horizon and anti-join respected") {
    import spark.implicits._
    // 1→2→3→4→5 with shortcut 1→3 and an unreachable island 8→9
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 3L), (8L, 9L))
      .toDF("src", "dst")
    val got = graft.queries.Graph.bfsHops(e, Seq(1L).toDF("node"), maxHops = 6)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // the shortcut must win (3 at dist 1, not 2) and the island stays out
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> 3), s"got $got")
    // horizon: maxHops=2 truncates the frontier, settled dists unchanged
    val capped = graft.queries.Graph.bfsHops(e, Seq(1L).toDF("node"), maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(capped == Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2), s"got $capped")
  }

  // ------------------------------------------------------------------- scc

  private def sccMap(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.scc(edgesOf(pairs)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("scc: two cycles over a one-way bridge, a DAG tail, and a self-loop") {
    // cycle {0,1,2} → bridge 2→10 → cycle {10,11,12} → tail 12→20; 30⟲
    val got = sccMap(Seq((0L, 1L), (1L, 2L), (2L, 0L),
      (2L, 10L), (10L, 11L), (11L, 12L), (12L, 10L), (12L, 20L), (30L, 30L)))
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 30L -> 30L), s"got $got")
  }

  test("scc: a pure DAG is all singletons (the trim path, no coloring)") {
    val got = sccMap(Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L)))
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L), s"got $got")
  }

  test("scc: one big directed cycle is one component under min id") {
    val n = 12L
    val got = sccMap((0L until n).map(i => (i, (i + 1) % n)))
    assert(got == (0L until n).map(_ -> 0L).toMap, s"got $got")
  }

  /** independent reference replay: iterative Kosaraju (explicit stacks —
    * no recursion-depth dependence) over collected edges */
  private def kosaraju(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val fwd = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct }
    val rev = edges.groupBy(_._2).map { case (k, v) => k -> v.map(_._1).distinct }
    val visited = scala.collection.mutable.Set.empty[Long]
    val order = scala.collection.mutable.ArrayBuffer.empty[Long]
    for (s <- nodes if !visited.contains(s)) {
      // explicit-stack DFS emitting finish order
      val stack = scala.collection.mutable.Stack[(Long, Int)]((s, 0))
      visited += s
      while (stack.nonEmpty) {
        val (v, i) = stack.pop()
        val nbrs = fwd.getOrElse(v, Seq.empty)
        if (i < nbrs.size) {
          stack.push((v, i + 1))
          val w = nbrs(i)
          if (!visited.contains(w)) { visited += w; stack.push((w, 0)) }
        } else order += v
      }
    }
    val assigned = scala.collection.mutable.Map.empty[Long, Long]
    for (s <- order.reverse if !assigned.contains(s)) {
      val members = scala.collection.mutable.ArrayBuffer.empty[Long]
      val stack = scala.collection.mutable.Stack[Long](s)
      assigned(s) = s
      while (stack.nonEmpty) {
        val v = stack.pop(); members += v
        for (w <- rev.getOrElse(v, Seq.empty) if !assigned.contains(w)) {
          assigned(w) = s; stack.push(w)
        }
      }
      val mn = members.min
      members.foreach(m => assigned(m) = mn)
    }
    assigned.toMap
  }

  test("graph_scc matches an independent Kosaraju replay on the sf0.001 graph") {
    val got = SparkEntry.queries("graph_scc")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = graft.Tables.t(spark, sfDir, "lineitem")
      .select((col("l_orderkey") % 500).as("src"), (col("l_partkey") % 500).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = kosaraju(edges)
    assert(got == want,
      s"diff: ${(got.toSet diff want.toSet).take(5)} / ${(want.toSet diff got.toSet).take(5)}")
  }

  // --------------------------------------------------------------- bow-tie

  test("bowTie: every Broder segment on a planted fixture") {
    // core {5,6}; IN chain 2→1→5; OUT 6→8→9; tube 1→3→8; tendril-from-IN
    // 1→4; tendril-into-OUT 7→8; reverse hanger 13→4 (OTHER_WCC);
    // disconnected pair 100→101. {5,6} wins the largest-SCC tie (no
    // other SCC has 2 members).
    val e = edgesOf(Seq((5L, 6L), (6L, 5L), (2L, 1L), (1L, 5L),
      (6L, 8L), (8L, 9L), (1L, 3L), (3L, 8L), (1L, 4L), (7L, 8L),
      (13L, 4L), (100L, 101L)))
    val got = Graph.bowTie(e, Graph.scc(e)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = Map(5L -> "CORE", 6L -> "CORE", 1L -> "IN", 2L -> "IN",
      8L -> "OUT", 9L -> "OUT", 3L -> "TUBE", 4L -> "TENDRIL",
      7L -> "TENDRIL", 13L -> "OTHER_WCC",
      100L -> "DISCONNECTED", 101L -> "DISCONNECTED")
    assert(got == want, s"got $got")
  }

  test("bowTie: largest-SCC tie breaks to the smallest scc id") {
    // two 2-cycles {3,4} and {1,2}, weakly joined; {1,2} must be CORE
    val e = edgesOf(Seq((3L, 4L), (4L, 3L), (1L, 2L), (2L, 1L), (2L, 3L)))
    val got = Graph.bowTie(e, Graph.scc(e)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "CORE", 2L -> "CORE", 3L -> "OUT", 4L -> "OUT"),
      s"got $got")
  }

  test("graph_scc / graph_bowtie driver keys: deterministic and consistent") {
    val a = SparkEntry.queries("graph_scc")(spark, sfDir).collect().toSeq
    val b = SparkEntry.queries("graph_scc")(spark, sfDir).collect().toSeq
    assert(a == b, "scc not deterministic across runs")
    val bt = SparkEntry.queries("graph_bowtie")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val scc = a.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the bow-tie covers exactly the scc node set, and CORE is exactly
    // the largest component (ties to smallest id)
    assert(bt.keySet == scc.keySet)
    val bySize = scc.groupBy(_._2).map { case (id, m) => (id, m.size) }
    val coreId = bySize.toSeq.maxBy { case (id, n) => (n, -id) }._1
    assert(bt.filter(_._2 == "CORE").keySet == scc.filter(_._2 == coreId).keySet)
  }

  // ------------------------------------------------- personalized pagerank

  test("personalizedPageRank: exact scalar replay on a cycle; unreachable stays at 0") {
    import spark.implicits._
    // 0⇄1 with seed {0}; 7→8 is unreachable from the seed, so both must
    // hold rank EXACTLY 0 (the sharp property global pagerank lacks)
    val e = edgesOf(Seq((0L, 1L), (1L, 0L), (7L, 8L)))
    val got = Graph.personalizedPageRank(e, Seq(0L).toDF("node"), iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // scalar replay mirroring the plan's arithmetic shapes exactly
    val d = 0.85
    var (r0, r1, r7) = (1.0, 0.0, 0.0)
    (1 to 10).foreach { _ =>
      val dm = 1.0 - (r0 + r1 + r7) // out-edged nodes: 0, 1, 7
      val n0 = (1 - d) * 1.0 + d * (r1 + dm * 1.0)
      val n1 = (1 - d) * 0.0 + d * (r0 + dm * 0.0)
      r0 = n0; r1 = n1; r7 = 0.0
    }
    assert(got(0L) == r0 && got(1L) == r1, s"got $got want ($r0, $r1)")
    assert(got(7L) == 0.0 && got(8L) == 0.0, s"unreachable must be exactly 0: $got")
  }

  test("personalizedPageRank: seeds missing from the graph are ignored, mass conserved") {
    import spark.implicits._
    val e = edgesOf(Seq((0L, 1L), (1L, 0L)))
    // phantom seed 99 must not leak teleport mass out of the graph
    val got = Graph.personalizedPageRank(e, Seq(0L, 99L).toDF("node"), iterations = 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got.values.sum - 1.0) < 1e-12, s"mass leaked: ${got.values.sum}")
    assert(got(0L) > got(1L), "seed must out-rank the non-seed on a symmetric cycle")
  }

  test("graph_ppr driver key: deterministic, conserves permille mass, non-negative") {
    val a = SparkEntry.queries("graph_ppr")(spark, sfDir).collect().toSeq
    val b = SparkEntry.queries("graph_ppr")(spark, sfDir).collect().toSeq
    assert(a == b, "ppr not deterministic across runs")
    val vals = a.map(_.getDouble(1))
    assert(vals.forall(_ >= 0.0))
    assert(math.abs(vals.sum - 1000.0) < 0.01, s"permille mass ${vals.sum}")
  }

  // --------------------------------------------------------------- k-core

  private def corenessMap(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.coreness(edgesOf(pairs)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** independent sequential peel (Batagelj & Zaversnik 2003): repeatedly
    * remove a minimum-degree node; coreness(v) = the running max of the
    * minimum degree at v's removal. */
  private def sequentialCoreness(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = scala.collection.mutable.Map[Long, scala.collection.mutable.Set[Long]]()
    pairs.foreach { case (a, b) =>
      if (a != b) {
        adj.getOrElseUpdate(a, scala.collection.mutable.Set[Long]()) += b
        adj.getOrElseUpdate(b, scala.collection.mutable.Set[Long]()) += a
      }
    }
    val core = scala.collection.mutable.Map[Long, Long]()
    var k = 0L
    while (adj.nonEmpty) {
      val (v, nb) = adj.minBy { case (n, s) => (s.size, n) }
      k = math.max(k, nb.size.toLong)
      core(v) = k
      nb.foreach(u => adj(u) -= v)
      adj.remove(v)
    }
    core.toMap
  }

  test("coreness: clique, path, cycle closed forms") {
    // K5: every node survives to the 4-core
    val k5 = for (i <- 0L until 5L; j <- (i + 1) until 5L) yield (i, j)
    assert(corenessMap(k5) == (0L until 5L).map(_ -> 4L).toMap)
    // a path is all 1s (endpoints peel, the 1-boundary propagates inward)
    val path = (0L until 9L).map(i => (i, i + 1))
    assert(corenessMap(path) == (0L to 9L).map(_ -> 1L).toMap)
    // a cycle is all 2s
    val cycle = (0L until 8L).map(i => (i, (i + 1) % 8))
    assert(corenessMap(cycle) == (0L until 8L).map(_ -> 2L).toMap)
  }

  test("coreness: mixed-ladder fixture — K4, a bridge path, a triangle, a pendant") {
    // K4 {0..3} (core 3) — bridge 3-4-5 (node 4 core 2: both its
    // neighbors survive the 2-core, so it does too, despite lying on no
    // cycle) — triangle {5,6,7} (core 2) — pendant 8 off 4 (core 1):
    // three rungs of the density ladder plus the degree-1 fringe
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
      (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L), (7L, 5L), (4L, 8L))
    val want = Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L,
      4L -> 2L, 5L -> 2L, 6L -> 2L, 7L -> 2L, 8L -> 1L)
    val got = corenessMap(e)
    assert(got == want, s"got $got")
    assert(got == sequentialCoreness(e))
  }

  test("graph_kcore matches an independent sequential peel on the sf0.001 graph") {
    val got = SparkEntry.queries("graph_kcore")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = graft.Tables.t(spark, sfDir, "lineitem")
      .select((col("l_orderkey") % 500).as("src"), (col("l_partkey") % 500).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = sequentialCoreness(edges)
    assert(got == want,
      s"diff: ${(got.toSet diff want.toSet).take(5)} / ${(want.toSet diff got.toSet).take(5)}")
  }
}
