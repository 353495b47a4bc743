package graft

import org.apache.spark.sql.functions._
import graft.queries.Graph

/** Properties for the web-graph operators (queries/Graph.scala). */
class GraphSpec extends SparkSpec {

  private def edgesOf(pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    pairs.toDF("src", "dst")
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
}
