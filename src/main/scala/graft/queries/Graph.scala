package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Web-graph analytics over the capture link graph (SURVEY §2.10
  * extension surface — the WAT link edges `Pipeline.watLinks` emits are
  * exactly this shape; the driver keys derive a deterministic stand-in
  * edge list from `lineitem` so DuckDB can replay it).
  *
  * Scale notes (100 TB / multi-billion-edge web graph):
  *  - `graph_degree` is two map-side-combinable hash aggs + one join on
  *    the node key, all pre-aggregated to |nodes| rows — the corpus-sized
  *    edge list is touched once per side.
  *  - `graph_pagerank` keeps EVERYTHING distributed: rank is a node-keyed
  *    relation, each round is one edges⋈ranks shuffle + one hash agg, the
  *    dangling-mass scalar rides as a broadcast 1-row aggregate inside the
  *    plan (never a driver collect), and the rank relation
  *    localCheckpoints per round so lineage stays O(1) — the same
  *    iteration hygiene as `ops.Dedup.resolveClusters` / `ops.KMeans`.
  *  - `graph_triangle_count` orients each undirected edge from its
  *    lower-(degree, id) endpoint to the higher one before the wedge
  *    join — the standard hub-skew cap: a node of degree d contributes
  *    wedges only through its HIGHER-ranked neighbors, so a celebrity
  *    host with 10^7 in-links no longer fans out 10^14 wedge rows. Any
  *    acyclic orientation counts each triangle exactly once, which is
  *    why the DuckDB oracle may orient by plain id order and still agree
  *    on the count.
  *  - `emb_knn_graph` (the similarity-graph input to graph-based dedup /
  *    clustering) generates candidates from multi-table hyperplane-LSH
  *    buckets — an equi-join on (table, bucket), never an all-pairs cross
  *    join; candidate ids dedupe BEFORE vectors are fetched, and the
  *    top-k cut is a src-partitioned window (no single-partition
  *    WindowExec).
  */
object Graph extends QueryModule {

  /** deterministic link-graph stand-in: 500 nodes, edge per distinct
    * (l_orderkey, l_partkey) residue pair — sparse at sf0.001 (~2% fill),
    * dense-but-incomplete at sf0.1 (~91%), never degenerate. */
  private val NMod = 500

  private def edges(s: SparkSession, d: String): DataFrame =
    Tables.t(s, d, "lineitem")
      .select((col("l_orderkey") % NMod).as("src"), (col("l_partkey") % NMod).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()

  private val edgesDuck =
    s"(SELECT DISTINCT l_orderkey % $NMod AS src, l_partkey % $NMod AS dst " +
      s"FROM lineitem WHERE l_orderkey % $NMod <> l_partkey % $NMod)"

  /** canonical undirected edge list (a < b, guaranteed by src != dst) */
  private def undirected(e: DataFrame): DataFrame =
    e.select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .distinct()

  /** PageRank over an arbitrary edge relation — damping 0.85, dangling
    * mass redistributed uniformly, every step a DataFrame op (the driver
    * never holds node-sized data; the only scalar collected is |nodes|).
    */
  def pageRank(e: DataFrame, iterations: Int = 10, damping: Double = 0.85): DataFrame = {
    val ec = e.select(col("src"), col("dst")).localCheckpoint()
    val nodes = ec.select(col("src").as("node"))
      .unionByName(ec.select(col("dst").as("node"))).distinct().localCheckpoint()
    val n = nodes.count()
    // out-degree is static across rounds — materialize it once instead of
    // re-aggregating the edge list every iteration
    val outDeg = ec.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("odeg")).localCheckpoint()
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (i <- 1 to iterations) {
      // nodes WITH out-edges, carrying their rank — feeds both the
      // contribution join and the dangling-mass aggregate below
      val withOdeg = ranks.join(outDeg, "node")
      val contribs = ec
        .join(withOdeg.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("odeg")).as("cs"))
      // dangling mass = 1 − Σ rank(nodes with out-edges): a 1-row
      // aggregate over the node-sized join — no anti-join, no edge pass,
      // and it stays IN the plan as a broadcast (never a driver collect)
      val dangling = withOdeg.agg((lit(1.0) - sum("rank")).as("dmass"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .withColumn("rank",
          lit((1 - damping) / n) +
            lit(damping) * (coalesce(col("cs"), lit(0.0)) + col("dmass") / n))
        .select("node", "rank")
      // lineage cap (resolveClusters precedent) — every SECOND round:
      // a 2-round plan is still O(1) depth, and halving the eager
      // materialization jobs is most of an iteration's fixed cost at
      // small scale (each checkpoint is one job + one node-sized write)
      if (i % 2 == 0 || i == iterations) ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** Personalized PageRank — random walk with restart to a SEED set
    * (the teleport-vector generalization in Page et al. 1999; Jeh &
    * Widom 2003 formalize it as Personalized PageRank): rank measures
    * proximity to the seeds, THE seed-expansion primitive of focused
    * crawling and TrustRank-style source curation ("how close is this
    * host to my trusted seeds"), where global pageRank measures
    * popularity from everywhere. Same per-round scale shape as
    * [[pageRank]] — one edges⋈ranks shuffle + hash agg, dangling mass
    * as an in-plan broadcast 1-row aggregate, localCheckpoint lineage
    * hygiene — with the uniform restart column replaced by the
    * seed-indicator teleport tp (1/|seeds| on seeds, 0 elsewhere):
    * rank = (1−d)·tp + d·(in-mass + dangling·tp). Dangling mass
    * restarts AT THE SEEDS (the walk teleports home, not uniformly), so
    * Σrank = 1 holds every round and nodes unreachable from the seeds
    * stay at EXACTLY 0 — an integer-sharp property the spec pins.
    * Seeds absent from the graph are ignored (their teleport share
    * would leak mass to phantom nodes). */
  def personalizedPageRank(
      e: DataFrame, seeds: DataFrame,
      iterations: Int = 10, damping: Double = 0.85): DataFrame = {
    val ec = e.select(col("src"), col("dst")).localCheckpoint()
    val nodes = ec.select(col("src").as("node"))
      .unionByName(ec.select(col("dst").as("node"))).distinct().localCheckpoint()
    val present = nodes.join(seeds.select("node").distinct(), "node")
    val ns = present.count()
    require(ns > 0, "personalizedPageRank needs at least one seed present in the graph")
    val tp = nodes
      .join(present.withColumn("tp", lit(1.0 / ns)), Seq("node"), "left")
      .na.fill(0.0, Seq("tp")).localCheckpoint()
    val outDeg = ec.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("odeg")).localCheckpoint()
    var ranks = tp.select(col("node"), col("tp").as("rank"))
    for (i <- 1 to iterations) {
      val withOdeg = ranks.join(outDeg, "node")
      val contribs = ec
        .join(withOdeg.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("odeg")).as("cs"))
      val dangling = withOdeg.agg((lit(1.0) - sum("rank")).as("dmass"))
      ranks = tp
        .join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .withColumn("rank",
          lit(1 - damping) * col("tp") +
            lit(damping) * (coalesce(col("cs"), lit(0.0)) + col("dmass") * col("tp")))
        .select("node", "rank")
      if (i % 2 == 0 || i == iterations) ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** HITS hubs & authorities (Kleinberg 1999) over an arbitrary edge
    * relation — pageRank's query-independent sibling for link-quality
    * scoring: auth ← Σ hub(in-neighbors), hub ← Σ auth(out-neighbors),
    * each L1-normalized per half-step (the NetworkX convention; the
    * fixpoint direction is identical to L2 up to scale). Same iteration
    * discipline as [[pageRank]]: score relations stay node-keyed and
    * distributed, every half-step is one edges⋈scores shuffle + a hash
    * agg, the normalizer rides as an in-plan broadcast 1-row aggregate
    * (never a driver collect), localCheckpoint every 2nd round caps
    * lineage. Requires a non-empty edge relation (normalizers are
    * guaranteed positive: every round some node holds mass).
    */
  def hits(e: DataFrame, iterations: Int = 10): DataFrame = {
    val ec = e.select(col("src"), col("dst")).localCheckpoint()
    val nodes = ec.select(col("src").as("node"))
      .unionByName(ec.select(col("dst").as("node"))).distinct().localCheckpoint()
    // Score relations stay SPARSE inside the loop (missing node == 0):
    // zero-score nodes contribute nothing to either half-step, so the
    // per-round all-nodes left-join is pure plan weight. Normalization is
    // DEFERRED: each half-step is linear, so the L1 scalars factor out of
    // the fixpoint direction and one final normalization yields exactly
    // the per-step-normalized scores (GraphSpec's dense replay normalizes
    // per step and agrees to float tolerance). A light renorm every 4th
    // round (two broadcast 1-row aggs) keeps magnitudes bounded for
    // arbitrary-degree graphs — growth per round is ≤ maxdeg², and 4
    // rounds of even a 10⁶-degree celebrity graph stay far inside double
    // range. This costs HALF the joins of the naive per-step-normalized
    // loop (measured 9.6 → 5.9 s warm at sf0.1; the remaining cost is 16
    // half-step shuffle rounds, by design — pageRank's 10 rounds ≈ 4 s).
    var hubs = ec.select(col("src").as("node")).distinct()
      .withColumn("hub", lit(1.0))
    var auths: DataFrame = null
    for (i <- 1 to iterations) {
      auths = ec.join(hubs.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node")).agg(sum("hub").as("auth"))
      hubs = ec.join(auths.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src").as("node")).agg(sum("auth").as("hub"))
      if (i % 4 == 0 && i != iterations) {
        // renormalize HUBS only: auths is recomputed from hubs at the top
        // of the next round before any read, so renormalizing it here was
        // two dead jobs (an agg + an eager checkpoint) per renorm round —
        // and bounded hubs bound the derived auths anyway (HITS is
        // linear; the single final L1 normalization fixes the scale)
        val hN = hubs.agg(sum("hub").as("s"))
        hubs = hubs.crossJoin(broadcast(hN))
          .select(col("node"), (col("hub") / col("s")).as("hub"))
          .localCheckpoint()
      } else if (i == iterations) {
        hubs = hubs.localCheckpoint(); auths = auths.localCheckpoint()
      }
    }
    // final exact L1 normalization over the FULL node set (sparse zeros
    // materialize here, once)
    val hN = hubs.agg(sum("hub").as("hsum"))
    val aN = auths.agg(sum("auth").as("asum"))
    nodes
      .join(hubs, Seq("node"), "left")
      .join(auths, Seq("node"), "left")
      .crossJoin(broadcast(hN))
      .crossJoin(broadcast(aN))
      .select(col("node"),
        (coalesce(col("hub"), lit(0.0)) / col("hsum")).as("hub"),
        (coalesce(col("auth"), lit(0.0)) / col("asum")).as("auth"))
  }

  /** exact triangle count with degree-ordered edge orientation (see
    * object scaladoc); returns a 1-row (triangles BIGINT) relation */
  def triangleCount(und: DataFrame): DataFrame = {
    val deg = und.select(col("a").as("node"))
      .unionByName(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient each edge from the lower-(deg, id) endpoint to the higher
    val dir0 = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .select(
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          col("a")).otherwise(col("b")).as("lo"),
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          col("b")).otherwise(col("a")).as("hi"))
      .localCheckpoint() // consumed three times below — compute the orientation once
    // parallelism FLOOR on the probe side: AQE coalesces the small
    // orientation to ~1 partition (it is only a few MB), but the wedge
    // join EXPANDS it ~Σdeg²/|E|-fold — a dense 500-node graph makes 26M
    // wedge rows out of 227k edges, all in that one task. Re-spread the
    // checkpointed relation to the cluster width before the broadcast
    // probes (getNumPartitions on a checkpointed frame is free — the RDD
    // is already materialized); at scale the checkpoint is already wide
    // and this is the identity.
    val par = und.sparkSession.sparkContext.defaultParallelism
    val dir =
      if (dir0.rdd.getNumPartitions < par) dir0.repartition(par).localCheckpoint()
      else dir0
    dir.as("e1")
      .join(dir.as("e2"), col("e1.hi") === col("e2.lo"))
      .join(dir.as("e3"),
        col("e1.lo") === col("e3.lo") && col("e2.hi") === col("e3.hi"))
      .agg(count(lit(1)).as("triangles"))
  }

  /** seeded Gaussian hyperplanes — one family per LSH table (the shared
    * generator, seed-parameterized: a plane-generation change happens in
    * exactly one place) */
  private def planes(seed: Long, nPlanes: Int, dim: Int): Seq[Seq[Double]] =
    Similarity.hyperplanes(nPlanes, dim, seed)

  /** approximate k-NN graph via multi-table hyperplane LSH: candidates
    * from (table, bucket) equi-joins, id-level dedupe, exact cosine on
    * the survivors, top-k per src via a src-partitioned window.
    *
    * `maxBucketSize` bounds the per-bucket self-join like every other
    * candidate path (Dedup.bucketedPairs): lsh_bucket maps null-slot or
    * non-`dim` vectors to bucket 0, and a skewed hyperplane family can
    * concentrate a table — either fans out quadratically uncapped.
    * Wrong-width vectors are dropped up front (they carry no usable
    * geometry AND would all collide in bucket 0). */
  def knnGraph(e: DataFrame, k: Int, nTables: Int, nPlanes: Int, dim: Int,
      maxBucketSize: Int = 1000): DataFrame = {
    // defensive kernel registration (ivfTopK/pqTopK convention) — direct
    // callers must not depend on a driver key having registered first
    graft.functions.GraftFunctions.register(e.sparkSession)
    val typed = e.filter(size(col("ed")) === dim)
    val bucketed = (0 until nTables).map { t =>
      typed.select(col("vec_id"), col("ed"),
        lit(t).as("tbl"),
        call_udf("lsh_bucket", col("ed"), typedLit(planes(20260814L + t, nPlanes, dim)))
          .as("bucket"))
    }.reduce(_ unionByName _)
    // candidate ids first — vectors re-attach AFTER the cross-table dedupe,
    // so each (src, nb) pair ships its vectors exactly once. The bucket
    // count shuffles on the same (tbl, bucket) key as the self-join, so
    // the exchange is reused.
    val keyed = bucketed.select(col("vec_id"), col("tbl"), col("bucket"))
    // over-cap buckets are CAPPED (deterministic min-vec_id members keep
    // participating), not dropped whole: dropping gave vectors hot in
    // every table ZERO knn edges — the round-8 semantic-dedup recall
    // hole, repeated. Capping bounds each bucket's pair fan-out at cap²
    // while dense regions keep (partial) neighborhoods; callers needing
    // full hot-region recall sub-split as Dedup.semDedupDropped does.
    val wb = Window.partitionBy("tbl", "bucket").orderBy("vec_id")
    val bounded = keyed
      .withColumn("brn", row_number().over(wb))
      .filter(col("brn") <= maxBucketSize)
      .drop("brn")
    val ids = bounded.select(col("vec_id").as("src"), col("tbl"), col("bucket"))
      .join(bounded.select(col("vec_id").as("nb"), col("tbl"), col("bucket")),
        Seq("tbl", "bucket"))
      .filter(col("src") =!= col("nb"))
      .select("src", "nb").distinct()
    val scored = ids
      .join(e.select(col("vec_id").as("src"), col("ed").as("sv")), "src")
      .join(e.select(col("vec_id").as("nb"), col("ed").as("nv")), "nb")
      .withColumn("cos", call_udf("cosine_sim", col("sv"), col("nv")))
    val w = Window.partitionBy("src").orderBy(col("cos").desc, col("nb"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("src"), col("nb"), round(col("cos"), 6).as("cos"), col("rn"))
  }

  /** max-label propagation with pointer-jump shortcutting: lbl(v) = max
    * node id that can REACH v along `edges` (directed). The SCC kernel's
    * shared primitive — both the forward coloring and the class-restricted
    * backward pass are this one routine over different edge relations.
    *
    * Soundness invariant: lbl(v) only ever holds ids that reach v —
    * initialization (v reaches v), propagation (u ⇝ src and src→dst ⇒
    * u ⇝ dst), and the pointer jump (c ⇝ v and c′ ⇝ c ⇒ c′ ⇝ v;
    * reachability composes, exactly the resolveClusters shortcut argument
    * transposed to the directed max). Completeness at fixpoint: were some
    * u ⇝ v with u > lbl(v), the first edge on u's path where the label
    * drops would still fire a propagation — so a changed-count of zero IS
    * the correct answer, and the jump only accelerates (rounds ~
    * log(diameter) instead of diameter). Convergence is counted by
    * observe() riding the per-round localCheckpoint (no extra action),
    * converged-or-throw (the resolveClusters policy: a wrong-but-plausible
    * label would silently merge/split components downstream).
    */
  private def maxReachLabel(nodes: DataFrame, edges: DataFrame,
      maxRounds: Int): DataFrame = {
    val ec = edges.select("src", "dst").localCheckpoint()
    var labels = nodes.select(col("v"), col("v").as("lbl")).localCheckpoint()
    var converged = false
    var r = 0
    while (!converged && r < maxRounds) {
      val nbrMax = ec.join(labels.select(col("v").as("src"), col("lbl")), "src")
        .groupBy(col("dst").as("nv")).agg(max("lbl").as("nbr_lbl"))
      val propagated = labels.join(nbrMax, labels("v") === nbrMax("nv"), "left")
        .select(col("v"), col("lbl").as("prev"),
          greatest(col("lbl"), coalesce(col("nbr_lbl"), col("lbl"))).as("lbl"))
      val obs = org.apache.spark.sql.Observation()
      labels = propagated.alias("x")
        .join(propagated.select(col("v").as("jv"), col("lbl").as("jlbl")).alias("y"),
          col("x.lbl") === col("y.jv"), "left")
        .select(col("x.v").as("v"),
          greatest(col("x.lbl"), coalesce(col("y.jlbl"), col("x.lbl"))).as("lbl"),
          col("x.prev").as("prev"))
        .observe(obs, count(when(col("lbl") =!= col("prev"), 1)).as("changed"))
        .select("v", "lbl")
        .localCheckpoint() // materializes -> the observation is harvested
      converged = obs.get("changed").asInstanceOf[Long] == 0
      r += 1
    }
    if (!converged) throw new IllegalStateException(
      s"maxReachLabel did not converge in $maxRounds rounds — " +
        "pathological diameter or too-small maxRounds")
    labels
  }

  /** Strongly connected components — trim + forward-coloring peeling (the
    * coloring / FW-BW-Trim family: Orzan 2004; Hong, Rodia & Olukotun
    * 2013; Slota, Rajamanickam & Madduri 2014 — all public). The SCC
    * decomposition is THE structural primitive of web-graph analysis
    * (Broder et al. 2000 computed it on a 200M-page crawl to expose the
    * bow-tie). Returns (node, scc) with scc = min member id — the
    * graph_connected_components id convention, which the DuckDB
    * mutual-closure oracle replays exactly.
    *
    * Per outer round, everything stays edge/node-relational:
    *  - TRIM to fixpoint: a remaining node with no in-edge or no out-edge
    *    is a singleton SCC (two left_anti joins against the endpoint
    *    sets); repeating collapses entire DAG regions with zero
    *    propagation, so coloring only ever runs on the cyclic remainder.
    *  - PEEL (two-label coloring): f(v) = max id reaching v
    *    ([[maxReachLabel]] forward), b(v) = max id v reaches (the same
    *    primitive over reversed edges). f(v) = b(v) = d holds exactly
    *    when d ⇝ v and v ⇝ d, i.e. v ∈ SCC(d) — every such d peels its
    *    WHOLE SCC in the same round, and the remaining maximum id always
    *    qualifies, so progress per round is guaranteed. A web graph
    *    (giant core + small periphery) resolves in a handful of outer
    *    rounds, not one-SCC-at-a-time.
    * All relations localCheckpoint per round (pageRank hygiene); the only
    * driver scalars are emptiness checks and observe() counts. */
  def scc(e: DataFrame, maxOuter: Int = 50, maxProp: Int = 30): DataFrame = {
    // ONE corpus-sized scan feeds both derivations below
    val e0 = e.select("src", "dst").localCheckpoint()
    // nodes come from the UNFILTERED edge list: a pure-self-loop node is
    // still a (singleton) SCC even though its edge is useless for cycles
    var remNodes = e0.select(col("src").as("v"))
      .unionByName(e0.select(col("dst").as("v"))).distinct().localCheckpoint()
    var remEdges = e0.filter(col("src") =!= col("dst")).distinct().localCheckpoint()
    // settled batches accumulate LAZILY: each batch is itself
    // checkpointed, so the union's lineage depth is #batches (bounded by
    // outer rounds), and skipping a per-batch re-checkpoint saves one job
    // per peel/trim on the hot loop
    var out: DataFrame = null
    // remaining-node count rides settle's own checkpoint (observe idiom)
    // so the outer loop's emptiness checks stop costing a probe job each
    var remCount = -1L
    def settle(batch: DataFrame): Unit = {
      out = if (out == null) batch else out.unionByName(batch)
      val obs = org.apache.spark.sql.Observation()
      remNodes = remNodes.join(batch.select("v"), Seq("v"), "left_anti")
        .observe(obs, count(lit(1)).as("n"))
        .localCheckpoint()
      remCount = obs.get("n").asInstanceOf[Long]
      remEdges = remEdges
        .join(remNodes.select(col("v").as("src")), Seq("src"), "left_semi")
        .join(remNodes.select(col("v").as("dst")), Seq("dst"), "left_semi")
        .localCheckpoint()
    }
    def remEmptyNow(): Boolean =
      if (remCount >= 0) remCount == 0L else remNodes.isEmpty
    var outer = 0
    var remEmpty = remNodes.isEmpty
    while (!remEmpty && outer < maxOuter) {
      var trimming = true
      while (trimming) {
        // emptiness probe folded into the checkpoint (observe idiom) —
        // the checkpointed frame still feeds settle when non-empty
        val obs = org.apache.spark.sql.Observation()
        val trimmed = remNodes
          .join(remEdges.select(col("src").as("v")).distinct(), Seq("v"), "left_anti")
          .unionByName(remNodes
            .join(remEdges.select(col("dst").as("v")).distinct(), Seq("v"), "left_anti"))
          .distinct()
          .observe(obs, count(lit(1)).as("n"))
          .localCheckpoint()
        if (obs.get("n").asInstanceOf[Long] == 0L) trimming = false
        else settle(trimmed.select(col("v"), col("v").as("scc")))
      }
      remEmpty = remEmptyNow()
      if (!remEmpty) {
        // f(v) = max id reaching v; b(v) = max id v reaches (the same
        // primitive over reversed edges). f(v) = b(v) = d ⟺ d ⇝ v and
        // v ⇝ d ⟺ v ∈ SCC(d) — so every such d peels its whole SCC in
        // this round, and the remaining max id always qualifies
        // (progress is guaranteed). This is the two-label form of the
        // coloring peel: no class-restricted edge derivation needed.
        val colors = maxReachLabel(remNodes, remEdges, maxProp)
        val bcolors = maxReachLabel(remNodes,
            remEdges.select(col("dst").as("src"), col("src").as("dst")), maxProp)
          .withColumnRenamed("lbl", "blbl")
        val members = colors.join(bcolors, "v")
          .filter(col("lbl") === col("blbl"))
          .select(col("v"), col("lbl").as("root"))
        // scc id = min member, the CC convention (roots are SCC MAXIMA)
        val ids = members.groupBy("root").agg(min("v").as("scc"))
        settle(members.join(ids, "root").select("v", "scc").localCheckpoint())
        remEmpty = remEmptyNow()
      }
      outer += 1
    }
    if (!remEmpty) throw new IllegalStateException(
      s"scc did not settle every node in $maxOuter outer rounds")
    if (out == null) e0.select(col("src").as("node"), col("dst").as("scc")).limit(0)
    else out.select(col("v").as("node"), col("scc"))
  }

  /** Bow-tie decomposition of a directed graph around its largest SCC
    * (Broder et al. 2000 §3, "Graph structure in the Web" — the canonical
    * web-crawl macro-structure: CORE / IN / OUT / TUBES / TENDRILS /
    * DISCONNECTED). Ties for largest SCC break to the smallest scc id so
    * the result is deterministic and the DuckDB oracle replays it.
    *
    * Segments, per node:
    *  - CORE: the largest SCC.
    *  - IN: reaches the core, not in it.  OUT: reachable from the core.
    *  - TUBE: reachable from IN AND reaches OUT without touching the core.
    *  - TENDRIL: reachable from IN or reaches OUT (exactly one side) —
    *    Broder's dangling threads off either lobe.
    *  - OTHER_WCC: weakly connected to the core's component but none of
    *    the above (reverse-edge hangers-on Broder's taxonomy lumps into
    *    tendril mass); DISCONNECTED: a different weak component entirely.
    *
    * Shape: the core row is a 1-row broadcast; the four reachability
    * passes are [[bfsHops]] frontier expansions (early-exit, settled-set,
    * each round one edges⋈frontier shuffle); the weak components reuse
    * the dedup pointer-jumping kernel; the final classification is one
    * chain of node-keyed left joins feeding a single when-cascade. */
  def bowTie(e: DataFrame, sccDf: DataFrame): DataFrame = {
    val ec = e.select("src", "dst").localCheckpoint()
    // fwd ("f") and bwd ("b") reachability share one tagged frontier
    // expansion — HALF the per-round jobs of two separate BFS passes,
    // and the tag rides the same (tag, src) shuffle key
    val both = ec.withColumn("tag", lit("f"))
      .unionByName(ec.select(col("dst").as("src"), col("src").as("dst"))
        .withColumn("tag", lit("b")))
      .localCheckpoint()
    def bothTags(nodes: DataFrame): DataFrame =
      nodes.withColumn("tag", lit("f"))
        .unionByName(nodes.withColumn("tag", lit("b")))
    def slice(reach: DataFrame, tag: String): DataFrame =
      reach.filter(col("tag") === tag).select("node")
    val core = sccDf.groupBy("scc").agg(count(lit(1)).as("m"))
      .orderBy(col("m").desc, col("scc")).limit(1)
      .select(col("scc").as("core_scc"))
    val coreMembers = sccDf.join(broadcast(core), col("scc") === col("core_scc"))
      .select("node").localCheckpoint()
    val reach1 = taggedReach(both, bothTags(coreMembers))
    val fwd = slice(reach1, "f")
    val bwd = slice(reach1, "b")
    val inSet = bwd.join(coreMembers, Seq("node"), "left_anti")
    val outSet = fwd.join(coreMembers, Seq("node"), "left_anti")
    val reach2 = taggedReach(both,
      inSet.withColumn("tag", lit("f"))
        .unionByName(outSet.withColumn("tag", lit("b"))))
    val fromIn = slice(reach2, "f")
    val toOut = slice(reach2, "b")
    val classified = sccDf.select("node")
      .join(coreMembers.withColumn("is_core", lit(true)), Seq("node"), "left")
      .join(bwd.withColumn("in_bwd", lit(true)), Seq("node"), "left")
      .join(fwd.withColumn("in_fwd", lit(true)), Seq("node"), "left")
      .join(fromIn.withColumn("from_in", lit(true)), Seq("node"), "left")
      .join(toOut.withColumn("to_out", lit(true)), Seq("node"), "left")
      .localCheckpoint()
    val directSeg =
      when(col("is_core"), "CORE")
        .when(col("in_bwd"), "IN")
        .when(col("in_fwd"), "OUT")
        .when(col("from_in") && col("to_out"), "TUBE")
        .when(col("from_in") || col("to_out"), "TENDRIL")
    // the weak-component solve only distinguishes OTHER_WCC from
    // DISCONNECTED — on a crawl-shaped graph (giant bow-tie, thin
    // periphery) the residual is tiny or empty, so gate the whole
    // pointer-jumping pass on one bounded emptiness probe
    val residual = classified.filter(
      coalesce(col("is_core"), col("in_bwd"), col("in_fwd"),
        col("from_in"), col("to_out")).isNull)
    if (residual.isEmpty)
      classified.select(col("node"),
        directSeg.otherwise("DISCONNECTED").as("segment"))
    else {
      val und = undirected(ec)
      val verts = und.select(col("a").as("v"))
        .unionByName(und.select(col("b").as("v"))).distinct()
      val comp = graft.ops.Dedup.resolveClusters(verts, und)
        .select(col("v").as("node"), col("rep"))
      // all core members share one weak rep by construction — 1-row broadcast
      val coreRep = comp.join(coreMembers, "node")
        .select(col("rep").as("core_rep")).distinct()
      classified
        .join(comp, Seq("node"), "left")
        .crossJoin(broadcast(coreRep))
        .select(col("node"),
          directSeg
            .when(col("rep") === col("core_rep"), "OTHER_WCC")
            .otherwise("DISCONNECTED").as("segment"))
    }
  }

  /** multi-tag reachability closure: one frontier expansion carrying a
    * `tag` column, so independent BFS sweeps (forward + backward, or
    * from-IN + to-OUT) share each round's shuffle instead of running
    * sequentially. Same settled-set/early-exit shape as [[bfsHops]]. */
  private def taggedReach(edges: DataFrame, seeds: DataFrame): DataFrame = {
    var reached = seeds.select("tag", "node").distinct().localCheckpoint()
    var frontier = reached
    var done = frontier.isEmpty
    while (!done) {
      // the emptiness probe rides the SAME action as the frontier's
      // checkpoint (observe(), the maxReachLabel idiom) — one job per
      // round instead of checkpoint + a separate isEmpty job
      val obs = org.apache.spark.sql.Observation()
      val next = edges.join(frontier.withColumnRenamed("node", "src"), Seq("tag", "src"))
        .select(col("tag"), col("dst").as("node")).distinct()
        .join(reached, Seq("tag", "node"), "left_anti")
        .observe(obs, count(lit(1)).as("n"))
        .localCheckpoint()
      if (obs.get("n").asInstanceOf[Long] == 0L) done = true
      else {
        reached = reached.unionByName(next).localCheckpoint()
        frontier = next
      }
    }
    reached
  }

  /** SCC memo over the driver stand-in graph — the decomposition is
    * deterministic (integer labels, converged-or-throw), and BOTH
    * graph_scc and graph_bowtie consume the identical relation, so one
    * localCheckpointed solve serves the pair (the ivfpqFitMemo argument;
    * keyed by [[sessionKey]] for the same second-session reasons). */
  private val sccCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def sccMemo(s: SparkSession, d: String): DataFrame =
    sccCache.computeIfAbsent(sessionKey(s, d), _ => scc(edges(s, d)).localCheckpoint())

  /** k-core decomposition — coreness(v) = the largest k such that v
    * survives in the k-core (every member has ≥ k neighbors inside the
    * core), the density ladder web-graph and community analyses peel
    * against (Batagelj & Zaversnik 2003 is the sequential algorithm).
    * The sequential min-degree peel is inherently serial, so this runs
    * the DISTRIBUTED fixpoint instead: iterate the H-operator
    * h(v) ← H({h(u) : u ∈ N(v)}) from the degree initialization —
    * Lü et al. 2016 (Nature Physics, public) prove the iterates are
    * monotonically non-increasing and converge exactly to coreness.
    *
    * Scale shape (the 100 TB contract): per round, ONE neighbors⋈est
    * hash join + a node-partitioned window computing each node's
    * H-index WITHOUT collecting neighbor lists — rank neighbors by
    * estimate desc, H = max(least(est, rank)) (invariant to tie order:
    * equal values contribute the same (value, rank) pair multiset) —
    * then one hash agg. Node state is ONE long; no degree-sized arrays
    * ever materialize, so a 10^7-degree celebrity host costs a
    * per-partition sort, not memory. Rounds are bounded by how far a
    * low-coreness boundary must propagate (graph-diameter-ish on web
    * graphs, NOT node count); converged-or-throw like [[scc]], with the
    * per-round localCheckpoint lineage hygiene. */
  def coreness(e: DataFrame, maxIters: Int = 100): DataFrame = {
    val und = undirected(e)
    val nbr = und.select(col("a").as("v"), col("b").as("n"))
      .union(und.select(col("b").as("v"), col("a").as("n")))
      .localCheckpoint()
    var est = nbr.groupBy("v").agg(count(lit(1)).as("h")).localCheckpoint()
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxIters) {
      val w = Window.partitionBy("v").orderBy(col("hn").desc, col("n"))
      // the convergence count rides the SAME action as the round's
      // checkpoint (observe() on the materializing plan — the
      // maxReachLabel idiom): one job per round instead of a checkpoint
      // job plus a separate join+count job. The prev join is node-sized
      // (broadcast); every v in the aggregate exists in est, so the
      // inner join drops nothing and h values are unchanged.
      val obs = org.apache.spark.sql.Observation()
      val next = nbr
        .join(est.select(col("v").as("n"), col("h").as("hn")), "n")
        .withColumn("r", row_number().over(w))
        .groupBy("v").agg(max(least(col("hn"), col("r"))).as("h"))
        .join(est.withColumnRenamed("h", "prev"), "v")
        .observe(obs, count(when(col("h") =!= col("prev"), 1)).as("changed"))
        .select("v", "h")
        .localCheckpoint() // materializes -> the observation is harvested
      changed = obs.get("changed").asInstanceOf[Long]
      est = next
      round += 1
    }
    require(changed == 0, s"coreness did not converge in $maxIters rounds")
    est.select(col("v").as("node"), col("h").cast("long").as("core"))
  }

  /** multi-source BFS: minimum hop distance from `sources` within
    * `maxHops`, as iterative frontier expansion — each round is ONE
    * edges⋈frontier shuffle + a distinct + an anti-join against the
    * settled set (so a node's distance is written exactly once, and the
    * frontier only carries NEW nodes — on a web graph the frontier
    * peaks and collapses instead of accumulating). Relations
    * localCheckpoint per round (the pageRank/resolveClusters lineage
    * hygiene); the only driver scalar is the early-exit emptiness
    * check, never node-sized data. */
  def bfsHops(e: DataFrame, sources: DataFrame, maxHops: Int): DataFrame = {
    val ec = e.select("src", "dst").localCheckpoint()
    var dist = sources.select(col("node")).distinct()
      .withColumn("dist", lit(0)).localCheckpoint()
    var frontier = dist.select("node")
    var hop = 1
    var done = false
    while (hop <= maxHops && !done) {
      // emptiness probe folded into the checkpoint action (observe — the
      // maxReachLabel idiom): one job per hop, not two
      val obs = org.apache.spark.sql.Observation()
      val next = ec.join(frontier.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node")).distinct()
        .join(dist.select("node"), Seq("node"), "left_anti")
        .withColumn("dist", lit(hop))
        .observe(obs, count(lit(1)).as("n"))
        .localCheckpoint()
      if (obs.get("n").asInstanceOf[Long] == 0L) done = true
      else {
        dist = dist.unionByName(next).localCheckpoint()
        frontier = next.select("node")
      }
      hop += 1
    }
    dist
  }

  /** HyperBall (Boldi & Vigna 2013 — the algorithm behind the published
    * web-graph harmonic-centrality rankings): every node carries a
    * MERGEABLE HLL counter of its growing reachability ball,
    * counter_r(v) = counter_{r−1}(v) ∪ ⋃_{(v,w)∈E} counter_{r−1}(w), and
    * harmonic(v) = Σ_r (|ball_r| − |ball_{r−1}|)/r. Pass REVERSED edges
    * for the in-harmonic the rankings use (ball = nodes that can REACH
    * v). Exact centrality is Θ(n·m) BFS — dead at web scale; HyperBall
    * is O(rounds · m) with O(2^lgK) state per node.
    *
    * Distributed shape: each round is ONE edges⋈counters shuffle + one
    * hash agg whose merge is the datasketches HLL union (register-max —
    * order-insensitive, so map-side partial merges are sound and the
    * result is deterministic); node state is sketch BYTES, never the
    * ball's members; localCheckpoint per round (the pageRank lineage
    * hygiene). The driver never holds node-sized data. Small balls sit
    * in the sketch's exact (coupon) range, so tiny-graph goldens are
    * EXACT — GraphSpec pins path/star closed forms and determinism. */
  def hyperBall(e: DataFrame, maxRounds: Int, lgK: Int = 10): DataFrame = {
    val ec = e.select("src", "dst").localCheckpoint()
    val nodes = ec.select(col("src").as("node"))
      .unionByName(ec.select(col("dst").as("node"))).distinct()
    var state = nodes.groupBy("node")
      .agg(hll_sketch_agg(col("node"), lit(lgK)).as("sketch"))
      .withColumn("est", hll_sketch_estimate(col("sketch")))
      .withColumn("harmonic", lit(0.0))
      .localCheckpoint()
    // DELTA PROPAGATION (the HyperBall paper's systolic optimization):
    // a node whose counter did NOT change in round r−1 need not re-ship
    // it in round r — its previous contribution is already absorbed into
    // every out-neighbor's own counter (the same invariant as bfsHops'
    // frontier). Per round the edges⋈counters shuffle then carries only
    // the ACTIVE frontier's sketch bytes, which on a converging graph
    // collapses after diameter rounds instead of shipping |E|·sketchsize
    // for all maxRounds. First cut measured 32 s at sf0.1 (8 full-edge
    // rounds of ~4 KB sketches); frontier + early-exit + lgK 10 is ~10×.
    var active = state.select("node", "sketch")
    var r = 1
    var done = false
    while (r <= maxRounds && !done) {
      // v's next ball = its own counter ∪ the CHANGED out-neighbors'
      // counters; both arrive as (node, sketch) rows into one merge agg
      val contrib = ec
        .join(active.withColumnRenamed("node", "dst"), "dst")
        .select(col("src").as("node"), col("sketch"))
        .unionByName(state.select("node", "sketch"))
      val merged = contrib.groupBy("node")
        .agg(hll_union_agg(col("sketch"), lit(false)).as("sketch"))
        .withColumn("est", hll_sketch_estimate(col("sketch")))
      // the "any counter changed?" early-exit probe rides the SAME action
      // as the round's checkpoint (observe idiom) — one job per round
      // instead of checkpoint + a separate isEmpty job on the filter
      val obs = org.apache.spark.sql.Observation()
      state = merged
        .join(state.select(col("node"), col("sketch").as("prev_sketch"),
          col("est").as("prev"), col("harmonic")), "node")
        // greatest(…, 0) guards the HLL-mode estimate's ±ε jitter: a
        // union can never shrink the true ball, so a negative increment
        // is estimator noise and must not reduce the centrality sum
        .withColumn("harmonic",
          col("harmonic") +
            greatest(col("est") - col("prev"), lit(0L)).cast("double") / lit(r.toDouble))
        // register state is a per-slot max, so identical content yields
        // identical bytes — byte inequality IS "the ball grew" (and a
        // conservatively-true flag only costs rounds, never correctness)
        .withColumn("changed", not(col("sketch") <=> col("prev_sketch")))
        .select("node", "sketch", "est", "harmonic", "changed")
        .observe(obs, count(when(col("changed"), 1)).as("n_changed"))
        .localCheckpoint()
      active = state.where(col("changed")).select("node", "sketch")
      // bounded driver scalar (the bfsHops early-exit discipline)
      if (obs.get("n_changed").asInstanceOf[Long] == 0L) done = true
      r += 1
    }
    state.select(col("node"), col("est").as("ball_size"), col("harmonic"))
  }

  override def queries: Map[String, QFn] = Map(
    // BFS hop distance from node 0 (≤ 6 hops) — the traversal member of
    // the graph family (link-distance / crawl-frontier shape). The
    // DuckDB oracle is an independent recursive CTE (UNION-deduped so
    // the path explosion of a dense graph never materializes) reduced by
    // min(dist) — settled-set BFS and shortest-of-all-walks agree by
    // definition of hop distance.
    "graph_bfs_hops" -> ((s, d) => {
      import s.implicits._
      bfsHops(edges(s, d), Seq(0L).toDF("node"), maxHops = 6)
        .orderBy("node")
    }),

    // in/out degree per node — the first profile any web-graph job runs
    "graph_degree" -> ((s, d) => {
      val e = edges(s, d)
      val outd = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("out_deg"))
      val ind = e.groupBy(col("dst").as("node")).agg(count(lit(1)).as("in_deg"))
      outd.join(ind, Seq("node"), "full_outer")
        .na.fill(0L, Seq("out_deg", "in_deg"))
        .orderBy("node")
    }),

    // PageRank, 10 rounds — oracle-exempt (iterative float accumulation);
    // GraphSpec pins the closed forms (cycle → uniform, star dominance,
    // rank mass conservation) and determinism of the row set
    "graph_pagerank" -> ((s, d) =>
      pageRank(edges(s, d), iterations = 10)
        .select(col("node"), round(col("rank") * 1000, 6).as("pr_permille"))
        .orderBy("node")),

    // Personalized PageRank from a deterministic seed set (every 50th
    // node) — the seed-proximity scorer focused crawling ranks its
    // frontier with. Oracle-exempt like graph_pagerank (iterative float
    // accumulation); GraphSpec pins an exact scalar replay on a 2-node
    // cycle, mass conservation, the unreachable-stays-at-zero sharp
    // property, and driver-key determinism.
    "graph_ppr" -> ((s, d) => {
      import s.implicits._
      val seeds = (0L until NMod by 50L).toDF("node")
      personalizedPageRank(edges(s, d), seeds, iterations = 10)
        .select(col("node"), round(col("rank") * 1000, 6).as("ppr_permille"))
        .orderBy("node")
    }),

    // exact triangle count, degree-ordered orientation
    "graph_triangle_count" -> ((s, d) => triangleCount(undirected(edges(s, d)))),

    // HITS hubs/authorities — float-iterative like pageRank, so
    // prop/golden: GraphSpec pins closed forms, a dense pure-Scala
    // reference replay, and run-to-run determinism with tolerance
    "graph_hits" -> ((s, d) =>
      hits(edges(s, d), iterations = 8)
        .select(col("node"),
          round(col("hub") * 1000, 6).as("hub_permille"),
          round(col("auth") * 1000, 6).as("auth_permille"))
        .orderBy("node")),

    // label propagation (community detection), 3 SYNCHRONOUS rounds with
    // a deterministic tie-break — and therefore ORACLE-CHECKED, unlike
    // pageRank: every update is integer arithmetic (neighbor-label counts
    // + a (cnt, −label) struct-max that picks the smallest label among
    // the most frequent, the agg_mode trick), so DuckDB replays the exact
    // rounds. Each round is one nbrs⋈labels shuffle + two hash aggs, the
    // relation localCheckpoints per round (pageRank's lineage hygiene);
    // nothing driver-sized ever materializes. Synchronous LPA (all
    // updates read the PREVIOUS round) is the distributed-safe variant —
    // async update order is engine-dependent by construction.
    "graph_label_propagation" -> ((s, d) => {
      val und = undirected(edges(s, d))
      val nbrs = und.select(col("a").as("v"), col("b").as("n"))
        .unionByName(und.select(col("b").as("v"), col("a").as("n")))
        .localCheckpoint()
      var labels = nbrs.select(col("v")).distinct().withColumn("lbl", col("v"))
      for (_ <- 1 to 3) {
        labels = nbrs
          .join(labels.select(col("v").as("n"), col("lbl")), "n")
          .groupBy("v", "lbl").agg(count(lit(1)).as("cnt"))
          .groupBy("v")
          .agg(max(struct(col("cnt"), (-col("lbl")).as("neg"))).as("m"))
          .select(col("v"), (-col("m.neg")).as("lbl"))
          .localCheckpoint()
      }
      labels.orderBy("v")
    }),

    // connected components over the link graph — the SAME pointer-jumping
    // min-label routine the dedup pipeline uses (ops.Dedup.resolveClusters:
    // per round one edges⋈labels agg + a rep-chasing self-join, so rounds
    // cover diameter 2^k, converged-or-throw), surfaced as a graph key
    // and ORACLE-CHECKED: component id = min node id in the component,
    // which a DuckDB recursive CTE reproduces exactly.
    "graph_connected_components" -> ((s, d) => {
      val und = undirected(edges(s, d))
      val verts = und.select(col("a").as("v"))
        .unionByName(und.select(col("b").as("v"))).distinct()
      graft.ops.Dedup.resolveClusters(verts, und)
        .select(col("v").as("node"), col("rep").as("component"))
        .orderBy("node")
    }),

    // strongly connected components — the directed counterpart of
    // graph_connected_components and the structural primitive of
    // web-graph analysis (Broder et al. 2000). Integer labels +
    // converged-or-throw make it exactly replayable: the DuckDB oracle
    // derives the same min-member ids from an independent
    // mutual-reachability closure.
    "graph_scc" -> ((s, d) => sccMemo(s, d).orderBy("node")),

    // bow-tie decomposition around the largest SCC (Broder et al. 2000
    // §3): CORE / IN / OUT / TUBE / TENDRIL / OTHER_WCC / DISCONNECTED
    // per node. Shares the memoized SCC solve with graph_scc (one
    // decomposition serves both keys, the ivfpq-fit discipline).
    "graph_bowtie" -> ((s, d) =>
      bowTie(edges(s, d), sccMemo(s, d)).orderBy("node")),

    // k-core decomposition via the distributed H-operator fixpoint —
    // integer-exact and converged-or-throw, but the peel itself has no
    // closed SQL form (aggregation over a recursive relation), so
    // prop/golden: GraphSpec pins clique/path/cycle closed forms and an
    // independent sequential Batagelj-Zaversnik peel replay at sf0.001
    "graph_kcore" -> ((s, d) => coreness(edges(s, d)).orderBy("node")),

    // HyperBall harmonic centrality — oracle-exempt (HLL register
    // internals are engine-specific, like agg_hll_merge); GraphSpec pins
    // exact path/star closed forms in the sketch's exact range, ball
    // monotonicity, and run-to-run determinism. Reversed edges: the
    // in-harmonic (who can reach v) is what the published rankings use.
    "graph_harmonic_hyperball" -> ((s, d) => {
      val rev = edges(s, d).select(col("dst").as("src"), col("src").as("dst"))
      hyperBall(rev, maxRounds = 8)
        .select(col("node"), col("ball_size"),
          round(col("harmonic"), 4).as("harmonic"))
        .orderBy("node")
    }),

    // approximate k-NN similarity graph over the embeddings — the input
    // relation graph-based dedup / clustering consumes
    "emb_knn_graph" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val e = Tables.t(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("ed"))
      knnGraph(e, k = 5, nTables = 4, nPlanes = 10, dim = 64)
        .orderBy("src", "rn")
    })
  )

  override def oracleSql: Map[String, String] = Map(
    // UNION (not UNION ALL) dedupes (node, dist) rows per level, so the
    // recursion's working set stays <= nodes × hops even on the dense
    // sf0.1 graph where counting walks would explode combinatorially
    "graph_bfs_hops" ->
      (s"WITH RECURSIVE bfs(node, dist) AS (" +
        "SELECT CAST(0 AS BIGINT) AS node, 0 AS dist " +
        "UNION " +
        s"SELECT e.dst, b.dist + 1 FROM bfs b JOIN $edgesDuck e ON e.src = b.node " +
        "WHERE b.dist < 6) " +
        "SELECT node, min(dist) AS dist FROM bfs GROUP BY node ORDER BY node"),
    "graph_degree" ->
      (s"WITH e AS $edgesDuck, " +
        "o AS (SELECT src AS node, count(*) AS out_deg FROM e GROUP BY src), " +
        "i AS (SELECT dst AS node, count(*) AS in_deg FROM e GROUP BY dst) " +
        "SELECT coalesce(o.node, i.node) AS node, coalesce(out_deg, 0) AS out_deg, " +
        "coalesce(in_deg, 0) AS in_deg FROM o FULL OUTER JOIN i ON o.node = i.node " +
        "ORDER BY node"),
    // the same 3 synchronous rounds unrolled; {'c': cnt, 'g': -lbl}
    // struct-max IS the (max count, min label) tie-break
    "graph_label_propagation" ->
      (s"WITH e AS $edgesDuck, " +
        "und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM e), " +
        "nbr AS (SELECT a AS v, b AS n FROM und UNION ALL SELECT b, a FROM und), " +
        "l0 AS (SELECT DISTINCT v, v AS lbl FROM nbr), " +
        "l1 AS (SELECT x.v, -(max({'c': x.cnt, 'g': -x.lbl})).g AS lbl FROM " +
        "(SELECT nb.v, l.lbl, count(*) AS cnt FROM nbr nb JOIN l0 l ON nb.n = l.v " +
        "GROUP BY nb.v, l.lbl) x GROUP BY x.v), " +
        "l2 AS (SELECT x.v, -(max({'c': x.cnt, 'g': -x.lbl})).g AS lbl FROM " +
        "(SELECT nb.v, l.lbl, count(*) AS cnt FROM nbr nb JOIN l1 l ON nb.n = l.v " +
        "GROUP BY nb.v, l.lbl) x GROUP BY x.v), " +
        "l3 AS (SELECT x.v, -(max({'c': x.cnt, 'g': -x.lbl})).g AS lbl FROM " +
        "(SELECT nb.v, l.lbl, count(*) AS cnt FROM nbr nb JOIN l2 l ON nb.n = l.v " +
        "GROUP BY nb.v, l.lbl) x GROUP BY x.v) " +
        "SELECT v, lbl FROM l3 ORDER BY v"),
    // component membership spreads along UNION-deduped reach rows, so the
    // working set stays ≤ |nodes|·|components' spans|, never walk counts
    "graph_connected_components" ->
      (s"WITH RECURSIVE e AS $edgesDuck, " +
        "und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM e), " +
        "nbr AS (SELECT a AS v, b AS n FROM und UNION ALL SELECT b, a FROM und), " +
        "reach(v, r) AS (" +
        "SELECT v, v FROM (SELECT DISTINCT v FROM nbr) " +
        "UNION " +
        "SELECT n.v, r.r FROM nbr n JOIN reach r ON n.n = r.v) " +
        "SELECT v AS node, min(r) AS component FROM reach GROUP BY v ORDER BY node"),
    // independent mutual-reachability closure: v and r share an SCC iff
    // reach holds BOTH (v,r) and (r,v); scc id = min such r (self-pairs
    // put v itself in the candidate set). UNION-deduped, so the working
    // set is bounded by nodes², never walk counts.
    "graph_scc" ->
      (s"WITH RECURSIVE e AS $edgesDuck, " +
        "n AS (SELECT src AS v FROM e UNION SELECT dst FROM e), " +
        "reach(v, r) AS (" +
        "SELECT v, v FROM n " +
        "UNION " +
        "SELECT rr.v, e2.dst FROM reach rr JOIN e e2 ON e2.src = rr.r) " +
        "SELECT a.v AS node, min(a.r) AS scc " +
        "FROM reach a JOIN reach b ON a.v = b.r AND a.r = b.v " +
        "GROUP BY a.v ORDER BY node"),
    // the same closure re-read six ways: scc → largest-by-(count, min id)
    // core, fwd/bwd = reachability to/from core members, fromin/toout =
    // the tendril/tube tests, plus the weak-component closure for the
    // OTHER_WCC vs DISCONNECTED split — each CASE arm mirrors one
    // when-clause of the Spark cascade in the same precedence order
    "graph_bowtie" ->
      (s"WITH RECURSIVE e AS $edgesDuck, " +
        "n AS (SELECT src AS v FROM e UNION SELECT dst FROM e), " +
        "reach(v, r) AS (" +
        "SELECT v, v FROM n " +
        "UNION " +
        "SELECT rr.v, e2.dst FROM reach rr JOIN e e2 ON e2.src = rr.r), " +
        "scc AS (SELECT a.v AS node, min(a.r) AS sid FROM reach a " +
        "JOIN reach b ON a.v = b.r AND a.r = b.v GROUP BY a.v), " +
        "core AS (SELECT sid FROM (SELECT sid, count(*) AS m FROM scc " +
        "GROUP BY sid ORDER BY m DESC, sid LIMIT 1)), " +
        "corem AS (SELECT node FROM scc WHERE sid = (SELECT sid FROM core)), " +
        "fwd AS (SELECT DISTINCT r.r AS node FROM reach r JOIN corem c ON r.v = c.node), " +
        "bwd AS (SELECT DISTINCT r.v AS node FROM reach r JOIN corem c ON r.r = c.node), " +
        "ins AS (SELECT node FROM bwd WHERE node NOT IN (SELECT node FROM corem)), " +
        "outs AS (SELECT node FROM fwd WHERE node NOT IN (SELECT node FROM corem)), " +
        "fromin AS (SELECT DISTINCT r.r AS node FROM reach r JOIN ins i ON r.v = i.node), " +
        "toout AS (SELECT DISTINCT r.v AS node FROM reach r JOIN outs o ON r.r = o.node), " +
        "und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM e), " +
        "nbr AS (SELECT a AS v, b AS n FROM und UNION ALL SELECT b, a FROM und), " +
        "wreach(v, r) AS (" +
        "SELECT v, v FROM (SELECT DISTINCT v FROM nbr) " +
        "UNION " +
        "SELECT nb.v, wr.r FROM nbr nb JOIN wreach wr ON nb.n = wr.v), " +
        "wcomp AS (SELECT v, min(r) AS rep FROM wreach GROUP BY v), " +
        "corerep AS (SELECT DISTINCT w.rep FROM wcomp w JOIN corem c ON w.v = c.node) " +
        "SELECT s.node, " +
        "CASE WHEN s.node IN (SELECT node FROM corem) THEN 'CORE' " +
        "WHEN s.node IN (SELECT node FROM bwd) THEN 'IN' " +
        "WHEN s.node IN (SELECT node FROM fwd) THEN 'OUT' " +
        "WHEN s.node IN (SELECT node FROM fromin) " +
        "AND s.node IN (SELECT node FROM toout) THEN 'TUBE' " +
        "WHEN s.node IN (SELECT node FROM fromin) " +
        "OR s.node IN (SELECT node FROM toout) THEN 'TENDRIL' " +
        "WHEN (SELECT rep FROM wcomp w WHERE w.v = s.node) = " +
        "(SELECT rep FROM corerep) THEN 'OTHER_WCC' " +
        "ELSE 'DISCONNECTED' END AS segment " +
        "FROM scc s ORDER BY s.node"),
    // id-order orientation — any acyclic orientation yields the same count
    "graph_triangle_count" ->
      (s"WITH e AS $edgesDuck, " +
        "und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM e) " +
        "SELECT count(*) AS triangles FROM und e1 " +
        "JOIN und e2 ON e1.b = e2.a JOIN und e3 ON e1.a = e3.a AND e2.b = e3.b")
  )
}
