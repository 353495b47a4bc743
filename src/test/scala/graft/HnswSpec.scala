package graft

import graft.ops.Hnsw
import org.apache.spark.sql.functions._

/** Graph-ANN (HNSW) properties: planted recall at/above the IVF-PQ
  * ladder, brute-force recall at equal probe cost, stored-adjacency
  * serve parity, determinism, and structural invariants. */
class HnswSpec extends SparkSpec {
  import spark.implicits._

  private def base = Tables.t(spark, sfDir, "embeddings")
    .withColumn("ed", col("embedding").cast("array<double>"))
    .select(col("vec_id"), col("ed"))

  private def plantedCorpus = {
    val planted = base.filter(col("vec_id") === 0)
      .crossJoin(Seq(1, 2, 3, 4, 5).toDF("i"))
      .select((col("i") + 900000L).as("vec_id"),
        expr("transform(ed, x -> x + i * 0.0001D)").as("ed"))
    base.unionByName(planted)
  }

  private def queryVec = base.filter(col("vec_id") === 0L)
    .select("ed").head().getSeq[Double](0).toArray

  test("sim_ann_hnsw: planted near-duplicates of the query surface in the top-k") {
    val top = Hnsw.topK(plantedCorpus, queryVec).collect()
    assert(top.length == 10)
    val ids = top.map(_.getAs[Long]("vec_id")).toSet
    val expected = Set(0L, 900001L, 900002L, 900003L, 900004L, 900005L)
    assert(expected.subsetOf(ids),
      s"planted near-dups missing from HNSW top-10: ${expected.diff(ids)} in $ids")
    // cosine is exact on the surfaced candidates: head is the self-hit at 1
    assert(top.head.getAs[Long]("vec_id") == 0L)
    assert(math.abs(top.head.getAs[Double]("cos") - 1.0) < 1e-6)
    // scores are non-increasing
    val cs = top.map(_.getAs[Double]("cos"))
    assert(cs.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("sim_ann_hnsw: recall@10 vs brute force meets the IVF-PQ ladder") {
    // the recall pitch of a graph index: at equal candidate budget it
    // must not trail the cell-probing family. Brute-force exact top-10
    // is the referee; IVF-PQ (nProbe=2, the driver key's setting) the
    // ladder rung.
    graft.functions.GraftFunctions.register(spark)
    val q = queryVec
    val brute = base
      .withColumn("cos", call_udf("cosine_sim", col("ed"), typedLit(q.toSeq)))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10).select("vec_id").as[Long].collect().toSet
    val hnsw = Hnsw.topK(base, q)
      .select("vec_id").as[Long].collect().toSet
    val ivfpq = graft.queries.Similarity.ivfpqTopK(base, queryId = 0L, nProbe = 2)
      .select("vec_id").as[Long].collect().toSet
    val hnswRecall = (hnsw & brute).size
    val ivfpqRecall = (ivfpq & brute).size
    assert(hnswRecall >= ivfpqRecall,
      s"HNSW recall@10 $hnswRecall/10 below IVF-PQ's $ivfpqRecall/10")
    assert(hnswRecall >= 8, s"HNSW recall@10 $hnswRecall/10 below 0.8")
  }

  test("sim_ann_hnsw_index: stored-adjacency serve == in-memory search, bit for bit") {
    val e = plantedCorpus
    val q = queryVec
    val dir = "/tmp/graft_test/hnsw_parity"
    Hnsw.adjacency(e, dim = q.length)
      .write.mode("overwrite").partitionBy("shard").parquet(dir)
    val stored = Hnsw.topKStored(spark.read.parquet(dir), e, q)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val mem = Hnsw.topK(e, q)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(stored == mem, s"stored $stored != in-memory $mem")
  }

  test("build is deterministic and structurally sound") {
    val items = base.filter(col("vec_id") < 200)
      .as[(Long, Array[Double])].collect()
    val g1 = Hnsw.build(items)
    val g2 = Hnsw.build(items.reverse) // arrival order must not matter
    assert(g1.ids.toSeq == g2.ids.toSeq)
    assert(g1.levels.toSeq == g2.levels.toSeq)
    assert(g1.entry == g2.entry && g1.maxLevel == g2.maxLevel)
    (0 until g1.size).foreach { i =>
      (0 to g1.levels(i)).foreach { lev =>
        assert(g1.adj(i)(lev).toSeq == g2.adj(i)(lev).toSeq,
          s"adjacency differs at node $i level $lev")
        // caps: 2M at level 0, M above
        val cap = if (lev == 0) 16 else 8
        assert(g1.adj(i)(lev).length <= cap)
        // an edge at a level only touches nodes that REACH that level
        g1.adj(i)(lev).foreach(nb => assert(g1.levels(nb) >= lev))
      }
    }
    // the entry invariant topKStored relies on: smallest id among
    // max-level nodes
    val maxNodes = (0 until g1.size).filter(g1.levels(_) == g1.maxLevel)
    assert(g1.entry == maxNodes.min)
  }

  test("sim_ann_hnsw_batch: each qid's rows equal its single-query topK bit for bit") {
    val e = base
    val queries = e.filter(col("vec_id").isin(0L, 7L, 23L))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val batch = Hnsw.batchTopK(e, queries).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
    queries.foreach { case (qid, qv) =>
      val single = Hnsw.topK(e, qv)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batch(qid) == single, s"qid $qid: batch ${batch(qid)} != single $single")
    }
  }

  test("append: frozen incremental insert == from-scratch build over base ∪ batch; planted twin surfaces") {
    import graft.queries.Similarity
    val e = base
    val q = queryVec
    val batch = Similarity.appendBatch(e)
    val all = e.unionByName(batch)
    val dir = "/tmp/graft_test/hnsw_append_spec"
    Hnsw.adjacency(e, dim = q.length)
      .write.mode("overwrite").partitionBy("shard").parquet(s"$dir/v1")
    val appended = Hnsw.appendStored(spark.read.parquet(s"$dir/v1"), all, batch, dim = q.length)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getSeq[Long](3)))
      .toSet
    // the whole UPDATED adjacency equals a from-scratch build's — edge
    // for edge, level for level (batch ids sort after the base, so the
    // deterministic insertion order coincides)
    val rebuilt = Hnsw.adjacency(all, dim = q.length)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getSeq[Long](3)))
      .toSet
    assert(appended == rebuilt,
      s"appended graph differs from rebuild: ${appended.diff(rebuilt).take(3)} / ${rebuilt.diff(appended).take(3)}")
    // and the serve finds query 0's planted day-2 twin
    Hnsw.appendStored(spark.read.parquet(s"$dir/v1"), all, batch, dim = q.length)
      .write.mode("overwrite").partitionBy("shard").parquet(s"$dir/v2")
    val ids = Hnsw.topKStored(spark.read.parquet(s"$dir/v2"), all, q)
      .collect().map(_.getLong(0)).toSet
    assert(ids.contains(Similarity.AppendIdOffset),
      s"planted twin ${Similarity.AppendIdOffset} missing from appended-index top-k: $ids")
  }

  test("obs_ann_recall: exactly k sampled queries, recall in [0,1], floor holds") {
    val rows = SparkEntry.queries("obs_ann_recall")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the sample is FIXED-K (bottom-k by hash): the evaluation budget is
    // k rows regardless of corpus size — both legs provably bounded
    val nSample = math.min(
      graft.queries.Similarity.AnnRecallSampleK.toLong, base.count())
    assert(rows.length == nSample, s"${rows.length} report rows for $nSample sampled queries")
    rows.foreach { case (qid, hits, rec) =>
      assert(hits >= 0 && hits <= 10, s"qid $qid hits $hits")
      assert(math.abs(rec - hits / 10.0) < 1e-9)
    }
    // the graph index's whole pitch: high recall on the evaluation report
    val mean = rows.map(_._3).sum / rows.length
    assert(mean >= 0.8, s"mean recall@10 $mean below 0.8: $rows")
  }

  test("clustered topology: Alg-4 diversity selection holds recall@10 across cluster gaps") {
    // The topology where simple closest-M selection degrades (the
    // dedup_semantic twin-cluster shape, scaled up): 4 tight, mutually
    // far clusters. Closest-M spends every edge slot INSIDE a node's own
    // cluster, so the greedy walk from an entry in the wrong cluster has
    // no bridge to cross; the Alg-4 heuristic keeps a candidate only
    // when it is closer to the target than to every already-kept
    // neighbor, which forces inter-cluster edges at the same M. Pin:
    // recall@10 vs brute force on a single graph at a LEAN probe budget.
    // centers on a smooth rotation (adjacent clusters cos ≈ 0.88, the
    // far pair ≈ 0.07) — graded inter-cluster similarity, like real
    // embedding space; four MUTUALLY ORTHOGONAL centers would make
    // every inter-cluster distance tie at the maximum and turn bridge
    // selection into a coin flip no heuristic can win
    val dim = 16
    val nPer = 250
    def center(c: Int): Array[Double] =
      Array.tabulate(dim)(i =>
        if (i == 0) math.cos(0.5 * c) else if (i == 1) math.sin(0.5 * c) else 0.0)
    // aperiodic deterministic noise — a modular pattern with a short
    // period in j would collapse each cluster to a handful of duplicated
    // points, and "recall" would measure duplicate-class arbitration,
    // not graph navigation
    def pt(c: Int, j: Int): Array[Double] = {
      val base = center(c)
      Array.tabulate(dim) { i =>
        val h = (j * 2654435761L + i * 40503L + c * 69427L) & 0xffffL
        base(i) + (h.toDouble / 65535.0 - 0.5) * 0.3
      }
    }
    // ids INTERLEAVE clusters (id % 4 = cluster) — the realistic case
    // (vec_ids carry no cluster signal), and the one that isolates
    // SELECTION quality: every cluster is present at every build stage,
    // so upper-layer nodes span clusters and recall is decided by which
    // M neighbors each node keeps — closest-M spends them all
    // intra-cluster, the Alg-4 heuristic keeps the bridges.
    val items = (for (c <- 0 until 4; j <- 0 until nPer)
      yield ((j * 4 + c).toLong, pt(c, j))).toArray
    val g = Hnsw.build(items, m = 6, efC = 32)
    // queries: one per cluster, nudged off a member point — entry is in
    // ONE cluster, so three of the four walks must bridge a gap
    def cosTo(q: Array[Double], v: Array[Double]): Double = {
      val dot = q.zip(v).map { case (a, b) => a * b }.sum
      dot / (math.sqrt(q.map(x => x * x).sum) * math.sqrt(v.map(x => x * x).sum))
    }
    val recalls = (0 until 4).map { c =>
      val q = pt(c, 999).map(_ + 0.001)
      val brute = items.map { case (id, v) => (cosTo(q, v), id) }
        .sortBy(t => (-t._1, t._2)).take(10).map(_._2).toSet
      val got = Hnsw.search(g, q, ef = 16, k = 10).map(_._1).toSet
      (brute & got).size / 10.0
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.9, s"clustered recall@10 $mean (per cluster: $recalls)")
    recalls.foreach(r => assert(r >= 0.7, s"a cluster's recall collapsed: $recalls"))
  }

  test("sim_ann_hnsw_filtered: predicate purity, recall vs filtered brute force, admit-all == topK") {
    import graft.functions.GraftFunctions
    GraftFunctions.register(spark)
    val e = base
    val q = queryVec
    // predicate purity + the self-hit excluded by construction
    val got = SparkEntry.queries("sim_ann_hnsw_filtered")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.length == 10)
    assert(got.forall(_._1 % 3 == 1), s"non-matching id surfaced: ${got.toSeq}")
    assert(!got.exists(_._1 == 0L), "the filtered-out self-hit surfaced")
    // recall vs the brute-force top-10 OVER THE MATCHING SUBSET
    val brute = e.filter(col("vec_id") % 3 === 1)
      .withColumn("cos", call_udf("cosine_sim", col("ed"), typedLit(q.toSeq)))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10).select("vec_id").as[Long].collect().toSet
    val recall = (got.map(_._1).toSet & brute).size
    assert(recall >= 8, s"filtered recall@10 $recall/10 below 0.8")
    // an always-true predicate must reproduce the unfiltered search
    // bit-for-bit (same walk, same admission, same merge)
    val allTrue = Hnsw.topKFiltered(e.withColumn("allowed", lit(true)), q)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val plain = Hnsw.topK(e, q)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(allTrue == plain, s"admit-all $allTrue != plain $plain")
    // null flags mean NOT matching, never a crash
    val nullFlag = Hnsw.topKFiltered(
      e.withColumn("allowed", when(col("vec_id") % 3 === 1, lit(true))), q)
      .collect().map(_.getLong(0))
    assert(nullFlag.forall(_ % 3 == 1))
  }

  test("stored filtered serve == in-memory filtered search, bit for bit") {
    val e = plantedCorpus
    val q = queryVec
    val dir = "/tmp/graft_test/hnsw_filtered_stored"
    Hnsw.adjacency(e, dim = q.length)
      .write.mode("overwrite").partitionBy("shard").parquet(dir)
    val withFlag = e.withColumn("allowed", col("vec_id") % 3 === 1)
    val stored = Hnsw.topKStoredFiltered(spark.read.parquet(dir), withFlag, q)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val mem = Hnsw.topKFiltered(withFlag, q)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(stored == mem, s"stored-filtered $stored != in-memory-filtered $mem")
    assert(stored.forall(_._1 % 3 == 1), stored.toString)
  }

  test("obs_index_health: report invariants hold against the graph's own caps") {
    val rows = SparkEntry.queries("obs_index_health")(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 8, s"${rows.length} shard rows")
    val nTotal = rows.map(_.getAs[Long]("n_nodes")).sum
    assert(nTotal == base.count(), s"node total $nTotal != corpus size")
    rows.foreach { r =>
      assert(r.getAs[Int]("max_degree0") <= 16, r.toString) // 2M cap, M=8
      assert(r.getAs[Double]("mean_degree0") > 0.0, r.toString)
      assert(r.getAs[Long]("sinks0") == 0,
        s"level-0 sink in a freshly built graph: $r")
      assert(r.getAs[Int]("max_level") >= 0 && r.getAs[Long]("entry_id") >= 0, r.toString)
    }
    // the reported entry matches the serve's derivation (smallest id at
    // max level) on one reconstructed shard
    val e = base
    import spark.implicits._
    val shard0 = e.filter(pmod(col("vec_id"), lit(8)) === 0)
      .as[(Long, Array[Double])].collect()
    val g = Hnsw.build(shard0)
    val rep = rows.find(_.getAs[Int]("shard") == 0).get
    assert(rep.getAs[Long]("entry_id") == g.ids(g.entry),
      s"reported entry ${rep.getAs[Long]("entry_id")} != graph entry ${g.ids(g.entry)}")
    assert(rep.getAs[Int]("max_level") == g.maxLevel)
  }

  test("takedown: removeStored drops the ids everywhere, bridges the holes, repair is bounded") {
    val e = plantedCorpus
    val q = queryVec
    val dir = "/tmp/graft_test/hnsw_takedown_spec"
    Hnsw.adjacency(e, dim = q.length)
      .write.mode("overwrite").partitionBy("shard").parquet(s"$dir/v1")
    val v1 = spark.read.parquet(s"$dir/v1")
    val before = Hnsw.topKStored(v1, e, q).collect().map(_.getLong(0))
    // tombstone two planted twins that DID surface — the serve must change
    val dead = Set(900001L, 900002L)
    assert(dead.subsetOf(before.toSet), s"fixture drift: $dead not in ${before.toSeq}")
    val v2rows = Hnsw.removeStored(v1, e, dead).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getSeq[Long](3)))
    // the ids are gone as NODES and as NEIGHBORS
    assert(!v2rows.exists(r => dead.contains(r._2)), "tombstoned node row survived")
    assert(!v2rows.exists(r => r._4.exists(dead.contains)),
      "tombstoned id still referenced in a neighbor list")
    // bounded repair: a (vec_id, level) row may differ from v1 only if
    // its v1 neighbor list contained a tombstoned id
    val v1rows = v1.collect()
      .map(r => (r.getInt(r.fieldIndex("shard")), r.getLong(r.fieldIndex("vec_id")),
        r.getInt(r.fieldIndex("level")), r.getSeq[Long](r.fieldIndex("neighbors"))))
    val v1Map = v1rows.map(r => (r._2, r._3) -> r._4).toMap
    v2rows.foreach { case (_, id, lev, nbs) =>
      val old = v1Map((id, lev))
      if (!old.exists(dead.contains))
        assert(nbs == old, s"untouched node ($id, $lev) was rewritten: $old -> $nbs")
    }
    // serve from v2: tombstoned ids never surface; the rest of the
    // planted family still does
    Hnsw.removeStored(v1, e, dead)
      .write.mode("overwrite").partitionBy("shard").parquet(s"$dir/v2")
    val alive = e.filter(!col("vec_id").isin(dead.toSeq.map(Long.box): _*))
    val after = Hnsw.topKStored(spark.read.parquet(s"$dir/v2"), alive, q)
      .collect().map(_.getLong(0)).toSet
    assert((after & dead).isEmpty, s"tombstoned id served after takedown: $after")
    assert(Set(0L, 900003L, 900004L, 900005L).subsetOf(after),
      s"surviving planted family missing after takedown: $after")
  }

  test("takedown then day-2 append: the pruned index keeps accepting appends; serve == rebuild-without") {
    import graft.queries.Similarity
    val e = base
    val q = queryVec
    val dir = "/tmp/graft_test/hnsw_takedown_append"
    Hnsw.adjacency(e, dim = q.length)
      .write.mode("overwrite").partitionBy("shard").parquet(s"$dir/v1")
    val dead = Set(7L, 23L)
    Hnsw.removeStored(spark.read.parquet(s"$dir/v1"), e, dead)
      .write.mode("overwrite").partitionBy("shard").parquet(s"$dir/v2")
    val alive = e.filter(!col("vec_id").isin(dead.toSeq.map(Long.box): _*))
    val batch = Similarity.appendBatch(e)
    val allAlive = alive.unionByName(batch)
    Hnsw.appendStored(spark.read.parquet(s"$dir/v2"), allAlive, batch, dim = q.length)
      .write.mode("overwrite").partitionBy("shard").parquet(s"$dir/v3")
    val served = Hnsw.topKStored(spark.read.parquet(s"$dir/v3"), allAlive, q)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(!served.exists(t => dead.contains(t._1)), s"tombstoned id reappeared: $served")
    // a LOCAL repair cannot promise bit-equal graphs to a from-scratch
    // rebuild without the ids — but the SERVE must agree: same top-k
    val rebuilt = Hnsw.topK(allAlive, q)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(served == rebuilt, s"takedown+append serve $served != rebuild-without serve $rebuilt")
  }

  test("guards fail loudly: dim mismatch, out-of-order append ids, serve missing a referenced vector") {
    import graft.queries.Similarity
    val e = base
    // a query of the wrong dimension must error, never return an empty
    // or truncated-cosine result. The diagnostic is DEFERRED into the
    // shard tasks (plan construction runs no hidden jobs), so it
    // surfaces at collect(), wrapped by Spark's task-failure chain.
    val shortQ = Array.fill(10)(0.5)
    val ex1 = intercept[Exception] { Hnsw.topK(e, shortQ).collect() }
    val chain1 = Iterator.iterate[Throwable](ex1)(_.getCause)
      .takeWhile(_ != null).map(String.valueOf).mkString("; ")
    assert(chain1.contains("dim"), chain1)
    // RAGGED wholesale mismatch: a corpus of mixed wrong lengths (none
    // matching the caller) must still fail loudly — not return an empty
    // top-k because the sizes disagree with each other
    val ragged = (0L until 64L).map(i =>
      (i, Array.fill(if (i % 5 == 0) 7 else 32)(0.5))).toDF("vec_id", "ed")
    val exR = intercept[Exception] { Hnsw.topK(ragged, shortQ).collect() }
    val chainR = Iterator.iterate[Throwable](exR)(_.getCause)
      .takeWhile(_ != null).map(String.valueOf).mkString("; ")
    assert(chainR.contains("dim"), chainR)
    // right-LENGTH rows whose slots are null are generally malformed,
    // not a dim mismatch: tolerated, the result is just empty
    val nullSlots = (0L until 16L)
      .map(i => (i, Array.fill(10)(null.asInstanceOf[java.lang.Double])))
      .toDF("vec_id", "ed")
    assert(Hnsw.topK(nullSlots, shortQ).collect().isEmpty)
    val g = Hnsw.build(e.limit(50).as[(Long, Array[Double])].collect())
    val ex2 = intercept[IllegalArgumentException] { Hnsw.search(g, shortQ) }
    assert(ex2.getMessage.contains("dim"), ex2.getMessage)
    // append ids at/below the base break both rebuild parity and the
    // stored entry derivation — enforced, not assumed
    val ex3 = intercept[IllegalArgumentException] {
      Hnsw.append(g, Array((0L, queryVec)))
    }
    assert(ex3.getMessage.contains("AFTER the base"), ex3.getMessage)
    // a serve whose vectors relation lost an indexed id must name the
    // invariant, not throw a bare map-lookup error
    val dir = "/tmp/graft_test/hnsw_guard"
    Hnsw.adjacency(e, dim = queryVec.length)
      .write.mode("overwrite").partitionBy("shard").parquet(dir)
    val ex4 = intercept[Exception] {
      Hnsw.topKStored(spark.read.parquet(dir),
        e.filter(col("vec_id") % 7 =!= 0), queryVec).collect()
    }
    assert(ex4.getMessage != null &&
      (ex4.getMessage.contains("no vector row") ||
        String.valueOf(ex4.getCause).contains("no vector row")), ex4.toString)
  }

  test("malformed vectors are excluded, never fatal; zero-norm rows cannot poison the walk") {
    val dim = queryVec.length
    val bad = Seq(
      (800001L, Array.fill(dim - 3)(0.5)), // wrong length
      (800002L, Array.fill(dim)(0.0))      // zero norm (valid, cos = 0)
    ).toDF("vec_id", "ed")
    val e = base.unionByName(bad)
    val top = Hnsw.topK(e, queryVec).collect()
    assert(top.length == 10)
    assert(!top.map(_.getLong(0)).contains(800001L), "wrong-length vector surfaced")
    // determinism across runs
    val again = Hnsw.topK(e, queryVec).collect()
    assert(top.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      again.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }
}
