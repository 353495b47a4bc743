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

  test("obs_ann_recall: one row per sampled query, recall in [0,1], floor holds") {
    val rows = SparkEntry.queries("obs_ann_recall")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val nSample = base.filter(col("vec_id") % 97 === 0).count()
    assert(rows.length == nSample, s"${rows.length} report rows for $nSample sampled queries")
    rows.foreach { case (qid, hits, rec) =>
      assert(hits >= 0 && hits <= 10, s"qid $qid hits $hits")
      assert(math.abs(rec - hits / 10.0) < 1e-9)
    }
    // the graph index's whole pitch: high recall on the evaluation report
    val mean = rows.map(_._3).sum / rows.length
    assert(mean >= 0.8, s"mean recall@10 $mean below 0.8: $rows")
  }

  test("guards fail loudly: dim mismatch, out-of-order append ids, serve missing a referenced vector") {
    import graft.queries.Similarity
    val e = base
    // a query of the wrong dimension must error, never return an empty
    // or truncated-cosine result
    val shortQ = Array.fill(10)(0.5)
    val ex1 = intercept[IllegalArgumentException] { Hnsw.topK(e, shortQ).collect() }
    assert(ex1.getMessage.contains("dim"), ex1.getMessage)
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
