package graft

import org.apache.spark.sql.functions._

/** Properties for the oracle-exempt similarity ops. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("dedup_simhash: near-identical docs are close in Hamming distance, random pairs are not") {
    // corpus: originals + a perturbed copy of doc 0 (one token changed)
    val hashes = SparkEntry.queries("dedup_simhash")(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    val doc0 = Tables.t(spark, sfDir, "documents")
      .filter(col("doc_id") === 0).select("text").as[String].head()
    val perturbed = doc0.split(" ").drop(1).mkString(" ") // drop first token
    val twoDocs = Seq((0L, doc0), (1L, perturbed)).toDF("doc_id", "text")
    twoDocs.createOrReplaceTempView("sim_docs")
    // recompute simhash for the pair through the same expression path
    val docs = twoDocs
      .select(col("doc_id"),
        explode(expr("filter(split(lower(text), '[^a-z0-9]+'), t -> t <> '')")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map(b =>
      sum(when(expr(s"(h >> $b) & 1") === 1, 1).otherwise(-1)).as(s"s$b"))
    val packed = (0 until 64)
      .map(b => expr(s"IF(s$b > 0, shiftleft(CAST(1 AS BIGINT), $b), CAST(0 AS BIGINT))"))
      .reduce(_ + _)
    val two = docs.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .withColumn("simhash", packed).select("doc_id", "simhash")
      .as[(Long, Long)].collect().toMap

    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val nearDist = hamming(two(0L), two(1L))
    assert(nearDist <= 12, s"near-dup pair at Hamming distance $nearDist")
    // random far pair from the corpus
    val far = hamming(hashes(1L), hashes(2L))
    assert(far > nearDist, s"distinct docs ($far) should be farther than near-dups ($nearDist)")
    assert(two(0L) == hashes(0L), "pipeline and spec must agree on doc 0's simhash")
  }

  test("sim_ann_lsh: query is its own top hit; candidates share the query bucket") {
    val rows = SparkEntry.queries("sim_ann_lsh")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val top = rows.head
    assert(top.getAs[Long]("vec_id") == 0L, "query vector must rank first")
    assert(math.abs(top.getAs[Double]("cos") - 1.0) < 1e-6)
    val buckets = rows.map(_.getAs[Int]("bucket")).distinct
    assert(buckets.length == 1, "all candidates must come from the query's bucket")
  }

  test("sim_ann_lsh: bucketing partitions the corpus; native bucket == composed HOF") {
    // recompute buckets through the composed higher-order-function form —
    // the value contract the native lsh_bucket kernel must reproduce
    graft.functions.GraftFunctions.register(spark)
    val planes = graft.queries.Similarity.hyperplanes(8, 64)
    val e = Tables.t(spark, sfDir, "embeddings")
      .withColumn("ed", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("planes", typedLit(planes))
      .withColumn("bucket", expr(
        "aggregate(transform(planes, (p, i) -> " +
          "IF(aggregate(zip_with(ed, p, (x, y) -> x * y), 0D, (acc, v) -> acc + v) > 0, " +
          "shiftleft(1, i), 0)), 0, (acc, v) -> acc + v)"))
      .withColumn("native_bucket", call_udf("lsh_bucket", col("ed"), typedLit(planes)))
    val mismatch = e.filter(not(col("bucket") <=> col("native_bucket"))).count()
    assert(mismatch == 0, s"$mismatch vectors bucket differently native vs composed")
    val counts = e.groupBy("bucket").count().collect()
    assert(counts.length > 16, s"expected a spread over buckets, got ${counts.length}")
    val total = counts.map(_.getLong(1)).sum
    assert(total == e.count())
  }

  test("sim_ann_ivf_trained: self-hit and planted near-duplicates survive the trained probe") {
    // plant 5 tiny perturbations of the query vector: k-means assigns them
    // to the query's cell (the perturbation is far below any cell margin),
    // so a correct train→assign→probe pipeline MUST return them on top
    graft.functions.GraftFunctions.register(spark)
    val base = Tables.t(spark, sfDir, "embeddings")
      .withColumn("ed", col("embedding").cast("array<double>"))
      .select(col("vec_id"), col("ed"))
    val planted = base.filter(col("vec_id") === 0)
      .crossJoin(Seq(1, 2, 3, 4, 5).toDF("i"))
      .select((col("i") + 900000L).as("vec_id"),
        expr("transform(ed, x -> x + i * 0.0001D)").as("ed"))
    val corpus = base.unionByName(planted)
    val cents = graft.ops.KMeans.train(
      corpus, "ed", graft.ops.KMeans.seedById(corpus, "vec_id", "ed", 16, 64), maxIters = 3)
    assert(cents.length == 16 && cents.forall(_.length == 64))
    val top = graft.queries.Similarity
      .ivfTrainedTopK(corpus, cents, queryId = 0L, nProbe = 2)
      .collect()
    val ids = top.map(_.getAs[Long]("vec_id")).toSet
    val expected = Set(0L, 900001L, 900002L, 900003L, 900004L, 900005L)
    assert(expected.subsetOf(ids),
      s"planted near-dups missing from trained-IVF top-k: ${expected.diff(ids)} in $ids")
    val self = top.find(_.getAs[Long]("vec_id") == 0L).get
    assert(math.abs(self.getAs[Double]("cos") - 1.0) < 1e-6, "query must self-hit at cos 1")
  }

  test("emb_kmeans: planted twin clusters recover exactly and the fit improves on the seed") {
    // two tight clusters on orthogonal axes, ids interleaved so the
    // by-id seeding starts with one seed in each — Lloyd's must separate
    // them perfectly (the margin dwarfs the jitter)
    graft.functions.GraftFunctions.register(spark)
    val dim = 64
    def jittered(axis: Int, i: Int): Seq[Double] =
      (0 until dim).map(j =>
        (if (j == axis) 1.0 else 0.0) + (if (j == 10 + (i % 3)) 0.01 * i else 0.0))
    val vecs = (0 until 40).map(i => (i.toLong, jittered(if (i % 2 == 0) 0 else 1, i)))
    val e = vecs.toDF("vec_id", "ed")
    val seed = graft.ops.KMeans.seedById(e, "vec_id", "ed", k = 2, dim = dim)
    val trained = graft.ops.KMeans.train(e, "ed", seed, maxIters = 5)
    def inertia(cents: Array[Array[Double]]): Double =
      vecs.map { case (_, v) =>
        cents.map(c => v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum).min
      }.sum
    assert(inertia(trained) <= inertia(seed) + 1e-12,
      s"Lloyd's must not worsen the objective: ${inertia(trained)} vs ${inertia(seed)}")
    val assigned = e.withColumn("cluster",
        element_at(call_udf("pq_encode", col("ed"),
          typedLit(trained.map(_.toSeq).toSeq), lit(dim), lit(2)), 1))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cluster"))
    val byAxis = assigned.groupBy { case (id, _) => id % 2 }.view.mapValues(_.map(_._2).toSet)
    assert(byAxis(0L).size == 1 && byAxis(1L).size == 1 && byAxis(0L) != byAxis(1L),
      s"planted clusters not separated: $byAxis")
  }

  test("emb_kmeans driver key: every vector assigned exactly once, ids in range") {
    val rows = SparkEntry.queries("emb_kmeans")(spark, sfDir).collect()
    val n = Tables.t(spark, sfDir, "embeddings").count()
    assert(rows.length.toLong == n, s"${rows.length} assignments for $n vectors")
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == rows.length)
    val cl = rows.map(_.getAs[Int]("cluster"))
    assert(cl.forall(c => c >= 0 && c < 8), "cluster id out of [0, k)")
    assert(cl.distinct.length > 1, "degenerate single-cluster fit")
  }

  test("obs_cluster_quality: k-bounded report consistent with emb_kmeans; metric sane on planted data") {
    val rep = SparkEntry.queries("obs_cluster_quality")(spark, sfDir).collect()
    assert(rep.length <= 8 && rep.nonEmpty)
    val sizes = rep.map(r => r.getAs[Int]("cluster") -> r.getAs[Long]("n")).toMap
    // shared fit memo ⇒ the report's cluster sizes must equal the
    // assignment table's group counts exactly
    val fromAssign = SparkEntry.queries("emb_kmeans")(spark, sfDir).collect()
      .groupBy(_.getAs[Int]("cluster")).view.mapValues(_.length.toLong).toMap
    assert(sizes == fromAssign, s"report $sizes vs assignment $fromAssign")
    rep.foreach { r =>
      val (m, no, db) = (r.getAs[Double]("mean_l2"),
        r.getAs[Double]("nearest_other"), r.getAs[Double]("db_ratio"))
      assert(m >= 0.0 && no > 0.0, s"degenerate row $r")
      assert(math.abs(db - m / no) < 1e-4, s"ratio drifted from its legs: $r")
    }
    // metric semantics on planted separated clusters: compactness must
    // beat separation (the report's whole point is telling these apart)
    val dim = 64
    def axis(a: Int, i: Int): Seq[Double] =
      (0 until dim).map(j => (if (j == a) 1.0 else 0.0) + (if (j == 20 + (i % 3)) 0.005 * i else 0.0))
    val vecs = (0 until 30).map(i => (i.toLong, axis(if (i % 2 == 0) 0 else 1, i)))
    val e = vecs.toDF("vec_id", "ed")
    val cents = graft.ops.KMeans.train(e, "ed",
      graft.ops.KMeans.seedById(e, "vec_id", "ed", k = 2, dim = dim), maxIters = 5)
    def l2(a: Seq[Double], b: Seq[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val separation = l2(cents(0).toSeq, cents(1).toSeq)
    val compactness = vecs.map { case (_, v) => cents.map(c => l2(v, c.toSeq)).min }.sum / vecs.size
    assert(compactness < separation,
      s"planted clusters must be compact vs separated: $compactness >= $separation")
  }

  test("dedup_simhash_pairs recovers most planted near-dups via banding") {
    val pairs = SparkEntry.queries("dedup_simhash_pairs")(spark, sfDir)
      .as[(Long, Long)].collect().toSet
    val planted = Tables.t(spark, sfDir, "documents")
      .filter(col("doc_id") % 11 === 0).select("doc_id")
      .collect().map(_.getLong(0))
      .map(id => (id, id + 300000L)).toSet
    val recovered = planted.intersect(pairs)
    assert(recovered.size >= (planted.size * 0.8).toInt,
      s"recovered ${recovered.size}/${planted.size}")
  }

  test("sim_ann_ivf_multiprobe: probing 2 cells never hurts, query self-hits") {
    val single = SparkEntry.queries("sim_ann_ivf")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val multi = SparkEntry.queries("sim_ann_ivf_multiprobe")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(multi.contains(0L), "query vector must self-hit")
    // the 2-cell candidate set is a superset: its worst top-k cosine can
    // only be >= the single-probe worst
    assert(multi.values.min >= single.values.min - 1e-9)
    // scores for vectors returned by both probes agree exactly
    (single.keySet intersect multi.keySet).foreach { v =>
      assert(math.abs(single(v) - multi(v)) < 1e-9)
    }
  }

  test("sim_ann_pq_rerank: exact re-rank self-hits at cos 1 and orders descending") {
    val rows = SparkEntry.queries("sim_ann_pq_rerank")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(rows.head._1 == 0L && math.abs(rows.head._2 - 1.0) < 1e-6,
      s"query vector must re-rank first at cosine 1: ${rows.head}")
    assert(rows.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    // exact scores agree with the brute-force query on shared vec_ids
    val brute = SparkEntry.queries("sim_cosine_topk")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    rows.filter(r => brute.contains(r._1)).foreach { case (v, c) =>
      assert(math.abs(brute(v) - c) < 1e-9, s"vec $v: rerank $c vs brute ${brute(v)}")
    }
  }

  test("sim_ann_ivfpq: planted near-duplicates survive the composed residual index") {
    // the full production shape: coarse cells + residual PQ codes. Tiny
    // perturbations of the query assign to its cell, their residuals
    // quantize to (nearly) its codes, and the per-cell ADC ranking must
    // surface them at the head.
    graft.functions.GraftFunctions.register(spark)
    val base = Tables.t(spark, sfDir, "embeddings")
      .withColumn("ed", col("embedding").cast("array<double>"))
      .select(col("vec_id"), col("ed"))
    val planted = base.filter(col("vec_id") === 0)
      .crossJoin(Seq(1, 2, 3, 4, 5).toDF("i"))
      .select((col("i") + 900000L).as("vec_id"),
        expr("transform(ed, x -> x + i * 0.0001D)").as("ed"))
    val corpus = base.unionByName(planted)
    val top = graft.queries.Similarity
      .ivfpqTopK(corpus, queryId = 0L, nProbe = 2)
      .collect()
    val ids = top.map(_.getAs[Long]("vec_id")).toSet
    val expected = Set(0L, 900001L, 900002L, 900003L, 900004L, 900005L)
    assert(expected.subsetOf(ids),
      s"planted near-dups missing from IVF-PQ top-10: ${expected.diff(ids)} in $ids")
    // the query and its near-dups must share a cell (the probe found them)
    val cells = top.filter(r => expected.contains(r.getAs[Long]("vec_id")))
      .map(_.getAs[Int]("cid")).toSet
    assert(cells.size == 1, s"query and planted near-dups must share a cell: $cells")
  }

  test("sim_ann_pq_trained: planted near-duplicates survive the trained quantizer") {
    // same planted-recall property as the reserved-codebook PQ test: tiny
    // perturbations of the query must encode to the query's codes under
    // the TRAINED per-subspace codebooks and land at the head of the
    // result (ties in approx_dist broken by vec_id)
    graft.functions.GraftFunctions.register(spark)
    val base = Tables.t(spark, sfDir, "embeddings")
      .withColumn("ed", col("embedding").cast("array<double>"))
      .select(col("vec_id"), col("ed"))
    val planted = base.filter(col("vec_id") === 0)
      .crossJoin(Seq(1, 2, 3, 4, 5).toDF("i"))
      .select((col("i") + 900000L).as("vec_id"),
        expr("transform(ed, x -> x + i * 0.0001D)").as("ed"))
    val corpus = base.unionByName(planted)
    val book = graft.queries.Similarity.trainPqCodebook(corpus)
    assert(book.length == 64 && book.forall(_.length == 16))
    val top = graft.queries.Similarity
      .pqTopK(corpus, queryId = 0L, codebook = Some(book))
      .collect()
    val ids = top.map(_.getAs[Long]("vec_id")).toSet
    val expected = Set(0L, 900001L, 900002L, 900003L, 900004L, 900005L)
    assert(expected.subsetOf(ids),
      s"planted near-dups missing from trained-PQ top-10: ${expected.diff(ids)} in $ids")
  }

  test("sim_ann_ivfpq_index: stored probe == in-memory probe, scan prunes to nProbe partitions") {
    // ONE fitted model feeds both paths, so the comparison is exact: the
    // ADC values per (cid, codes) row are identical floats and the
    // ordering is identical — the stored round trip must change NOTHING
    // but where the codes are read from
    graft.functions.GraftFunctions.register(spark)
    val e = Tables.t(spark, sfDir, "embeddings")
      .withColumn("ed", col("embedding").cast("array<double>"))
      .select(col("vec_id"), col("ed"))
    val model = graft.queries.Similarity.ivfpqFit(e)
    val q = model.vectorOf(0L)
    val nProbe = 2
    val inMem = graft.queries.Similarity
      .ivfpqProbe(graft.queries.Similarity.ivfpqCodes(model), model, q, nProbe)
      .collect().toSeq
    val dir = "/tmp/graft_test/ivfpq_index_spec"
    graft.queries.Similarity.ivfpqCodes(model)
      .write.mode("overwrite").partitionBy("cid").parquet(dir)
    val storedDf = graft.queries.Similarity
      .ivfpqProbe(spark.read.parquet(dir), model, q, nProbe)
    val stored = storedDf.collect().toSeq
    assert(stored == inMem,
      s"stored-index probe must equal the in-memory probe\nstored: $stored\nmem:    $inMem")
    // the cid IN (...) filter must reach the file index as a PARTITION
    // filter: the scan lists <= nProbe of the nCells cid= directories
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case f: FileSourceScanExec => Seq(f)
    }.flatten
    val scan = scans(storedDf.queryExecution.executedPlan)
      .filter(_.partitionFilters.nonEmpty)
    assert(scan.nonEmpty, "expected a partition-filtered parquet scan of the stored index")
    val nParts = scan.head.selectedPartitions.partitionCount
    assert(nParts <= nProbe,
      s"stored-index scan must prune to <= $nProbe cid partitions, listed $nParts")
    // and the driver key itself round-trips green
    val driverTop = SparkEntry.queries("sim_ann_ivfpq_index")(spark, sfDir).collect()
    assert(driverTop.length == 10 && driverTop.head.getAs[Long]("vec_id") == 0L,
      s"driver key must self-hit first: ${driverTop.take(3).mkString(",")}")
  }

  test("ivfpqRemoveStored: tombstoned ids never surface; untouched rows byte-identical") {
    // the IVF-PQ takedown twin of Hnsw.removeStored — flat relation, so
    // the contract is simpler: rows gone, everything else untouched
    graft.functions.GraftFunctions.register(spark)
    val e = Tables.t(spark, sfDir, "embeddings")
      .withColumn("ed", col("embedding").cast("array<double>"))
      .select(col("vec_id"), col("ed"))
    val model = graft.queries.Similarity.ivfpqFit(e)
    val q = model.vectorOf(0L)
    val codes = graft.queries.Similarity.ivfpqCodes(model)
    val before = graft.queries.Similarity.ivfpqProbe(codes, model, q, nProbe = 2)
      .collect().map(_.getLong(0))
    val dead = before.drop(1).take(2).toSet // two real hits, not the self-hit
    val pruned = graft.queries.Similarity.ivfpqRemoveStored(codes, dead)
    assert(pruned.filter(col("vec_id").isin(dead.toSeq.map(Long.box): _*)).isEmpty,
      "tombstoned row survived the takedown rewrite")
    // every surviving row is byte-identical (no repair needed: no edges)
    val prunedRows = pruned.collect().map(r => (r.getLong(0), r.get(1), r.getSeq[Int](2))).toSet
    val expect = codes.collect().map(r => (r.getLong(0), r.get(1), r.getSeq[Int](2)))
      .filterNot(r => dead.contains(r._1)).toSet
    assert(prunedRows == expect)
    val after = graft.queries.Similarity.ivfpqProbe(pruned, model, q, nProbe = 2)
      .collect().map(_.getLong(0)).toSet
    assert((after & dead).isEmpty, s"tombstoned id served after takedown: $after")
    assert(after.contains(0L), "self-hit must survive an unrelated takedown")
  }

  test("sim_ann_ivfpq_batch equals the single-probe path bit-for-bit per query") {
    // ONE fitted model feeds both paths. The single probe scores through a
    // driver-built literal ADC table (m lookups per row); the batch probe
    // scores through the pq_adc kernel from (residual, codes) directly —
    // same per-subspace l2 sums in the same accumulation order, so the
    // distances must be IDENTICAL doubles, not merely close.
    graft.functions.GraftFunctions.register(spark)
    val e = Tables.t(spark, sfDir, "embeddings")
      .withColumn("ed", col("embedding").cast("array<double>"))
      .select(col("vec_id"), col("ed"))
    val model = graft.queries.Similarity.ivfpqFit(e)
    val codes = graft.queries.Similarity.ivfpqCodes(model)
    val qids = Seq(0L, 7L, 23L)
    val nProbe = 2
    val queries = model.assigned.filter(col("vec_id").isin(qids.map(Long.box): _*))
      .select(col("vec_id").as("qid"), col("ed").as("qed"))
    val batch = graft.queries.Similarity
      .ivfpqBatchProbe(codes, model, queries, nProbe)
      .collect()
      .groupBy(_.getAs[Long]("qid"))
    assert(batch.keySet == qids.toSet, s"batch must answer every query, got ${batch.keySet}")
    qids.foreach { qid =>
      val single = graft.queries.Similarity
        .ivfpqProbe(codes, model, model.vectorOf(qid), nProbe)
        .collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cid"), r.getAs[Double]("approx_dist")))
        .toSeq
      val got = batch(qid)
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cid"), r.getAs[Double]("approx_dist")))
        .toSeq
      assert(got == single,
        s"qid=$qid batch/single divergence\nbatch:  $got\nsingle: $single")
    }
    // every query must self-hit first; its ADC distance is the
    // quantization error (residual vs its own codes), not 0 — the
    // bit-for-bit batch==single pin above is the exactness check
    qids.foreach { qid =>
      val first = batch(qid).head
      assert(first.getAs[Long]("vec_id") == qid,
        s"qid=$qid must self-hit first, got $first")
      assert(first.getAs[Double]("approx_dist") >= 0.0, s"ADC distances are non-negative: $first")
    }
  }

  test("sim_ann_ivfpq_serve: stored batch == in-memory batch; DPP prunes the scan") {
    // the composed serving shape: a query batch against the STORED
    // cid-partitioned index. Under one model the stored probe must be
    // byte-identical to the in-memory batch — and the scan must read only
    // the probed cells, pruned DYNAMICALLY (the batch's cells live in the
    // data; no driver-side IN list exists at plan time)
    graft.functions.GraftFunctions.register(spark)
    val e = Tables.t(spark, sfDir, "embeddings")
      .withColumn("ed", col("embedding").cast("array<double>"))
      .select(col("vec_id"), col("ed"))
    val model = graft.queries.Similarity.ivfpqFit(e)
    val qids = Seq(0L, 7L, 23L)
    val nProbe = 2
    val queries = model.assigned.filter(col("vec_id").isin(qids.map(Long.box): _*))
      .select(col("vec_id").as("qid"), col("ed").as("qed"))
    val inMem = graft.queries.Similarity
      .ivfpqBatchProbe(graft.queries.Similarity.ivfpqCodes(model), model, queries, nProbe)
      .collect().toSeq
    val dir = "/tmp/graft_test/ivfpq_serve_spec"
    graft.queries.Similarity.ivfpqCodes(model)
      .write.mode("overwrite").partitionBy("cid").parquet(dir)
    val storedDf = graft.queries.Similarity
      .ivfpqBatchProbe(spark.read.parquet(dir), model, queries, nProbe)
    val stored = storedDf.collect().toSeq
    assert(stored == inMem,
      s"stored-batch probe must equal the in-memory batch\nstored: $stored\nmem:    $inMem")
    // the exact cells the batch probes: per query, the nProbe nearest
    // centroids (same (cdist, cid) tie-break as the probe expression) —
    // NOT the cells surviving to the top-k results, which can be fewer
    val probedCells = qids.flatMap { qid =>
      val q = model.vectorOf(qid)
      model.coarse.zipWithIndex
        .map { case (c, i) => (graft.functions.VecAlg.l2DistArr(q, c), i) }
        .sortBy(identity).take(nProbe).map(_._2)
    }.distinct.size
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // query stages are LEAF nodes — collect must descend into their plans
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
    }.flatten
    val scan = scans(storedDf.queryExecution.executedPlan)
      .filter(_.partitionFilters.nonEmpty)
    assert(scan.nonEmpty,
      s"expected a dynamically partition-filtered scan of the stored index:\n" +
        storedDf.queryExecution.executedPlan)
    assert(scan.head.partitionFilters.exists(
        _.find(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression]).isDefined),
      s"the cid filter must be DYNAMIC (no static IN list exists for a batch): ${scan.head.partitionFilters}")
    // the scan's own metric counts the partitions actually read after
    // dynamic pruning (selectedPartitions only reflects static filters)
    val nParts = scan.head.metrics("numPartitions").value
    assert(nParts == probedCells && nParts <= qids.size * nProbe,
      s"DPP must prune the scan to the $probedCells probed cells, read $nParts")
    // and the driver key round-trips green
    val driverTop = SparkEntry.queries("sim_ann_ivfpq_serve")(spark, sfDir).collect()
    assert(driverTop.length == qids.size * 10,
      s"driver key must return 10 rows per query, got ${driverTop.length}")
  }

  test("trainPqCodebook degrades past a damaged row among the first nCent seeds") {
    // one null-slot vector INSIDE the seed window (vec_id 3 < nCent = 16):
    // seeding must skip it for the next valid row — not NPE the collect,
    // not fail the require — and the trained index must still recover the
    // planted near-duplicates (the damaged row itself encodes to NULL
    // codes and drops out of the candidate set)
    graft.functions.GraftFunctions.register(spark)
    val base = Tables.t(spark, sfDir, "embeddings")
      .withColumn("ed", col("embedding").cast("array<double>"))
      .select(col("vec_id"), col("ed"))
    val planted = base.filter(col("vec_id") === 0)
      .crossJoin(Seq(1, 2, 3).toDF("i"))
      .select((col("i") + 910000L).as("vec_id"),
        expr("transform(ed, x -> x + i * 0.0001D)").as("ed"))
    val damaged = base.unionByName(planted)
      .withColumn("ed",
        when(col("vec_id") === 3,
          expr("transform(ed, (x, i) -> IF(i = 7, CAST(NULL AS DOUBLE), x))"))
          .otherwise(col("ed")))
    val book = graft.queries.Similarity.trainPqCodebook(damaged)
    assert(book.length == 64 && book.forall(_.length == 16))
    // the skipped seed means centroid c of subspace j seeds from the
    // (nCent+1)-th valid row at position nCent-1 — just assert recall holds
    val top = graft.queries.Similarity
      .pqTopK(damaged, queryId = 0L, codebook = Some(book))
      .collect()
    val ids = top.map(_.getAs[Long]("vec_id")).toSet
    val expected = Set(0L, 910001L, 910002L, 910003L)
    assert(expected.subsetOf(ids),
      s"planted near-dups missing after damaged-seed degradation: ${expected.diff(ids)} in $ids")
    assert(!ids.contains(3L), "the damaged row must drop out, not quantize garbage")
  }

  test("emb_normalize: unit vectors have norm 1") {
    val rows = SparkEntry.queries("emb_normalize")(spark, sfDir).collect()
    rows.foreach(r => assert(math.abs(r.getAs[Double]("unit_norm") - 1.0) <= 1e-6))
  }

  test("sim_ann_pq: the query vector self-hits at approx distance 0 and ranks first") {
    // vec 0 is in the codebook, so each of its subvectors quantizes to
    // itself (distance 0) and the ADC sum is exactly 0 — any header
    // misalignment, slicing bug, or code/dtab join mismatch breaks this
    val rows = SparkEntry.queries("sim_ann_pq")(spark, sfDir).collect()
    assert(rows.length == 10)
    assert(rows.head.getAs[Long]("vec_id") == 0L)
    assert(rows.head.getAs[Double]("approx_dist") == 0.0)
    // approx distances come out sorted ascending
    val dists = rows.map(_.getAs[Double]("approx_dist")).toSeq
    assert(dists == dists.sorted)
  }

  test("sim_ann_pq: planted near-duplicates of the query dominate the PQ top-k") {
    // The driver embeddings are unstructured random vectors, where 64-dim
    // pairwise distances concentrate — recall@10 vs exact L2 is ≈ chance
    // for ANY quantizer there (measured 2-3/10), so that is not a useful
    // property. What PQ MUST do is keep genuinely-near vectors: plant 5
    // tiny perturbations of vec 0; they quantize to vec 0's codes, get
    // ADC distance ≈ 0, and have to occupy the top of the result.
    import spark.implicits._
    val base = Tables.t(spark, sfDir, "embeddings")
      .withColumn("ed", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .select(col("vec_id"), col("ed"))
    val planted = base.filter(col("vec_id") === 0)
      .crossJoin(Seq(1, 2, 3, 4, 5).toDF("i"))
      .select((col("i") + 900000L).as("vec_id"),
        expr("transform(ed, x -> x + i * 0.0001D)").as("ed"))
    val top = graft.queries.Similarity
      .pqTopK(base.unionByName(planted), queryId = 0L)
      .collect()
    val ids = top.map(_.getAs[Long]("vec_id")).toSet
    val expected = Set(0L, 900001L, 900002L, 900003L, 900004L, 900005L)
    assert(expected.subsetOf(ids),
      s"planted near-dups missing from PQ top-10: ${expected.diff(ids)} in $ids")
    // and they sit at the head: the 6 smallest approx distances
    val head = top.sortBy(_.getAs[Double]("approx_dist")).take(6)
      .map(_.getAs[Long]("vec_id")).toSet
    assert(head == expected, s"near-dups must rank first, got $head")
  }

  test("sim_ann_ivfpq_append: frozen-model append == full re-encode; day-2 twin recovered") {
    // the index lifecycle's last leg: day-2 vectors fold into the STORED
    // index with the model frozen — no refit, no rewrite — and probes see
    // old + new through the same pruned path
    graft.functions.GraftFunctions.register(spark)
    val S = graft.queries.Similarity
    val e = Tables.t(spark, sfDir, "embeddings")
      .withColumn("ed", col("embedding").cast("array<double>"))
      .select(col("vec_id"), col("ed"))
    val model = S.ivfpqFit(e)
    val dir = "/tmp/graft_test/ivfpq_append_spec"
    S.ivfpqCodes(model).write.mode("overwrite").partitionBy("cid").parquet(dir)
    val baseFiles = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("cid=")).flatMap(_.listFiles()).map(_.getPath).toSet
    val batch2 = S.appendBatch(e)
    S.ivfpqAppendToIndex(model, batch2, dir)
    val stored = spark.read.parquet(dir)
    // 1. the append added exactly the encodable batch, rewrote nothing
    assert(stored.count() == S.ivfpqCodes(model).count() + batch2.count(),
      "append must add exactly the batch's rows")
    val afterDirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(afterDirs.forall(_.startsWith("cid=")),
      s"appended files must land inside cid= partition dirs: ${afterDirs.mkString(",")}")
    assert(baseFiles.forall(p => new java.io.File(p).exists()),
      "append must not rewrite or drop any stored base file")
    // 2. frozen-model determinism: the stored table == one re-encode of
    //    base ∪ batch under the same model, bit-for-bit (ivfpqEncode and
    //    ivfpqCodes share kernels and accumulation order)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("vec_id"), r.getAs[Number]("cid").intValue(),
        r.getAs[Seq[Int]]("codes").toList)
    val storedSet = stored.collect().map(key).toSet
    val reencoded = S.ivfpqEncode(model, e.unionByName(batch2)).collect().map(key).toSet
    assert(storedSet == reencoded,
      s"stored index must equal a full frozen-model re-encode " +
        s"(missing: ${(reencoded -- storedSet).take(3)}, extra: ${(storedSet -- reencoded).take(3)})")
    // 3. query 0's planted day-2 twin surfaces in the stored probe's top-k
    val top = S.ivfpqProbe(stored, model, model.vectorOf(0L), nProbe = 2).collect()
    val ids = top.map(_.getAs[Long]("vec_id")).toSet
    assert(ids.contains(0L) && ids.contains(S.AppendIdOffset),
      s"top-k must hold the query and its appended twin ${S.AppendIdOffset}: $ids")
    // 4. the probe still partition-prunes the grown index
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case f: FileSourceScanExec => Seq(f)
    }.flatten
    val probeDf = S.ivfpqProbe(stored, model, model.vectorOf(0L), nProbe = 2)
    probeDf.collect()
    val scan = scans(probeDf.queryExecution.executedPlan).filter(_.partitionFilters.nonEmpty)
    assert(scan.nonEmpty && scan.head.selectedPartitions.partitionCount <= 2,
      "probe over the appended index must still prune to <= nProbe partitions")
    // and the driver key round-trips green with the twin in its rows
    val driverTop = SparkEntry.queries("sim_ann_ivfpq_append")(spark, sfDir).collect()
    assert(driverTop.map(_.getAs[Long]("vec_id")).contains(S.AppendIdOffset),
      s"driver key must surface the appended twin: ${driverTop.mkString(",")}")
  }

  test("sim_ann_ivfpq_cold: a loaded model probes the stored index identically to the fit") {
    // model persistence closes the serving lifecycle: after day 1 nothing
    // needs the fitting process — the model parquet IS the model
    graft.functions.GraftFunctions.register(spark)
    val S = graft.queries.Similarity
    val e = Tables.t(spark, sfDir, "embeddings")
      .withColumn("ed", col("embedding").cast("array<double>"))
      .select(col("vec_id"), col("ed"))
    val model = S.ivfpqFit(e)
    val dir = "/tmp/graft_test/ivfpq_cold_spec"
    S.ivfpqCodes(model).write.mode("overwrite").partitionBy("cid").parquet(s"$dir/index")
    S.ivfpqWriteModel(model, s"$dir/model")
    val served = S.ivfpqLoadModel(spark, s"$dir/model")
    // the artifact round-trips bit-exactly (doubles through parquet)
    assert(served.m == model.m && served.subDim == model.subDim
      && served.nCent == model.nCent)
    assert(served.coarse.length == model.coarse.length
      && served.coarse.zip(model.coarse).forall { case (a, b) => a.sameElements(b) },
      "coarse centroids must round-trip bit-exactly")
    assert(served.book.zip(model.book).forall { case (a, b) => a.sameElements(b) },
      "codebook must round-trip bit-exactly")
    // cold probe == warm probe on the same stored codes
    val q = model.vectorOf(0L)
    val stored = spark.read.parquet(s"$dir/index")
    val warm = S.ivfpqProbe(stored, model, q, nProbe = 2).collect().toSeq
    val cold = S.ivfpqProbe(stored, served, q, nProbe = 2).collect().toSeq
    assert(cold == warm, s"cold probe must equal warm\ncold: $cold\nwarm: $warm")
    // fit-side operations refuse the serving model with a clear message
    intercept[IllegalArgumentException](served.vectorOf(0L))
    intercept[IllegalArgumentException](S.ivfpqCodes(served))
    // but ENCODE works — a cold process can fold day-2 data in too
    val batch = S.appendBatch(e)
    val viaServed = S.ivfpqEncode(served, batch).collect().toSet
    val viaFit = S.ivfpqEncode(model, batch).collect().toSet
    assert(viaServed == viaFit, "frozen-model encode must agree cold vs warm")
    // and the driver key self-hits
    val top = SparkEntry.queries("sim_ann_ivfpq_cold")(spark, sfDir).collect()
    assert(top.nonEmpty && top.head.getAs[Long]("vec_id") == 0L,
      s"cold-serve driver key must self-hit first: ${top.take(3).mkString(",")}")
  }

  test("emb_pca_power: planted dominant direction recovered; centering holds; driver key deterministic") {
    val rnd = new scala.util.Random(7)
    val dim = 16
    val raw = Array.tabulate(dim)(i => math.sin(i + 1.0))
    val un = math.sqrt(raw.map(x => x * x).sum)
    val u = raw.map(_ / un)
    // points = t·u + small noise + a CONSTANT offset: the offset is the
    // centering trap — an uncentered power iteration converges to the
    // mean direction instead of the planted component
    val rows = (0 until 400).map { i =>
      val t = rnd.nextGaussian() * 5
      i.toLong -> Array.tabulate(dim)(j => t * u(j) + rnd.nextGaussian() * 0.1 + 2.0).toSeq
    }
    val df = rows.toDF("vec_id", "ed")
    val tc = graft.ops.Pca.topComponent(df, "ed", dim, iters = 15)
    val cos = math.abs(tc.v.zip(u).map { case (a, b) => a * b }.sum)
    assert(cos > 0.99, s"|cos(v, planted)| = $cos")
    // eigenvalue ≈ planted variance (25) + noise, nowhere near the
    // offset's magnitude — another centering check
    assert(tc.eigenvalue > 15 && tc.eigenvalue < 40, s"eigenvalue ${tc.eigenvalue}")
    val a = SparkEntry.queries("emb_pca_power")(spark, sfDir).collect().toSeq
    val b = SparkEntry.queries("emb_pca_power")(spark, sfDir).collect().toSeq
    assert(a == b, "driver key must be deterministic")
    assert(a.size == 64 && a.forall(!_.anyNull))
  }

  test("dedup_semantic: planted twins all dropped; no surviving same-cell pair is 0.99-close") {
    val res = SparkEntry.queries("dedup_semantic")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val survivors = res.map(_._1).toSet
    assert(survivors.nonEmpty)
    val base = Tables.t(spark, sfDir, "embeddings")
      .selectExpr("vec_id", "cast(embedding as array<double>) AS ed")
      .as[(Long, Seq[Double])].collect().toMap
    // recall through the cell structure is CERTAIN for identical vectors:
    // a twin shares its original's cell and scores cosine exactly 1
    val twinIds = base.keySet.filter(_ % 9 == 0).map(_ + 700000L)
    assert(twinIds.nonEmpty)
    twinIds.foreach(t => assert(!survivors.contains(t), s"planted twin $t survived"))
    // independent verification of the postcondition: within every cell,
    // surviving vectors are pairwise below the 0.99 cosine threshold
    def vec(id: Long): Seq[Double] = base(if (id >= 700000L) id - 700000L else id)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    res.groupBy(_._2).values.foreach { cell =>
      for (Seq((ia, _), (ib, _)) <- cell.toSeq.combinations(2))
        assert(cos(vec(ia), vec(ib)) < 0.99, s"survivors $ia/$ib are near-dups")
    }
  }

  test("semDedupDropped: planted twin inside an OVER-CAP cell is still dropped (sub-split, not skipped)") {
    // 2500 members in one coarse cell — past the 2000 cap, so the round-8
    // code would have skipped the cell entirely and dropped NOTHING here.
    // The sub-split must re-bucket on residual LSH and still catch the
    // planted exact twin.
    val dim = 4
    val rng = new scala.util.Random(7)
    val members = (0 until 2500).map { i =>
      val v = (0 until dim).map(j => (if (j == 0) 1.0 else 0.0) + rng.nextGaussian() * 0.5)
      (i.toLong, v, 0)
    }
    val twin = (900000L, members(17)._2, 0)
    val assigned = (members :+ twin).toDF("vec_id", "ed", "cid")
    val dropped = graft.ops.Dedup.semDedupDropped(
      assigned, Seq(Seq(1.0, 0.0, 0.0, 0.0)), dim)
      .as[Long].collect().toSet
    assert(dropped.contains(900000L),
      "planted twin inside an over-cap cell must be dropped by the sub-split pass")
    // the drop rule keeps the lower id of a close pair: id 0 has no lower
    // counterpart, so it must always survive
    assert(!dropped.contains(0L))
  }

  test("semDedupDropped: NEAR twins in an over-cap cell survive the sub-split (multi-probe recall ≥ 80%)") {
    // the sub-split's documented loss mode: a near-but-not-exact pair can
    // be cut by a level-1 hyperplane. Multi-probe must recover most of
    // them. 2500 members force the split; 50 planted near twins
    // (cos ≈ 0.995 by construction: v' = v + 0.1·|v|·u) of members
    // 100..149 must be dropped at ≥80% recall. Fixed seeds everywhere —
    // the outcome is deterministic, not flaky.
    val dim = 8
    val rng = new scala.util.Random(11)
    val members = (0 until 2500).map { i =>
      val v = (0 until dim).map(j => (if (j == 0) 1.0 else 0.0) + rng.nextGaussian() * 0.5)
      (i.toLong, v, 0)
    }
    val twins = (0 until 50).map { i =>
      val v = members(100 + i)._2
      val nv = math.sqrt(v.map(x => x * x).sum)
      val u = (0 until dim).map(_ => rng.nextGaussian())
      val nu = math.sqrt(u.map(x => x * x).sum)
      val vp = v.zip(u).map { case (x, y) => x + 0.1 * nv * y / nu }
      (800000L + i, vp, 0)
    }
    val assigned = (members ++ twins).toDF("vec_id", "ed", "cid")
    val dropped = graft.ops.Dedup.semDedupDropped(
      assigned, Seq(Seq(1.0) ++ Seq.fill(dim - 1)(0.0)), dim, threshold = 0.99)
      .as[Long].collect().toSet
    // only count twins that really are over-threshold (the perturbation
    // bound makes ~all of them, but compute it honestly)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val eligible = twins.filter(t => cos(t._2, members((t._1 - 800000L).toInt + 100)._2) >= 0.99)
    assert(eligible.size >= 40, s"fixture degenerated: only ${eligible.size} twins over threshold")
    val found = eligible.count(t => dropped.contains(t._1))
    assert(found >= (eligible.size * 8) / 10,
      s"near-twin recall through the sub-split: $found of ${eligible.size}")
  }

  test("semDedupDropped: a degenerate leaf (identical vectors beyond any split) exact-collapses linearly") {
    // 2500 IDENTICAL vectors: every sub-split level lands them in the same
    // leaf (same residual), leaving it over cap — the exact-collapse
    // fallback must keep exactly the minimum id and drop the rest, at any
    // size, without a pairwise pass
    val v = Seq(1.0, 2.0, 3.0, 4.0)
    val assigned = (0 until 2500).map(i => (i.toLong, v, 0)).toDF("vec_id", "ed", "cid")
    val dropped = graft.ops.Dedup.semDedupDropped(
      assigned, Seq(Seq(1.0, 2.0, 3.0, 4.0)), 4)
      .as[Long].collect().toSet
    assert(dropped == (1 until 2500).map(_.toLong).toSet,
      s"exact collapse must drop all but id 0; got ${dropped.size} drops")
  }

  test("dedup_image_phash: survivors pairwise > 3 bits apart and exactly the undominated docs") {
    val rows = SparkEntry.queries("dedup_image_phash")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.nonEmpty)
    def bits(h: String): Long = java.lang.Long.parseUnsignedLong(h, 16)
    def ham(a: String, b: String): Int = java.lang.Long.bitCount(bits(a) ^ bits(b))
    for (Seq((ia, ha), (ib, hb)) <- rows.toSeq.combinations(2))
      assert(ham(ha, hb) > 3, s"survivors $ia/$ib are within 3 bits")
    // independent brute-force recheck of the survivor rule: a doc
    // survives iff NO lower-id doc hashes within 3 bits
    val all = Tables.t(spark, sfDir, "documents")
      .filter(col("doc_id") % 3 === 0).select("doc_id").as[Long].collect().sorted
      .map(id => id -> graft.ops.Media.dHashHex(
        graft.ops.Media.gradientPng((8 + id % 24).toInt, (8 + id * 3 % 24).toInt)))
    val surv = rows.map(_._1).toSet
    all.foreach { case (id, h) =>
      val dominated = all.exists { case (j, g) => j < id && ham(g, h) <= 3 }
      assert(surv.contains(id) == !dominated,
        s"doc $id: survivor=${surv.contains(id)} but dominated=$dominated")
    }
  }

  test("simhashCandidates bands=1: full-width mask pairs only exact 64-bit matches") {
    import spark.implicits._
    // (1L << 64) - 1 is ZERO under JVM shift masking — the old mask
    // banded every doc to sig 0, pairing everything (or, capped, nothing)
    val hashes = Seq((1L, 123456789L), (2L, 123456789L), (3L, -987654321L))
      .toDF("doc_id", "simhash")
    val pairs = graft.ops.Dedup.simhashCandidates(hashes, bands = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("sim_ann_ivfpq_filtered: admit-all parity, predicate purity, widened exactness, null flag") {
    graft.functions.GraftFunctions.register(spark)
    val e = Tables.t(spark, sfDir, "embeddings")
      .withColumn("ed", col("embedding").cast("array<double>"))
      .select(col("vec_id"), col("ed"))
    val model = graft.queries.Similarity.ivfpqFit(e)
    val codes = graft.queries.Similarity.ivfpqCodes(model).localCheckpoint()
    val q = model.vectorOf(0L)
    // admit-all: widening factor is exactly nProbe, result == plain probe
    // bit-for-bit (same pq_adc accumulation, same tie-break)
    val plain = graft.queries.Similarity
      .ivfpqProbe(codes, model, q, nProbe = 2).collect().toSeq
    val all = graft.queries.Similarity
      .ivfpqProbeFiltered(codes.withColumn("allowed", lit(true)), model, q, nProbe = 2)
      .collect().toSeq
    assert(all == plain, s"admit-all drifted from the plain probe:\n$all\nvs\n$plain")
    // selective predicate: every hit matches, and because the widening
    // (ceil(2 x 10) capped at 16) probes EVERY cell, the filtered top-k
    // equals the all-cell ADC ranking restricted to matching rows
    val filt = graft.queries.Similarity
      .ivfpqProbeFiltered(codes.withColumn("allowed", col("vec_id") % 10 === 3),
        model, q, nProbe = 2).collect().toSeq
    assert(filt.nonEmpty && filt.forall(_.getAs[Long]("vec_id") % 10 == 3),
      s"non-matching ids surfaced: $filt")
    val brute = graft.queries.Similarity
      .ivfpqProbe(codes, model, q, nProbe = 16, k = Int.MaxValue).collect()
      .filter(_.getAs[Long]("vec_id") % 10 == 3).take(10).toSeq
    assert(filt == brute, s"widened probe missed matching candidates:\n$filt\nvs\n$brute")
    // a null flag is NOT matching — same result as an explicit false
    val withNull = codes.withColumn("allowed",
      when(col("vec_id") % 10 === 3, lit(true)).otherwise(lit(null).cast("boolean")))
    val viaNull = graft.queries.Similarity
      .ivfpqProbeFiltered(withNull, model, q, nProbe = 2).collect().toSeq
    assert(viaNull == filt, "null flag must behave exactly like false")
  }

  test("sim_ann_ivfpq_filtered driver key: deterministic, pure, k-bounded") {
    val a = SparkEntry.queries("sim_ann_ivfpq_filtered")(spark, sfDir).collect().toSeq
    val b = SparkEntry.queries("sim_ann_ivfpq_filtered")(spark, sfDir).collect().toSeq
    assert(a == b, "not deterministic across runs")
    assert(a.nonEmpty && a.size <= 10)
    assert(a.forall(_.getAs[Long]("vec_id") % 3 == 1))
  }
}
