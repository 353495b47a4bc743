package graft

import graft.queries.{Llm, Relational}
import org.apache.spark.sql.functions._

/** Properties for the oracle-exempt operators (SURVEY §5.3):
  * approx-distinct relative error, range-partition monotonicity,
  * sample-fraction bounds, and minhash-LSH recall of planted near-dups. */
class OperatorPropertiesSpec extends SparkSpec {

  test("agg_approx_distinct: relative error < 10% vs exact") {
    val rows = SparkEntry.queries("agg_approx_distinct")(spark, sfDir).collect()
    val approx = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Cdx.df(spark, sfDir).groupBy("hostword")
      .agg(countDistinct("urlkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k).toDouble
      assert(math.abs(a - n) / n < 0.10, s"$k: approx $a vs exact $n")
    }
    // the SELF-CHECK columns the driver row carries must agree with the
    // independently computed truth and stay inside the bound
    rows.foreach { r =>
      assert(r.getAs[Long]("exact_urlkeys") == exact(r.getString(0)),
        s"exact column must be the true distinct count: $r")
      assert(r.getAs[Double]("rel_err") < 0.10, s"emitted rel_err out of bound: $r")
    }
  }

  test("agg_hll_merge: merged estimate within 5% of exact, segmentation-invariant") {
    val row = SparkEntry.queries("agg_hll_merge")(spark, sfDir).collect().head
    val est = row.getLong(0).toDouble
    val exact = Cdx.df(spark, sfDir).select("urlkey").distinct().count().toDouble
    assert(math.abs(est - exact) / exact < 0.05, s"merged $est vs exact $exact")
    // the self-check columns in the driver row agree with the truth
    assert(row.getAs[Long]("exact_distinct_urlkeys").toDouble == exact,
      s"exact column must be the true distinct count: $row")
    assert(row.getAs[Double]("rel_err") < 0.05, s"emitted rel_err out of bound: $row")
    // the union lattice: a DIFFERENT segmentation (or none) must converge
    // on the same estimate — that invariance is why sketches are the
    // cross-job/cross-day answer while approx_count_distinct is one-shot
    val single = Cdx.df(spark, sfDir)
      .agg(hll_sketch_estimate(hll_sketch_agg(col("urlkey"), lit(12))))
      .collect().head.getLong(0).toDouble
    assert(math.abs(est - single) / exact < 0.02,
      s"8-segment merge $est vs unsegmented $single should agree closely")
  }

  test("repartition_range: partition key ranges are disjoint and ordered") {
    val rows = SparkEntry.queries("repartition_range")(spark, sfDir)
      .collect() // pid, min_key, max_key, cnt — ordered by pid
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[String]("max_key") <= b.getAs[String]("min_key"),
          s"overlap between partition ${a.getInt(0)} and ${b.getInt(0)}")
      case _ =>
    }
    assert(rows.map(_.getAs[Long]("cnt")).sum == Cdx.df(spark, sfDir).count())
  }

  test("corpus_interleave_sources: any prefix of the order carries sources ~ in weight ratio") {
    // the property the op exists for: a run truncated at any step has
    // consumed the intended mix — check the half-corpus prefix's
    // per-weight-class share against the weight ratio (binomial noise
    // bound, generous)
    val rows = SparkEntry.queries("corpus_interleave_sources")(spark, sfDir)
      .collect() // already pos-ordered
    val n = rows.length
    assert(n > 100)
    val prefix = rows.take(n / 2)
    // weight classes 1/2/3; expected share of the prefix for class w =
    // (docs_w * w) / sum(docs_w * w) — docs per class from the full set
    val byW = rows.groupBy(_.getAs[Int]("weight")).view.mapValues(_.length.toDouble).toMap
    val mass = byW.map { case (w, c) => w -> c * w }
    val total = mass.values.sum
    val got = prefix.groupBy(_.getAs[Int]("weight")).view.mapValues(_.length.toDouble).toMap
    mass.foreach { case (w, m) =>
      val expectShare = m / total
      val gotShare = got.getOrElse(w, 0.0) / prefix.length
      assert(math.abs(gotShare - expectShare) < 0.08,
        f"weight-$w prefix share $gotShare%.3f vs expected $expectShare%.3f")
    }
  }

  test("sample_fraction: count within 4 sigma of expectation, deterministic by seed") {
    val n = Cdx.df(spark, sfDir).count()
    val s1 = SparkEntry.queries("sample_fraction")(spark, sfDir).collect().map(_.getLong(0)).toSeq
    val s2 = SparkEntry.queries("sample_fraction")(spark, sfDir).collect().map(_.getLong(0)).toSeq
    assert(s1 == s2, "same seed must give the same sample")
    val expectMean = n * 0.1
    val sigma = math.sqrt(n * 0.1 * 0.9)
    assert(math.abs(s1.size - expectMean) < 4 * sigma)
  }

  test("dedup_fuzzy_minhash: planted near-dup pairs are recovered") {
    val pairs = SparkEntry.queries("dedup_fuzzy_minhash")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // planted: doc_id % 7 == 0 duplicated as doc_id + 200000 minus first token
    val planted = Tables.t(spark, sfDir, "documents")
      .filter(col("doc_id") % 7 === 0).select("doc_id")
      .collect().map(_.getLong(0))
      .map(id => (id, id + 200000L)).toSet
    val recovered = planted.intersect(pairs)
    // banded LSH is probabilistic per pair, but dropping one token of ~50
    // keeps shingle overlap ~90%+: essentially all planted pairs collide
    assert(recovered.size >= (planted.size * 0.95).toInt,
      s"recovered ${recovered.size}/${planted.size}")
  }

  test("CJK dedup tokenization: planted CJK twins collide in minhash AND winnow candidates; Latin signatures byte-unchanged") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // unsegmented text: no spaces, no ASCII — under the Latin-only rule
    // these docs tokenize to NOTHING and near-dedup silently skips them;
    // per-char tokens turn word-3-shingles into char-3-grams
    def han(seed: Int, n: Int): String =
      (0 until n).map(i => (0x4e00 + ((seed * 131 + i * 13) % 2000)).toChar).mkString
    val base = han(1, 80)
    val twin = base.substring(0, 40) + "改" + base.substring(41) // one-char edit
    val other = han(9, 80)
    val docs = Seq(
      (1L, base), (2L, twin), (3L, other),
      (4L, "an unrelated latin document with several plain english words")
    ).toDF("doc_id", "text")
    val mh = graft.ops.Dedup.minhashCandidates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.contains((1L, 2L)), s"CJK twin pair missing from minhash candidates: $mh")
    val wn = graft.ops.Dedup.winnowCandidates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wn.contains((1L, 2L)), s"CJK twin pair missing from winnow candidates: $wn")
    // the unrelated CJK doc must not pair with the twins in winnowing
    // (winnow fingerprints are exact shared-shingle evidence)
    assert(!wn.contains((1L, 3L)) && !wn.contains((2L, 3L)),
      s"unrelated CJK doc paired: $wn")
    // simhash: the twins are close in Hamming distance, the stranger far
    val sh = docs.filter(col("doc_id") <= 3)
      .selectExpr("doc_id", "simhash64_text(text) AS s")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(2L)) <= 8, s"twin simhash distance ${ham(sh(1L), sh(2L))}")
    assert(ham(sh(1L), sh(3L)) > 12, s"stranger simhash distance ${ham(sh(1L), sh(3L))}")

    // LATIN GOLDENS: the CJK arm must leave pure-Latin signatures
    // byte-identical to the pre-CJK kernels (captured r15, before the
    // TokenAlg change landed) — the whole corpus's stored sketches stay
    // valid across the upgrade
    val s = "The Quick brown fox-jumps over 2 lazy dogs, 42 times! quick brown fox again."
    val g = Seq(s).toDF("text").selectExpr(
      "minhash_sig_text(text, 16, 3) AS mh",
      "winnow_fps_text(text, 3, 4) AS wf",
      "simhash64_text(text) AS sh").head()
    assert(g.getSeq[Long](0) == Seq(-9213327934255662574L, -7489657284875650352L,
      -9092747249416386855L, -7667229316808148878L, -8554148688878529044L,
      -9190863898320566651L, -8502869757821798861L, -6801764170861783050L,
      -8961140093432188753L, -8373399340422865643L, -8547138353482891199L,
      -7256371554161643759L, -8849902322149840065L, -5828306065544254788L,
      -7858350852037593492L, -2389336141369753230L), g.getSeq[Long](0).toString)
    assert(g.getSeq[Long](1) == Seq(345504233276632630L, -4274353001565259909L,
      -5230607506890700381L), g.getSeq[Long](1).toString)
    assert(g.getLong(2) == -6996861889526390540L, g.getLong(2).toString)
  }

  test("dedup_incremental_minhash: stored-index probe == full-batch cross pairs, index side exchange-free") {
    // the incremental probe must find EXACTLY the corpus×new-batch pairs
    // the full-batch self-join would (the stored index changes where
    // signatures come from, never which candidates emerge)
    val inc = SparkEntry.queries("dedup_incremental_minhash")(spark, sfDir)
    val incPairs = inc.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val docs = Tables.t(spark, sfDir, "documents")
    val newBatch = docs.filter(col("doc_id") % 7 === 0)
      .withColumn("doc_id", col("doc_id") + 200000L)
      .withColumn("text", expr("substring(text, instr(text, ' ') + 1)"))
    val cross = graft.ops.Dedup
      .minhashCandidates(docs.unionByName(newBatch), "doc_id", "text")
      .filter(col("a") < 200000L && col("b") >= 200000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(incPairs == cross,
      s"incremental-vs-full divergence: only-inc=${incPairs.diff(cross).take(5)} " +
        s"only-full=${cross.diff(incPairs).take(5)}")
    assert(incPairs.nonEmpty, "planted near-dups must produce cross pairs")
    // the layout's point: the (band, sig)-bucketed index side of the probe
    // join must plan WITHOUT a shuffle — only the new batch moves
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val plan = inc.queryExecution.sparkPlan
    val smj = plan.collect { case j: SortMergeJoinExec => j }
    assert(smj.nonEmpty, s"expected the probe to sort-merge join the index:\n$plan")
    val exchangeFreeSides = smj.map(j =>
      Seq(j.left, j.right).count(_.collect { case e: ShuffleExchangeExec => e }.isEmpty))
    assert(exchangeFreeSides.exists(_ >= 1),
      s"the bucketed index side must not re-shuffle:\n${smj.head}")
  }

  test("agg_approx_quantile: sketch values land within the rank-error bound") {
    val rows = SparkEntry.queries("agg_approx_quantile")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val exact = Tables.events(spark, sfDir)
      .select("event_type", "value").collect()
      .groupBy(_.getString(0)).map { case (k, rs) =>
        k -> rs.map(_.getDouble(1)).sorted }
    rows.foreach { r =>
      val vs = exact(r.getString(0))
      val n = vs.length
      Seq(0.50 -> r.getDouble(1), 0.90 -> r.getDouble(2), 0.99 -> r.getDouble(3))
        .foreach { case (p, v) =>
          assert(vs.contains(v), s"sketch must return an actual data value, got $v")
          // rank of v (count <= v) within n/accuracy (+1 discreteness slack)
          val rank = vs.count(_ <= v)
          val err = math.abs(rank - p * n)
          assert(err <= n / 10000.0 + 1,
            s"${r.getString(0)} p$p: value $v has rank $rank of $n (err $err)")
        }
    }
  }

  test("dedup_incremental_winnow: stored-index probe == full-batch cross pairs, index side exchange-free") {
    val inc = SparkEntry.queries("dedup_incremental_winnow")(spark, sfDir)
    val incPairs = inc.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val docs = Tables.t(spark, sfDir, "documents")
    val newBatch = docs.filter(col("doc_id") % 7 === 0)
      .withColumn("doc_id", col("doc_id") + 300000L)
      .withColumn("text", expr("substring(text, instr(text, ' ') + 1)"))
    val cross = graft.ops.Dedup
      .winnowCandidates(docs.unionByName(newBatch), "doc_id", "text")
      .filter(col("a") < 300000L && col("b") >= 300000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(incPairs == cross,
      s"incremental-vs-full divergence: only-inc=${incPairs.diff(cross).take(5)} " +
        s"only-full=${cross.diff(incPairs).take(5)}")
    // the winnowing guarantee holds through the index: every planted twin
    // shares a >= w+k-1 token run with its original, so EVERY one pairs
    val planted = docs.filter(col("doc_id") % 7 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val missedTwins = planted.filter(id => !incPairs.contains((id, id + 300000L)))
    assert(missedTwins.isEmpty,
      s"winnowing must recover EVERY planted twin through the index; missed $missedTwins")
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val smj = inc.queryExecution.sparkPlan.collect { case j: SortMergeJoinExec => j }
    assert(smj.nonEmpty, "expected the probe to sort-merge join the index")
    assert(smj.exists(j =>
      Seq(j.left, j.right).exists(_.collect { case e: ShuffleExchangeExec => e }.isEmpty)),
      s"the fp-bucketed index side must not re-shuffle:\n${smj.head}")
  }

  test("appendToWinnowIndex folds a batch in; later probes see it") {
    val docs = Tables.t(spark, sfDir, "documents")
    val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.sql("DROP TABLE IF EXISTS graft_winnow_append_test")
    val loc = new org.apache.hadoop.fs.Path(wh, "graft_winnow_append_test")
    if (fs.exists(loc)) fs.delete(loc, true)
    graft.ops.Dedup.writeWinnowIndex(docs, "doc_id", "text", "graft_winnow_append_test")
    def shifted(mod: Int, offset: Long) = docs.filter(col("doc_id") % mod === 0)
      .withColumn("doc_id", col("doc_id") + offset)
      .withColumn("text", expr("substring(text, instr(text, ' ') + 1)"))
    graft.ops.Dedup.appendToWinnowIndex(
      shifted(7, 300000L), "doc_id", "text", "graft_winnow_append_test")
    val probe2 = graft.ops.Dedup.incrementalWinnowCandidates(
      spark, "graft_winnow_append_test", shifted(14, 600000L), "doc_id", "text")
    val pairs = probe2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val vsCorpus = pairs.filter(_._1 < 300000L)
    val vsBatch1 = pairs.filter(p => p._1 >= 300000L && p._1 < 600000L)
    assert(vsCorpus.nonEmpty, "batch2 must pair against the original corpus")
    assert(vsBatch1.nonEmpty, "batch2 must pair against the APPENDED batch1 rows")
    // positional insertInto binding check, like the minhash sibling
    assert(vsBatch1.forall { case (a, _) => (a - 300000L) % 7 == 0 },
      s"appended ids malformed: ${vsBatch1.take(5)}")
  }

  test("incrementalWinnowCandidates: combined bucket cap matches the batch path on a straddling bucket") {
    import spark.implicits._
    // 3 identical docs in the corpus (every fp bucket = 3, passes a cap
    // of 3 at build time) + 2 identical batch docs carrying the same fps:
    // the COMBINED bucket is 5 — the batch path drops it at cap 3, so the
    // probe must too (this asymmetry was a real bug: the probe side had
    // no cap at all, so a boilerplate fp in the batch re-opened the
    // quadratic fan-out and broke probe==full-batch parity at the cap)
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = Seq((1L, text), (2L, text), (3L, text)).toDF("doc_id", "text")
    val batch = Seq((101L, text), (102L, text)).toDF("doc_id", "text")
    spark.sql("DROP TABLE IF EXISTS graft_winnow_cap_test")
    // DROP alone can leave the location behind (prior-JVM leftovers) —
    // clear it like the append test does
    val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val loc = new org.apache.hadoop.fs.Path(wh, "graft_winnow_cap_test")
    if (fs.exists(loc)) fs.delete(loc, true)
    graft.ops.Dedup.writeWinnowIndex(
      corpus, "doc_id", "text", "graft_winnow_cap_test", maxBucketSize = 3)
    def probe(cap: Int) = graft.ops.Dedup.incrementalWinnowCandidates(
      spark, "graft_winnow_cap_test", batch, "doc_id", "text", maxBucketSize = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def full(cap: Int) = graft.ops.Dedup.winnowCandidates(
      corpus.unionByName(batch), "doc_id", "text", maxBucketSize = cap)
      .filter(col("a") < 100L && col("b") >= 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probe(3) == full(3) && probe(3).isEmpty,
      s"straddling bucket must drop in BOTH paths: probe=${probe(3)} full=${full(3)}")
    assert(probe(10) == full(10) && probe(10).size == 6,
      s"under the cap both paths emit all 3x2 cross pairs: probe=${probe(10)}")
  }

  test("appendToMinhashIndex folds a batch in; later probes see it, layout survives") {
    // day-2 of the ingest loop: after batch1 is accepted, its banded rows
    // INSERT INTO the bucketed index; a batch2 probe must then find pairs
    // against BOTH the original corpus and batch1 — and still join the
    // index side exchange-free (the append must not break the bucket spec)
    val docs = Tables.t(spark, sfDir, "documents")
    val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.sql("DROP TABLE IF EXISTS graft_minhash_append_test")
    val loc = new org.apache.hadoop.fs.Path(wh, "graft_minhash_append_test")
    if (fs.exists(loc)) fs.delete(loc, true)
    graft.ops.Dedup.writeMinhashIndex(docs, "doc_id", "text", "graft_minhash_append_test")
    // batch1: near-dups of every 7th doc; batch2: near-dups of every 14th
    // doc, so each batch2 doc has a planted neighbor in the corpus AND in
    // batch1 (the 14th-doc subset of batch1's 7th-doc shifts)
    def shifted(mod: Int, offset: Long) = docs.filter(col("doc_id") % mod === 0)
      .withColumn("doc_id", col("doc_id") + offset)
      .withColumn("text", expr("substring(text, instr(text, ' ') + 1)"))
    graft.ops.Dedup.appendToMinhashIndex(
      shifted(7, 200000L), "doc_id", "text", "graft_minhash_append_test")
    val probe2 = graft.ops.Dedup.incrementalCandidates(
      spark, "graft_minhash_append_test", shifted(14, 400000L), "doc_id", "text")
    val pairs = probe2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val vsCorpus = pairs.filter(_._1 < 200000L)
    val vsBatch1 = pairs.filter(p => p._1 >= 200000L && p._1 < 400000L)
    assert(vsCorpus.nonEmpty, "batch2 must pair against the original corpus")
    assert(vsBatch1.nonEmpty, "batch2 must pair against the APPENDED batch1 rows")
    // the appended rows landed with the right column binding: every batch1
    // id in a pair is a shifted 7th-doc id (a positional insertInto slip
    // would scramble doc_id into the band/sig columns instead)
    assert(vsBatch1.forall { case (a, _) => (a - 200000L) % 7 == 0 },
      s"appended ids malformed: ${vsBatch1.take(5)}")
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val smj = probe2.queryExecution.sparkPlan.collect { case j: SortMergeJoinExec => j }
    assert(smj.nonEmpty && smj.exists(j =>
      Seq(j.left, j.right).exists(_.collect { case e: ShuffleExchangeExec => e }.isEmpty)),
      s"post-append probe lost the exchange-free index side:\n${probe2.queryExecution.sparkPlan}")
  }

  test("minhash degenerate-bucket cap bounds an all-identical corpus") {
    import spark.implicits._
    // 200 byte-identical docs -> every band collapses into one bucket;
    // uncapped that is 200*199/2 = 19900 pairs from ONE bucket
    val degenerate = (0L until 200L)
      .map(i => (i, "the same exact document body repeated verbatim every time"))
      .toDF("doc_id", "text")
    val capped = graft.ops.Dedup.minhashCandidates(
      degenerate, "doc_id", "text", maxBucketSize = 50)
    assert(capped.count() == 0, "buckets past the cap must be dropped")
    // the cap must NOT disturb normal-sized buckets: default cap on the
    // planted-pair corpus recovers the same candidates as ever
    val small = graft.ops.Dedup.minhashCandidates(
      degenerate.limit(10), "doc_id", "text", maxBucketSize = 10000)
    assert(small.count() == 45, "10 identical docs under the cap pair fully")
  }

  test("resolveClusters labels every vertex with its component minimum") {
    import spark.implicits._
    val vertices = (1L to 12L).toDF("v")
    // {1..5} path, {6,7,8} star on 6, {9} isolated, {10,11,12} triangle
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (6L, 7L), (6L, 8L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("a", "b")
    val labels = graft.ops.Dedup.resolveClusters(vertices, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 5L).forall(labels(_) == 1L), labels.toString)
    assert(Seq(6L, 7L, 8L).forall(labels(_) == 6L))
    assert(labels(9L) == 9L, "isolated vertex is its own representative")
    assert(Seq(10L, 11L, 12L).forall(labels(_) == 10L))
  }

  test("split_points: boundaries are sorted and strictly inside the key range") {
    val rows = SparkEntry.queries("split_points")(spark, sfDir).collect()
    val bounds = rows.map(_.getString(0)).toSeq
    assert(bounds == bounds.sorted)
    assert(bounds.size <= 7) // 8 shards -> at most N-1 boundaries
  }

  test("filter_quality_quantile keeps ~75% per language, never everything") {
    val docs = Tables.t(spark, sfDir, "documents")
    val perLangTotal = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = SparkEntry.queries("filter_quality_quantile")(spark, sfDir)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.keySet == perLangTotal.keySet)
    perLangTotal.foreach { case (lang, n) =>
      val frac = kept(lang).toDouble / n
      // p25 threshold keeps >= 75% (ties at the threshold can keep more);
      // a degenerate all-kept result would mean the threshold is vacuous
      assert(frac >= 0.70 && frac <= 0.95, s"$lang kept $frac of $n")
    }
  }

  test("dedup_keep_best keeps exactly the max-quality doc of every cluster") {
    // the query's chain graph (edges i->i+1 except i%5==4) has closed-form
    // components {5k..5k+4}, so the expected keeper set is computable
    // WITHOUT connected components: argmax quality per 5-block
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id").orderBy(col("quality").desc, col("doc_id"))
    val expected = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"),
        (col("doc_id") - col("doc_id") % 5).as("cluster_id"),
        graft.ops.Text.qualityScore(col("text")).as("quality"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("doc_id").as("kept_doc"), col("quality"))
    val kept = SparkEntry.queries("dedup_keep_best")(spark, sfDir)
    assert(kept.exceptAll(expected).isEmpty && expected.exceptAll(kept).isEmpty,
      "keeper set must equal the closed-form argmax per 5-block")
    assert(kept.count() > 0)
  }

  test("KMeans recovers planted blob centers; joint subspaces train independently") {
    import spark.implicits._
    // two well-separated 1-D blobs per subspace, with INDEPENDENT blob
    // membership patterns across the two subspaces (i%2 vs (i/2)%2) — a
    // correct joint trainer must recover each subspace's exact blob
    // means, proving one pq_encode pass doesn't couple subspaces
    val n = 100
    def jit(i: Int) = (i % 10) / 100.0 // 0.00..0.09, far below the 10.0 gap
    val pts = Seq.tabulate(n) { i =>
      val a = (i % 2) * 10.0 + jit(i)       // subspace-0 blob by i%2
      val b = ((i / 2) % 2) * 10.0 + jit(i) // subspace-1 blob by (i/2)%2
      (i.toLong, Array(a, a, b, b))
    }
    val df = pts.toDF("vec_id", "ed")
    def mean(sel: Int => Boolean, v: Int => Double): Double = {
      val xs = (0 until n).filter(sel).map(v); xs.sum / xs.size
    }
    // seeds = first valid vector of each blob per subspace (ids 0 and 1
    // for subspace 0; the flat book layout is j*nCent + c)
    val seeds = Array(
      Array(pts(0)._2(0), pts(0)._2(1)), Array(pts(1)._2(0), pts(1)._2(1)),
      Array(pts(0)._2(2), pts(0)._2(3)), Array(pts(2)._2(2), pts(2)._2(3)))
    val book = graft.ops.KMeans.trainSubspaces(
      df, "ed", seeds, subDim = 2, nCent = 2, maxIters = 10)
    val expA0 = mean(i => i % 2 == 0, i => (i % 2) * 10.0 + jit(i))
    val expA1 = mean(i => i % 2 == 1, i => (i % 2) * 10.0 + jit(i))
    val expB0 = mean(i => (i / 2) % 2 == 0, i => ((i / 2) % 2) * 10.0 + jit(i))
    val expB1 = mean(i => (i / 2) % 2 == 1, i => ((i / 2) % 2) * 10.0 + jit(i))
    assert(math.abs(book(0)(0) - expA0) < 1e-9 && math.abs(book(0)(1) - expA0) < 1e-9)
    assert(math.abs(book(1)(0) - expA1) < 1e-9 && math.abs(book(1)(1) - expA1) < 1e-9)
    assert(math.abs(book(2)(0) - expB0) < 1e-9 && math.abs(book(2)(1) - expB0) < 1e-9)
    assert(math.abs(book(3)(0) - expB1) < 1e-9 && math.abs(book(3)(1) - expB1) < 1e-9)
    // the m=1 wrapper (plain k-means) recovers the same subspace-0 means
    val cents = graft.ops.KMeans.train(
      df.selectExpr("vec_id", "slice(ed, 1, 2) AS ed"), "ed",
      graft.ops.KMeans.seedById(
        df.selectExpr("vec_id", "slice(ed, 1, 2) AS ed"), "vec_id", "ed", 2, 2),
      maxIters = 10)
    assert(math.abs(cents(0)(0) - expA0) < 1e-9 && math.abs(cents(1)(0) - expA1) < 1e-9)
  }
  test("seedById skips damaged rows; sampled training still recovers the blobs") {
    import spark.implicits._
    // two well-separated 1-D blobs (gap 10.0, jitter <= 0.09) over 200 pts
    val n = 200
    def jit(i: Int) = (i % 10) / 100.0
    val pts = Seq.tabulate(n) { i =>
      val v = (i % 2) * 10.0 + jit(i)
      (i.toLong, Array(v, v))
    }
    // row 0 carries a NULL SLOT: correct length, so a size()-only filter
    // would pass it into the getSeq[Double] unboxing NPE — seedById must
    // degrade to the next valid rows (ids 1 and 2)
    val dmg = pts.toDF("vec_id", "ed").withColumn("ed",
      when(col("vec_id") === 0, expr("array(1D, CAST(NULL AS DOUBLE))"))
        .otherwise(col("ed")))
    val seeds = graft.ops.KMeans.seedById(dmg, "vec_id", "ed", k = 2, dim = 2)
    assert(seeds(0).sameElements(pts(1)._2) && seeds(1).sameElements(pts(2)._2),
      s"seeds must come from the first UNDAMAGED rows: ${seeds.map(_.toSeq).toSeq}")
    // sampleFraction < 1 trains the quantizer on a seeded sample — the
    // 100 TB contract ("the quantizer never needs the full corpus"): each
    // trained centroid must still land inside its blob's value range
    // (deterministic by seed; each blob contributes ~20 of the 40 samples)
    val cents = graft.ops.KMeans.train(
      dmg, "ed", seeds, maxIters = 10, sampleFraction = 0.2)
    val c = cents.map(_(0)).sorted
    assert(c(0) >= 0.0 && c(0) <= 0.09 && c(1) >= 10.0 && c(1) <= 10.09,
      s"sample-trained centroids must sit inside their blobs: ${c.toSeq}")
    // and the sampled run must agree with the full run to within the
    // jitter radius (the blobs are what the quantizer learns, not noise)
    val full = graft.ops.KMeans.train(dmg, "ed", seeds, maxIters = 10)
    val f = full.map(_(0)).sorted
    assert(math.abs(c(0) - f(0)) < 0.09 && math.abs(c(1) - f(1)) < 0.09)
  }

  test("corpus_budget_fill: level-aggregated fill == naive window on every boundary shape") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // handcrafted corpus hitting each edge the level plan must preserve:
    // lang a exhausts its budget EXACTLY (40+60), then a zero-token doc
    // opens the next level at cum_before == budget (the level filter must
    // be <=, not <) while its tokened level-mate overflows; lang b's
    // budget dies mid-level among quality TIES (doc_id breaks the tie);
    // lang c never exhausts
    val docs = Seq(
      ("a", 1L, 0.9, 40L), ("a", 2L, 0.7, 60L),
      ("a", 3L, 0.5, 0L), ("a", 4L, 0.5, 25L), ("a", 5L, 0.3, 5L),
      ("b", 8L, 0.8, 10L),
      ("b", 9L, 0.5, 50L), ("b", 10L, 0.5, 40L), ("b", 11L, 0.5, 30L),
      ("c", 12L, 0.2, 10L)
    ).toDF("lang", "doc_id", "quality", "ws_tokens")
    val budget = 100L
    val got = graft.ops.Corpus
      .budgetFill(docs, "lang", "quality", "ws_tokens", "doc_id", budget)
      .select("lang", "doc_id", "cum_tokens")
      .as[(String, Long, Long)].collect().toSet
    val naive = docs
      .withColumn("cum_tokens", sum("ws_tokens").over(
        Window.partitionBy("lang").orderBy(col("quality").desc, col("doc_id"))))
      .filter(col("cum_tokens") <= budget)
      .select("lang", "doc_id", "cum_tokens")
      .as[(String, Long, Long)].collect().toSet
    assert(got == naive,
      s"level plan must equal the naive window\ngot:   $got\nnaive: $naive")
    assert(got.map(_._2) == Set(1L, 2L, 3L, 8L, 9L, 10L, 12L),
      s"expected keepers {1,2,3,8,9,10,12}: $got")
    // the zero-token doc at cum == budget must be IN (naive keeps it)
    assert(got.contains(("a", 3L, 100L)), "zero-token doc on the exact boundary must survive")
  }

  test("pipeline_pack_sequences: two-phase prefix sum == naive global window, bucket-width invariant") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // irregular token counts incl. zero; ids deliberately sparse so bucket
    // boundaries (width 4: ids 0-3 | 4-7 | ...) fall mid-sequence and the
    // driver-side offset stitching is what's under test
    val docs = Seq(
      (0L, 7L), (1L, 0L), (3L, 12L), (4L, 5L), (6L, 9L),
      (9L, 30L), (10L, 1L), (15L, 4L), (16L, 11L), (31L, 2L))
      .toDF("doc_id", "n_tok")
    val naive = docs
      .withColumn("cum_before", coalesce(sum("n_tok").over(
        Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("seq_id", expr("cum_before DIV 16"))
      .select("doc_id", "n_tok", "cum_before", "seq_id")
      .as[(Long, Long, Long, Long)].collect().toSet
    for (width <- Seq(1L, 4L, 7L, 1024L)) {
      val got = graft.ops.Corpus
        .packSequences(docs, "doc_id", "n_tok", seqBudget = 16, bucketWidth = width)
        .select("doc_id", "n_tok", "cum_before", "seq_id")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == naive, s"width=$width must equal the naive global window\n$got\n$naive")
    }
    // budget boundary: a doc whose cum_before lands exactly on a multiple
    // of the budget opens the next sequence (floor semantics)
    assert(naive.exists { case (_, _, cb, sid) => cb % 16 == 0 && cb > 0 && sid == cb / 16 })
  }

  test("pipeline_pack_split: ranges tile each doc, interior sequences exactly full") {
    import spark.implicits._
    val budget = 16L
    // token counts straddling every boundary shape: multi-sequence doc
    // (30 > budget), exact-budget doc, zero-token doc (must emit no row),
    // 1-token docs around a boundary
    val docs = Seq(
      (0L, 7L), (1L, 30L), (2L, 16L), (3L, 0L), (4L, 1L), (5L, 12L), (6L, 9L))
      .toDF("doc_id", "n_tok")
    val rows = graft.ops.Corpus
      .packSplit(docs, "doc_id", "n_tok", seqBudget = budget, bucketWidth = 2)
      .select("doc_id", "seq_id", "tok_start", "tok_end")
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    val nTok = Map(0L -> 7L, 1L -> 30L, 2L -> 16L, 3L -> 0L, 4L -> 1L, 5L -> 12L, 6L -> 9L)
    // zero-token doc emits nothing
    assert(!rows.exists(_._1 == 3L))
    // per doc: sub-ranges are contiguous from 0 to n_tok in seq order
    rows.groupBy(_._1).foreach { case (id, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.head._3 == 0L, s"doc $id must start at 0")
      assert(sorted.last._4 == nTok(id), s"doc $id must end at n_tok")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 == b._3, s"doc $id ranges must be contiguous: $a -> $b")
          assert(a._2 + 1 == b._2, s"doc $id must span consecutive sequences")
        case _ =>
      }
    }
    // per sequence except the last: contributions sum exactly to budget
    val bySeq = rows.groupBy(_._2)
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (s, rs) =>
      val total = rs.map(r => r._4 - r._3).sum
      if (s != lastSeq) assert(total == budget, s"seq $s holds $total of $budget")
      else assert(total <= budget)
    }
    // total tokens conserved
    assert(rows.map(r => r._4 - r._3).sum == nTok.values.sum)
  }

  test("pack operators: randomized corpora match an independent in-memory reference") {
    import spark.implicits._
    // independent oracle: a driver-side fold, not another Spark plan — a
    // bug shared by the two-phase and naive WINDOW forms can't hide here
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      val n = 1 + rnd.nextInt(60)
      val ids = rnd.shuffle((0L until 200L).toList).take(n).sorted
      val rows = ids.map(id => (id, rnd.nextInt(40).toLong))
      val budget = 1L + rnd.nextInt(30)
      val width = 1L + rnd.nextInt(50)
      // reference prefix sums
      var acc = 0L
      val refPack = rows.map { case (id, t) =>
        val r = (id, t, acc, acc / budget); acc += t; r
      }
      val refSplit = refPack.flatMap { case (id, t, cb, _) =>
        if (t == 0) Nil
        else (cb / budget to (cb + t - 1) / budget).map { s =>
          (id, s, math.max(0L, s * budget - cb), math.min(t, (s + 1) * budget - cb))
        }
      }
      val df = rows.toDF("doc_id", "n_tok")
      val gotPack = graft.ops.Corpus
        .packSequences(df, "doc_id", "n_tok", budget, width)
        .select("doc_id", "n_tok", "cum_before", "seq_id")
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toList
      assert(gotPack == refPack,
        s"trial $trial (budget=$budget width=$width):\n$gotPack\n$refPack")
      val gotSplit = graft.ops.Corpus
        .packSplit(df, "doc_id", "n_tok", budget, width)
        .select("doc_id", "seq_id", "tok_start", "tok_end")
        .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toList
      assert(gotSplit == refSplit,
        s"trial $trial (budget=$budget width=$width):\n$gotSplit\n$refSplit")
    }
  }

  test("dedup_chunk_exact: first occurrence wins, full dups vanish, reassembly ordered") {
    import spark.implicits._
    val k = 3 // chunk size in tokens
    // doc 1: two full chunks + a 1-token tail. doc 2: exact full duplicate
    // of doc 1 (must vanish). doc 3: first chunk duplicates doc 1's first
    // chunk, then novel text (keeps only the novel chunks). doc 4: shares
    // doc 1's SECOND chunk as its first — chunk identity is content, not
    // position, so it must still be dropped.
    val docs = Seq(
      (1L, "a b c d e f g"),
      (2L, "a b c d e f g"),
      (3L, "a b c x y z w"),
      (4L, "d e f q r s"))
      .toDF("doc_id", "text")
    val got = graft.ops.Corpus.dedupChunks(docs, "doc_id", "text", chunkTokens = k)
      .select("doc_id", "text_dedup", "n_chunks", "n_kept")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(1L, 3L, 4L), s"doc 2 must vanish: ${got.toSeq}")
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(1L) == ((1L, "a b c d e f g", 3L, 3L)), s"${byId(1L)}")
    assert(byId(3L) == ((3L, "x y z w", 3L, 2L)), s"first chunk deduped: ${byId(3L)}")
    assert(byId(4L) == ((4L, "q r s", 2L, 1L)), s"positional shift must not defeat dedup: ${byId(4L)}")
  }

  /** Independent in-memory BPE (Sennrich'16 shapes: overlapping adjacent
    * pair counts, position-scan merge application) — deliberately NOT the
    * `aggregate`-fold the Spark op uses, so agreement is evidence. */
  private def refBpe(words: Map[String, Long], nMerges: Int)
      : Seq[(String, String, Long)] = {
    def applyMerge(syms: Vector[String], l: String, r: String): Vector[String] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.size) {
        if (i + 1 < syms.size && syms(i) == l && syms(i + 1) == r) {
          buf += (l + r); i += 2
        } else { buf += syms(i); i += 1 }
      }
      buf.toVector
    }
    var vocab: Vector[(Vector[String], Long)] =
      words.toVector.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    while (out.size < nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        (0 until syms.size - 1).foreach { i =>
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), f) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((l, r, f))
        vocab = vocab.map { case (syms, fr) => (applyMerge(syms, l, r), fr) }
      }
    }
    out.toSeq
  }

  test("text_bpe_train/encode: merge sequence and piece counts equal an independent reference BPE") {
    // independent tokenizer + word-freq (not ops.Dedup.tokens / ops.Bpe)
    val docs = Tables.t(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val wf = docs.flatMap(d => d._2.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    val expected = refBpe(wf, nMerges = 24)

    val got = SparkEntry.queries("text_bpe_train")(spark, sfDir)
      .select("left", "right", "freq").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == expected, s"merge sequences differ:\ngot  $got\nwant $expected")

    // encode: per-doc piece counts must equal segmenting each word with
    // the reference merges via the reference position-scan
    val refMerges = expected.map { case (l, r, _) => (l, r) }
    def seg(w: String): Int = {
      var syms = w.map(_.toString).toVector
      refMerges.foreach { case (l, r) =>
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.size) {
          if (i + 1 < syms.size && syms(i) == l && syms(i + 1) == r) {
            buf += (l + r); i += 2
          } else { buf += syms(i); i += 1 }
        }
        syms = buf.toVector
      }
      syms.size
    }
    val wantPieces = docs.map { case (id, text) =>
      id -> text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).map(seg).sum
    }.toMap
    val gotPieces = SparkEntry.queries("text_bpe_encode")(spark, sfDir)
      .select("doc_id", "n_pieces").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(gotPieces == wantPieces)
    // merges must actually compress: strictly fewer pieces than chars
    val chars = docs.map(_._2.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).map(_.length).sum).sum
    assert(gotPieces.values.sum < chars, "BPE encode should reduce symbol count")
  }

  test("dedup_winnow_pairs: planted near-dup recall is 100% (winnowing guarantee)") {
    // every doc_id % 7 == 0 has a dropped-first-token twin at +300000;
    // the shared suffix is far longer than w + k - 1 = 6 tokens, so the
    // guarantee makes every planted pair a certainty, not a probability
    val pairs = SparkEntry.queries("dedup_winnow_pairs")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = Tables.t(spark, sfDir, "documents")
      .filter(col("doc_id") % 7 === 0)
      .select("doc_id").collect().map(_.getLong(0))
      .map(id => (id, id + 300000L)).toSet
    val missed = planted.diff(pairs)
    assert(missed.isEmpty, s"winnowing must recover EVERY planted pair; missed $missed")
  }

  test("winnowFingerprints: shared-run guarantee boundary and short-doc handling") {
    import spark.implicits._
    val k = 3; val w = 4
    // two docs sharing a run of exactly w + k - 1 = 6 tokens MUST share a
    // fingerprint; distinct-token docs must not
    val shared = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, s"one two $shared"),
      (2L, s"$shared nine ten"),
      (3L, "completely different words here entirely"),
      (4L, "tiny doc"), // < k tokens -> no fingerprints
      (5L, "just three tokens")) // exactly one shingle -> one truncated window
      .toDF("doc_id", "text")
    val fps = graft.ops.Dedup.winnowFingerprints(docs, "doc_id", "text", k, w)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byDoc(1L).intersect(byDoc(2L)).nonEmpty,
      "a shared w+k-1 token run must yield a shared fingerprint")
    assert(byDoc(3L).intersect(byDoc(1L) ++ byDoc(2L)).isEmpty)
    assert(!byDoc.contains(4L), "sub-k docs emit nothing")
    assert(byDoc(5L).size == 1, "a single shingle winnows to its own hash")
    val pairs = graft.ops.Dedup.winnowCandidates(docs, "doc_id", "text", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"only the overlapping pair pairs up: $pairs")
  }

  test("agg_cms_merge: est >= exact with the εN overcount bound, merge == built-whole") {
    val rows = SparkEntry.queries("agg_cms_merge")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val n = Tables.events(spark, sfDir).count()
    // CMS guarantee: exact <= est, and est <= exact + εN with ε = e/w at
    // confidence 1 - e^-d (~98% for d=4). Deterministic data + fixed row
    // hashes make the check reproducible; 4× headroom on εN keeps it far
    // from the confidence tail without weakening the claim's shape.
    val bound = math.ceil(4 * math.E * n / graft.queries.Aggregates.cmsW).toLong
    rows.foreach { r =>
      val est = r.getAs[Long]("est_cnt")
      val exact = r.getAs[Long]("exact_cnt")
      assert(est >= exact, s"CMS must never underestimate: $r")
      assert(est - exact <= bound, s"overcount ${est - exact} > bound $bound: $r")
      assert(r.getAs[Long]("overcount") == est - exact, s"self-check column: $r")
    }
    // counter addition commutes: the 8-segment merged cell table must be
    // CELL-IDENTICAL to a single-pass build (not just estimate-close)
    val ev = Tables.events(spark, sfDir)
    def cells(nSeg: Int) = graft.queries.Aggregates.cmsCells(ev, nSeg)
      .groupBy("r", "c").agg(sum("cnt").as("cnt"))
    val diff = cells(8).union(cells(1)).groupBy("r", "c")
      .agg(countDistinct("cnt").as("k"), count(lit(1)).as("m"))
      .filter(col("k") =!= 1 || col("m") =!= 2)
    assert(diff.isEmpty, "merged-from-segments cells must equal built-whole cells")
  }

  test("sample_weighted: selection set equals the md5-integer rule recomputed independently") {
    import spark.implicits._
    val sel = SparkEntry.queries("sample_weighted")(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    val docs = Tables.t(spark, sfDir, "documents")
      .select("doc_id", "n_chars").as[(Long, Long)].collect()
    val maxW = docs.map(_._2).max
    def u(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$id:g8".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    val expect = docs.collect {
      case (id, w) if u(id) * maxW * 8 < w * 4294967296L => id
    }.toSet
    assert(sel == expect, s"selection diverged: extra=${sel -- expect} missing=${expect -- sel}")
    // the rule actually samples: nonempty, and well under the corpus
    assert(sel.nonEmpty && sel.size < docs.length / 2,
      s"${sel.size} of ${docs.length} selected")
  }

  test("crawl_diff: planted fixture drives every classification arm") {
    import spark.implicits._
    val cut = "19960101000000"
    // one urlkey per arm, plus a latest-capture tie-break case: the
    // synthetic corpus never plants all four at once (sf0.001 has only
    // new/gone; no sf produces 'unchanged' by accident), so the 4-way
    // CASE is pinned here against hand-computed truth
    val captures = Seq(
      ("k_new", "19970101000000", 200L),
      ("k_gone", "19950101000000", 200L),
      ("k_unchanged", "19950601000000", 301L), // latest of gen A...
      ("k_unchanged", "19950301000000", 503L), // (earlier, must lose)
      ("k_unchanged", "19970101000000", 301L), // ...equals latest of gen B
      ("k_changed", "19950101000000", 200L),
      ("k_changed", "19970101000000", 404L),
      ("k_tie", "19950101000000", 200L), // same ts twice: higher status
      ("k_tie", "19950101000000", 301L), // wins the gen-A latest...
      ("k_tie", "19970101000000", 301L)  // ...so k_tie is 'unchanged'
    ).toDF("urlkey", "ts", "status")
    val got = graft.queries.CdxOps.crawlDiff(captures, cut)
      .collect().map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)), r.getString(3)))
    assert(got.toSeq == Seq(
      ("k_changed", Some(200), Some(404), "changed"),
      ("k_gone", Some(200), None, "gone"),
      ("k_new", None, Some(200), "new"),
      ("k_tie", Some(301), Some(301), "unchanged"),
      ("k_unchanged", Some(301), Some(301), "unchanged")), s"got ${got.toSeq}")
  }

  test("cdx_revisit_generate: digest-less responses are never deduped") {
    import spark.implicits._
    // the warcio/pywb dedup contract: a record without a payload digest
    // can't be a revisit target OR a revisit — three null-digest rows
    // sharing nothing must each emit as a plain response (and not pile
    // into one null partition), while the non-null pair still dedupes
    val responses = Seq(
      (1L, "k/a", "19960101000000", "http://a/1", "DIGESTAAAA"),
      (2L, "k/b", "19970101000000", "http://b/2", null),
      (3L, "k/c", "19980101000000", "http://c/3", null),
      (4L, "k/d", "19990101000000", "http://d/4", "DIGESTAAAA"),
      (5L, "k/e", "20000101000000", "http://e/5", null)
    ).toDF("id", "urlkey", "ts", "url", "digest")
    val got = graft.queries.CdxOps.revisitGenerate(responses)
      .select("id", "out_type", "refers_to_url", "refers_to_ts")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)), Option(r.getString(3))))
    assert(got.toSeq == Seq(
      (1L, "response", None, None),
      (2L, "response", None, None),
      (3L, "response", None, None),
      (4L, "revisit", Some("http://a/1"), Some("19960101000000")),
      (5L, "response", None, None)), s"got ${got.toSeq}")
  }

  test("text_gopher_rules: planted fixture drives the punctuation arms") {
    import spark.implicits._
    // the synthetic corpus has no punctuation, so the symbol / bullet /
    // ellipsis / mean-word-length arms are pinned here against
    // hand-computed truth (the crawl_diff planted-arm pattern).
    // `good` = 104 words, mean length 3.46, all 8 stop-signal words.
    val good = Seq.fill(8)("the words be to of and that have with more body text here").mkString(" ")
    val docs = Seq(
      (1L, good),                                          // passes every rule
      (2L, good + " ############### x"),                   // 15 '#' > 10% of 105 words
      (3L, good + (1 to 10).map(_ => "\n- item").mkString("")), // 10 of 11 bullet lines
      (4L, good + "\nmore...\nmore...\nmore..."),          // 3 of 4 ellipsis lines
      (5L, Seq.fill(30)("a ex").mkString(" ")),            // mean word length < 3
      (6L, Seq.fill(60)("extraordinarily").mkString(" ")), // mean word length > 10
      (7L, "too short to pass")                            // word count < 50
    ).toDF("doc_id", "text")
    // columns 2..9: r_wordcount r_meanlen r_alpha r_stop r_symbol r_bullets r_ellipsis keep
    val got = graft.queries.Curation.gopherRules(docs)
      .collect().map(r => (r.getLong(0),
        (2 to 9).map(i => if (r.getBoolean(i)) 'T' else 'F').mkString))
    assert(got.toSeq == Seq(
      (1L, "TTTTTTTT"),
      (2L, "TTTTFTTF"),
      (3L, "TTTTTFTF"),
      (4L, "TTTTTTFF"),
      (5L, "TFTFTTTF"),
      (6L, "TFTFTTTF"),
      (7L, "FTTFTTTF")), s"got ${got.toSeq}")
  }

  test("crawl_politeness: window closed form equals the sequential recursion") {
    import spark.implicits._
    // sched_i = max(arrival_i, sched_{i-1} + delay) — the closed form
    // (delay·rn + running max of arrival − delay·rn) must equal a plain
    // sequential fold, including burst arrivals (identical timestamps)
    // and long idle gaps that reset the backlog
    val delay = 2000000L
    val arrivals = Seq(0L, 0L, 0L, 1000000L, 9000000L, 9100000L, 50000000L)
    val df = arrivals.zipWithIndex
      .map { case (ts, i) => (i.toLong, "h", ts) }
      .toDF("id", "hostword", "epoch_us")
      .withColumn("host", col("hostword"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("host").orderBy("epoch_us", "id")
    val got = df
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w).cast("long"))
      .withColumn("sched_us", lit(delay) * col("rn") +
        org.apache.spark.sql.functions.max(col("epoch_us") - lit(delay) * col("rn")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .orderBy("id").select("sched_us").collect().map(_.getLong(0)).toSeq
    val expect = arrivals.tail.scanLeft(arrivals.head) {
      (prev, ts) => math.max(ts, prev + delay)
    }
    assert(got == expect, s"closed form $got != recursion $expect")
  }

  test("url_redirect_chain: doubling rounds cover exactly 2^rounds hops") {
    import spark.implicits._
    // a single 9-hop chain 9→8→…→0: rounds=4 (covers 16) must fully
    // resolve every suffix; rounds=3 (covers 8) must leave ONLY the
    // 9-hop head partially resolved at its 8-step waypoint — pinning
    // that the round bound is the real coverage bound, not a heuristic
    val edges = (1 to 9).map(i => (i.toLong, i.toLong - 1)).toDF("src", "dst")
    val full = graft.queries.Curation.resolveChains(edges, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(full.toSeq == (1 to 9).map(i => (i.toLong, 0L, i.toLong)),
      s"rounds=4 got ${full.toSeq}")
    val partial = graft.queries.Curation.resolveChains(edges, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(partial.toSeq == (1 to 8).map(i => (i.toLong, 0L, i.toLong)) :+ (9L, 1L, 8L),
      s"rounds=3 got ${partial.toSeq}")
  }

  test("url_redirect_chain: deep-round calls stay correct and lineage-bounded") {
    import spark.implicits._
    // resolveChains is public API at caller-chosen depth: 8 rounds cover
    // 2^8 = 256 hops, and each round SQUARES the self-join tree — without
    // the every-2nd-round localCheckpoint the optimizer would receive an
    // exponentially nested plan (and this test would stall or OOM the
    // analyzer). A 200-hop chain pins correctness at that depth; the
    // checkpointed frame's lineage must be a bounded plan, not 8 nested
    // joins (its string representation stays small).
    val edges = (1 to 200).map(i => (i.toLong, i.toLong - 1)).toDF("src", "dst")
    val deep = graft.queries.Curation.resolveChains(edges, rounds = 8)
    val got = deep.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == (1 to 200).map(i => (i.toLong, 0L, i.toLong)),
      s"200-hop chain must fully resolve at rounds=8; head got ${got.take(3).toSeq}")
    val planChars = deep.queryExecution.optimizedPlan.toString.length
    assert(planChars < 200000,
      s"lineage must be checkpoint-truncated, got a $planChars-char plan")
  }

  test("url_redirect_loops: doubling + out-edge semi-join classifies cycles structurally") {
    import spark.implicits._
    // the minimal zoo: a plain chain (3→2→1→0), a 2-cycle (10↔11), a
    // chain FLOWING INTO that cycle (12→10), and an isolated terminal
    // (20). Doubling rounds cover every acyclic prefix; the "resolved
    // dst still has an out-edge" test must flag exactly the cycle
    // members and the chain that drains into them.
    val edges = Seq(3L -> 2L, 2L -> 1L, 1L -> 0L,
      10L -> 11L, 11L -> 10L, 12L -> 10L).toDF("src", "dst")
    val jump = graft.queries.Curation.resolveChains(edges, rounds = 2)
    val outSrcs = edges.select(col("src").as("osrc")).distinct()
    val ids = Seq(0L, 1L, 2L, 3L, 10L, 11L, 12L, 20L).toDF("id")
    val got = ids.join(jump, col("id") === col("src"), "left")
      .select(col("id"), coalesce(col("dst"), col("id")).as("rdst"),
        coalesce(col("hops"), lit(0L)).as("rhops"))
      .join(outSrcs, col("rdst") === col("osrc"), "left")
      .select(col("id"),
        when(col("osrc").isNull, col("rdst")).as("terminal_id"),
        col("osrc").isNotNull.as("is_loop"))
      .orderBy("id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getBoolean(2)))
    assert(got.toSeq == Seq(
      (0L, Some(0L), false), (1L, Some(0L), false), (2L, Some(0L), false),
      (3L, Some(0L), false), (10L, None, true), (11L, None, true),
      (12L, None, true), (20L, Some(20L), false)), s"got ${got.toSeq}")
  }

  test("ts_cusum_alarm: window closed form equals the sequential CUSUM recursion") {
    import spark.implicits._
    // s_i = max(0, s_{i-1} + x_i − k) vs prefix_i − min(0, running min
    // prefix) — checked over a series that exercises reset-to-zero,
    // gradual drift, a spike, and recovery
    val k = 2L
    val xs = Seq(1L, 1L, 5L, 1L, 3L, 3L, 0L, 0L, 8L, 2L)
    val df = xs.zipWithIndex.map { case (x, i) => ("h", f"$i%02d", x) }
      .toDF("hostword", "day", "cnt")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("hostword").orderBy("day")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val got = df
      .withColumn("prefix", org.apache.spark.sql.functions.sum(col("cnt") - k).over(w))
      .withColumn("cusum", col("prefix") - least(
        org.apache.spark.sql.functions.min("prefix").over(w), lit(0L)))
      .orderBy("day").select("cusum").collect().map(_.getLong(0)).toSeq
    val expect = xs.scanLeft(0L)((s, x) => math.max(0L, s + x - k)).tail
    assert(got == expect, s"closed form $got != recursion $expect")
  }

  test("agg_kmv_distinct: bottom-k sketch is exactly mergeable across segments") {
    import org.apache.spark.sql.expressions.Window
    // the property that makes KMV a SKETCH: bottom-k of the union of
    // per-segment bottom-k sketches == bottom-k computed directly over
    // the whole corpus — set-identical, not approximately equal. Four
    // id%4 segments stand in for four executors/days.
    val k = 64
    val hashes = Cdx.df(spark, sfDir).select(col("hostword"), col("id"),
      conv(substring(md5(concat(col("urlkey"), lit(":kmv"))), 1, 8), 16, 10)
        .cast("bigint").as("h"))
    def bottomK(df: org.apache.spark.sql.DataFrame) = df
      .select("hostword", "h").distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy("hostword").orderBy("h")))
      .filter(col("rn") <= k).select("hostword", "h")
    val direct = bottomK(hashes).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val merged = bottomK(
      (0 until 4).map(i => bottomK(hashes.filter(col("id") % 4 === i)))
        .reduce(_ unionByName _))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(merged == direct,
      s"sketch merge must be lossless: ${merged.diff(direct).take(3)} / ${direct.diff(merged).take(3)}")
    // and the estimator is sane in aggregate (per-group tails can be
    // unlucky at k=64 — the sf0.01 'medium' group sits at 3.4σ — so the
    // bound is on the MEDIAN relative error, not the max)
    val errs = SparkEntry.queries("agg_kmv_distinct")(spark, sfDir)
      .collect().map(_.getAs[Double]("rel_err")).sorted
    assert(errs(errs.length / 2) < 0.2, s"median rel_err: ${errs.toSeq}")
  }

  test("agg_kmv_overlap: union minima are membership-decidable against the two sketches") {
    import org.apache.spark.sql.expressions.Window
    // the theorem the overlap estimator stands on (Beyer et al. 2007):
    // A ⊆ A∪B ⇒ A's kth minimum ≥ the union's kth minimum, so EVERY
    // union-sketch minimum that belongs to set A is present in A's own
    // bottom-k sketch — membership tests against the k-row sketches are
    // exact, never lossy. Checked exhaustively on the driver split.
    val k = 64
    val cut = "19960101000000"
    val hashes = Cdx.df(spark, sfDir).select(col("hostword"),
        when(col("ts") < cut, lit("a")).otherwise(lit("b")).as("gen"),
        conv(substring(md5(concat(col("digest"), lit(":kmv"))), 1, 8), 16, 10)
          .cast("bigint").as("h"))
      .distinct()
    def bottomK(df: org.apache.spark.sql.DataFrame, parts: String*) = df
      .withColumn("rn", row_number().over(
        Window.partitionBy(parts.map(col): _*).orderBy("h")))
      .filter(col("rn") <= k).drop("rn")
    val genSk = bottomK(hashes, "hostword", "gen")
    val unionSk = bottomK(hashes.select("hostword", "h").distinct(), "hostword")
    // ground truth membership from the FULL hash sets
    val fullA = hashes.filter(col("gen") === "a")
      .select("hostword", "h").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val skA = genSk.filter(col("gen") === "a")
      .select("hostword", "h").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val uMins = unionSk.select("hostword", "h").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    uMins.foreach { m =>
      assert(fullA.contains(m) == skA.contains(m),
        s"membership of union minimum $m must be decidable from A's sketch alone")
    }
  }

  test("text_dedup_substring: disjoint duplicated 5-grams form SEPARATE maximal spans") {
    import spark.implicits._
    // crafted corpus on a scratch documents.parquet: doc 0 embeds two
    // duplicated 5-gram runs (head, tail) separated by unique filler —
    // they must surface as TWO spans; docs 1 & 2 each carry one of the
    // runs plus unique padding (one span each); doc 3 is all-unique
    // (zero spans). Tokens are distinct words so no accidental grams.
    val dir = "/tmp/graft_test/subdup_fixture"
    val run1 = (1 to 5).map(i => s"alpha$i").mkString(" ")
    val run2 = (1 to 5).map(i => s"omega$i").mkString(" ")
    def uniq(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    // ids deliberately NOT %5==0: the docsWithDups planted-copy helper
    // must stay out of the way (a full copy would fuse doc 1's two spans
    // into one full-coverage span)
    Seq(
      (1L, s"$run1 ${uniq("mid", 6)} $run2", "en", "src0", 1L),
      (2L, s"$run1 ${uniq("pad", 7)}", "en", "src1", 1L),
      (3L, s"${uniq("qad", 7)} $run2", "en", "src2", 1L),
      (4L, uniq("zed", 12), "en", "src3", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("text_dedup_substring")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (1L, 2L, 10L),   // two disjoint 5-token spans, filler uncovered
      (2L, 1L, 5L),    // shared head run only
      (3L, 1L, 5L),    // shared tail run only
      (4L, 0L, 0L)), s"got $got")
  }

  test("obs_lsh_calibration: estimator is calibrated; the exact leg matches a hand Jaccard") {
    import spark.implicits._
    val rows = SparkEntry.queries("obs_lsh_calibration")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty, "the planted twins must surface candidate pairs")
    // bounds: est and exact live in [0, 1]; per-pair |err| is bounded by
    // the n=16 estimator's worst plausible deviation; the MEAN is tight
    rows.foreach { case (a, b, est, exact, err) =>
      assert(est >= 0 && est <= 1 && exact >= 0 && exact <= 1, s"($a,$b)")
      assert(math.abs(err - math.abs(est - exact)) < 1e-9)
    }
    val meanErr = rows.map(_._5).sum / rows.length
    assert(meanErr <= 0.15, f"mean |est-exact| $meanErr%.3f exceeds the n=16 calibration bound")
    // hand-check the exact leg on one planted twin pair (b = a + 200000:
    // the dropped-first-token perturbation)
    val twin = rows.find { case (a, b, _, _, _) => b == a + 200000L }
    assert(twin.isDefined, "a planted twin pair must be among the candidates")
    val (a0, b0, _, exact0, _) = twin.get
    val textA = Tables.t(spark, sfDir, "documents")
      .filter(col("doc_id") === a0).select("text").as[String].head()
    val textB = textA.split(" ").drop(1).mkString(" ")
    def shingleSet(t: String): Set[String] = {
      val toks = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }
    val (sa, sb) = (shingleSet(textA), shingleSet(textB))
    val hand = math.rint(sa.intersect(sb).size.toDouble / sa.union(sb).size * 1e6) / 1e6
    assert(math.abs(exact0 - hand) < 1e-9,
      s"exact leg $exact0 != hand Jaccard $hand for pair ($a0, $b0)")
  }
}
