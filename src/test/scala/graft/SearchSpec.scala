package graft

import org.apache.spark.sql.functions._

/** Properties for the keyword-search surface (queries/Search.scala) and
  * the bloom-prefiltered dedup (queries/Llm.scala). */
class SearchSpec extends SparkSpec {

  test("build_inverted_index: postings round-trip to the matching documents") {
    val docs = Tables.t(spark, sfDir, "documents")
    val rows = SparkEntry.queries("build_inverted_index")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val byTerm = rows.map { case (term, df, postings) =>
      val ids = postings.split(",").map(_.toLong).toSeq
      assert(ids.size == df, s"$term: df != postings length")
      assert(ids == ids.sorted && ids.distinct.size == ids.size,
        s"$term: postings must be sorted and distinct")
      term -> ids.toSet
    }.toMap
    // spot-check one frequent term against a direct filter
    val sparkDocs = docs
      .filter(array_contains(graft.ops.Dedup.tokens(col("text")), "spark"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(byTerm("spark") == sparkDocs)
  }

  test("search_keyword_and: equals the direct conjunctive filter") {
    val toks = graft.ops.Dedup.tokens(col("text"))
    val want = Tables.t(spark, sfDir, "documents")
      .filter(array_contains(toks, "spark") && array_contains(toks, "merge"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = SparkEntry.queries("search_keyword_and")(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(got == want && got.nonEmpty)
  }

  test("search_index_probe: stored probe equals the direct form and prunes partitions") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val direct = SparkEntry.queries("search_keyword_and")(spark, sfDir)
      .collect().map(_.getLong(0)).toSeq
    val stored = SparkEntry.queries("search_index_probe")(spark, sfDir)
    val got = stored.collect().map(_.getLong(0)).toSeq
    assert(got == direct && got.nonEmpty, "storage layout must be invisible in the result")
    // the term-bucket filter must reach the scan as a STATIC partition
    // filter: ≤ |distinct query buckets| of the 64 index dirs are listed
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // the aggregate puts the scan inside a materialized ShuffleQueryStage,
    // which plain collect() does not traverse — recurse through both AQE
    // wrappers explicitly
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p.collect {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: QueryStageExec => scans(q.plan)
        case f: FileSourceScanExec => Seq(f)
      }.flatten
    val scan = scans(stored.queryExecution.executedPlan)
      .filter(_.partitionFilters.nonEmpty)
    assert(scan.nonEmpty, "expected a partition-filtered scan of the stored term index")
    val nParts = scan.head.selectedPartitions.partitionCount
    assert(nParts <= 2, s"2-term probe must list <= 2 of 64 buckets, listed $nParts")
  }

  test("join_set_similarity: prefix filtering is lossless vs in-Spark brute force") {
    val got = SparkEntry.queries("join_set_similarity")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over the same fixture corpus
    val base = Tables.t(spark, sfDir, "documents").filter(col("doc_id") % 10 === 0)
    val twins = base.filter(col("doc_id") % 7 === 0)
      .withColumn("doc_id", col("doc_id") + 400000L)
      .withColumn("text", expr("substring(text, instr(text, ' ') + 1)"))
    val sets = base.unionByName(twins)
      .select(col("doc_id"), array_distinct(graft.ops.Dedup.tokens(col("text"))).as("t"))
      .filter(size(col("t")) > 0)
    val a = sets.select(col("doc_id").as("a"), col("t").as("ta"))
    val b = sets.select(col("doc_id").as("b"), col("t").as("tb"))
    val want = a.crossJoin(b).filter(col("a") < col("b"))
      .withColumn("jac",
        size(array_intersect(col("ta"), col("tb"))).cast("double") /
          size(array_union(col("ta"), col("tb"))))
      .filter(col("jac") >= 0.9)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"missed=${want.diff(got).take(5)} extra=${got.diff(want).take(5)}")
    // the planted dropped-first-token twins must qualify at t=0.9 when the
    // dropped token is a duplicate of a later one (token SET unchanged)
    assert(got.nonEmpty)
  }

  test("dedup_bloom_prefilter: exact vs plain anti-join, and the bloom actually prunes") {
    val hist = Tables.t(spark, sfDir, "documents")
    val dupes = hist.filter(col("doc_id") % 5 === 0)
      .withColumn("doc_id", col("doc_id") + 100000L)
    val novel = hist.filter(col("doc_id") % 7 === 3)
      .withColumn("doc_id", col("doc_id") + 200000L)
      .withColumn("text", concat(col("text"), lit(" v2")))
    val batch = dupes.unionByName(novel)
    val want = batch.join(hist.select("text"), Seq("text"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = SparkEntry.queries("dedup_bloom_prefilter")(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // exactness: bloom false positives are verified away, false negatives
    // cannot exist — the bloom path must be invisible in the result
    assert(got == want && got.nonEmpty)
    // the novel docs are all survivors (their text is not in history)
    val novelIds = novel.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(novelIds.subsetOf(got))
    // pruning: every true duplicate must flag as a candidate, so the
    // bloom keeps at least the dup fraction out of the "definitely new"
    // fast path — at 3% FPR virtually all novels take the fast path
    val bf = hist.stat.bloomFilter("text", 1 << 20, 0.03)
    val dupTexts = dupes.select("text").collect().map(_.getString(0))
    assert(dupTexts.forall(bf.mightContainString), "bloom must never miss a real dup")
    val novelTexts = novel.select("text").collect().map(_.getString(0))
    val fpr = novelTexts.count(bf.mightContainString).toDouble / novelTexts.length
    assert(fpr < 0.2, s"false-positive rate way above configured 3%: $fpr")
  }
}
