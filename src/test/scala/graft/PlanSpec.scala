package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan invariants (the 100 TB contract): filters and projections
  * reach the parquet scan, small dims broadcast, aggregations run
  * partial+final, top-k compiles to TakeOrderedAndProject, global sorts
  * use a single range exchange, and hot paths stay in whole-stage codegen.
  * A plan regression here is a performance bug even while results stay
  * correct, so it fails the build. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("filter_pushdown: predicates and projection reach the parquet scan") {
    val p = plan("filter_pushdown")
    assert(p.contains("PushedFilters:"), p)
    assert(p.contains("GreaterThan(l_quantity,45.0)"), "quantity filter must push down")
    assert(p.contains("LessThanOrEqual(l_discount,0.05)"), "discount filter must push down")
    // projection pruning: ReadSchema carries only the 4 selected columns
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema:")).mkString
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_discount"))
    assert(!readSchema.contains("l_extendedprice"), "unused columns must be pruned")
  }

  test("scan_parquet: column pruning") {
    val p = plan("scan_parquet")
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema:")).mkString
    assert(!readSchema.contains("l_extendedprice") && !readSchema.contains("l_shipdate"),
      s"pruned scan expected, got $readSchema")
  }

  test("join_broadcast_dim: dims broadcast, no shuffle of the fact side for the join") {
    val p = plan("join_broadcast_dim")
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(30).mkString("\n"))
    assert(!p.contains("SortMergeJoin"), "small dims must not sort-merge")
  }

  test("topk_closest: compiles to TakeOrderedAndProject (no global sort)") {
    val p = plan("topk_closest")
    assert(p.contains("TakeOrderedAndProject"), p.linesIterator.take(20).mkString("\n"))
  }

  test("scan_parquet_bloom: equality probe pushes down; the bloom is really in the footer") {
    val p = plan("scan_parquet_bloom") // runs the key body: bloom write + probe build
    assert(p.contains("PushedFilters:") && p.contains("EqualTo(urlkey,"),
      s"point lookup must reach the scan as an EqualTo pushdown:\n$p")
    // the writer option must have taken effect — a silently bloom-less
    // file would leave the key green while losing the row-group skipping
    // the key exists to demonstrate
    val sf = java.nio.file.Paths.get(sfDir).getFileName.toString
    val file = new java.io.File(s"/tmp/graft_fmt/$sf/bloom_parquet").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.getAbsolutePath),
        spark.sparkContext.hadoopConfiguration))
    try {
      import scala.jdk.CollectionConverters._
      val blocks = reader.getFooter.getBlocks.asScala
      assert(blocks.nonEmpty, "parquet file must have row groups")
      val urlkeyCol = blocks.head.getColumns.asScala
        .find(_.getPath.toDotString == "urlkey")
        .getOrElse(fail("urlkey column chunk missing from footer"))
      assert(urlkeyCol.getBloomFilterOffset >= 0,
        "urlkey column chunk must carry a bloom filter (writer option took effect)")
    } finally reader.close()
  }

  test("agg_count_by_key: two-phase hash aggregation (map-side partial)") {
    val p = plan("agg_count_by_key")
    val aggLines = p.linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(aggLines.size >= 2, s"partial+final expected:\n$p")
  }

  test("sort_global: exactly one range exchange, local sorts only") {
    val p = plan("sort_global")
    assert(p.contains("rangepartitioning"), p)
    // exactly one exchange in the details section: the range partition
    val exchangeOps = p.linesIterator.count(_.trim.matches("""\(\d+\) Exchange"""))
    assert(exchangeOps == 1, s"single exchange expected, got $exchangeOps:\n$p")
  }

  test("whole-stage codegen covers the projection/filter hot path") {
    // AQE resolves the final plan at execution; stars appear after a run
    val df = SparkEntry.queries("mime_norm")(spark, sfDir)
    df.collect() // finalize the AQE plan for THIS query execution
    val p = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(p.contains("*("), s"codegen stars expected in final plan:\n$p")
  }

  test("surt_key_native stays inside whole-stage codegen") {
    val df = SparkEntry.queries("surt_key_native")(spark, sfDir)
    df.collect() // finalize the AQE plan for THIS query execution
    val p = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(p.contains("surt_key_native"), "native expression must appear in the plan")
    assert(p.linesIterator.exists(l => l.contains("surt_key_native") && l.contains("*(")),
      s"native expression must sit inside a codegen'd (starred) operator:\n$p")
  }

  test("winnow_fps_text: fingerprinting is one codegen'd pass (fp explode only)") {
    // the round-7 1914 s regression was the composed HOF form's
    // interpreted lambda blowup — pin the kernel path: no aggregate, the
    // ONLY Generate is the fingerprint-array explode (never shingles),
    // and the kernel sits inside a starred (codegen'd) operator
    val fps = graft.ops.Dedup.winnowFingerprints(
      Tables.t(spark, sfDir, "documents"), "doc_id", "text", k = 3, w = 4)
    val plan = fps.queryExecution.sparkPlan
    assert(plan.collect {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
      case s: org.apache.spark.sql.execution.aggregate.SortAggregateExec => s }.isEmpty,
      "winnow fingerprinting must not aggregate")
    val gens = plan.collect { case g: org.apache.spark.sql.execution.GenerateExec => g }
    assert(gens.size == 1 && gens.head.toString.contains("winnow_fps_text"),
      s"exactly one Generate, exploding the kernel's fps array:\n$plan")
    fps.collect()
    val p = fps.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(p.linesIterator.exists(l => l.contains("winnow_fps_text") && l.contains("*(")),
      s"winnow_fps_text must sit inside a codegen'd operator:\n$p")
  }

  test("sketch kernels: signature computation adds no Generate/aggregate stage") {
    // simhash64/minhash_sig are per-row — the plan up to the sketch must
    // hold no explode (Generate) of tokens/shingles and no HashAggregate;
    // for simhash the whole sketch query is aggregation-free
    val sim = SparkEntry.queries("dedup_simhash")(spark, sfDir)
    val simPlan = sim.queryExecution.sparkPlan
    assert(simPlan.collect {
      case g: org.apache.spark.sql.execution.GenerateExec => g }.isEmpty,
      "simhash sketch must not explode tokens")
    assert(simPlan.collect {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
      case o: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => o
      case s: org.apache.spark.sql.execution.aggregate.SortAggregateExec => s }.isEmpty,
      "simhash sketch must not aggregate")
    sim.collect()
    val p = sim.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(p.linesIterator.exists(l => l.contains("simhash64") && l.contains("*(")),
      s"simhash64 must sit inside a codegen'd operator:\n$p")
    // minhash still explodes the BAND array (4 rows/doc, by design) but
    // must not explode shingles: every Generate's output is band-shaped
    val mh = SparkEntry.queries("dedup_fuzzy_minhash")(spark, sfDir)
    val gens = mh.queryExecution.sparkPlan.collect {
      case g: org.apache.spark.sql.execution.GenerateExec => g }
    assert(gens.nonEmpty, "banding posexplode expected")
    gens.foreach(g => assert(
      g.output.map(_.name).exists(n => n == "band" || n == "pos"),
      s"unexpected non-band Generate (shingle explode?):\n$g"))
  }

  test("join_semi: planned as a semi join, not inner+distinct") {
    val p = plan("join_semi")
    assert(p.contains("LeftSemi"), p.linesIterator.take(25).mkString("\n"))
  }

  test("text_decontaminate: benchmark shingles broadcast into a semi join") {
    // the corpus side must NOT shuffle — the whole point at 100 TB
    val p = plan("text_decontaminate")
    assert(p.contains("LeftSemi"), p.linesIterator.take(30).mkString("\n"))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoop"),
      p.linesIterator.take(30).mkString("\n"))
  }

  test("join_range_block: idx side broadcasts (nested loop over the tiny index)") {
    val p = plan("join_range_block")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("join_range_block: idx built distributed — no unpartitioned WindowExec") {
    val df = SparkEntry.queries("join_range_block")(spark, sfDir)
    val wins = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty, "expected the per-partition two-phase rank window")
    wins.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"data-sized single-partition WindowExec found:\n$w"))
  }

  test("join_bucketed_colocated: no exchange under the join (bucketed co-location)") {
    val df = SparkEntry.queries("join_bucketed_colocated")(spark, sfDir)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    val plan = df.queryExecution.sparkPlan
    val joins = plan.collect {
      case j: SortMergeJoinExec => j: SparkPlan
      case j: ShuffledHashJoinExec => j: SparkPlan
    }
    assert(joins.nonEmpty, s"expected a co-located join:\n$plan")
    joins.foreach { j =>
      val shuffles = j.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty, s"bucketed join must not shuffle its inputs:\n$j")
    }
  }

  test("join_skew_salted: shuffled join on the salted key, never broadcast") {
    val df = SparkEntry.queries("join_skew_salted")(spark, sfDir)
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    val plan = df.queryExecution.sparkPlan
    // broadcast would sidestep the hot-key shuffle this query exists to
    // demonstrate; the salt must be in the join keys
    assert(plan.collect { case j: BroadcastHashJoinExec => j }.isEmpty,
      s"salted join must take the shuffle path:\n$plan")
    val shuffled = plan.collect {
      case j: SortMergeJoinExec => j.leftKeys
      case j: ShuffledHashJoinExec => j.leftKeys
    }
    assert(shuffled.nonEmpty, s"expected a shuffled join:\n$plan")
    assert(shuffled.head.exists(_.toString.toLowerCase.contains("salt")),
      s"join keys must include the salt, got ${shuffled.head}")
  }

  test("sim_ann_pq: encode is one narrow codegen pass — no join, window, or explode") {
    // codebook + ADC table are plan literals (driver-side model artifacts);
    // encoding must compile to scan → project(pq_encode) → top-k, with no
    // centroid join, no argmin window, and no subspace explode — the
    // round-3 relational shape recomputed an interpreted dist subtree
    // twice and inflated 8-9× under CPU contention
    val df = SparkEntry.queries("sim_ann_pq")(spark, sfDir)
    val p = df.queryExecution.sparkPlan
    assert(p.collect { case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }.isEmpty,
      s"PQ encode must not join:\n$p")
    assert(p.collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }.isEmpty,
      s"PQ encode must not window:\n$p")
    assert(p.collect { case g: org.apache.spark.sql.execution.GenerateExec => g }.isEmpty,
      s"PQ encode must not explode:\n$p")
    assert(p.toString.contains("TakeOrderedAndProject"),
      s"top-k must compile to TakeOrderedAndProject:\n$p")
    df.collect() // finalize the AQE plan
    val simple = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(simple.linesIterator.exists(l => l.contains("pq_encode") && l.contains("*(")),
      s"pq_encode must sit inside a codegen'd operator:\n$simple")
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // the 100 TB shape: a selective dim filter should cut fact-side shuffle
    // input BEFORE the exchange via an injected bloom filter (Catalyst's
    // InjectRuntimeFilter). Thresholds are production-sized, so shrink them
    // to test scale; GraftSession keeps the feature on for deployments.
    import org.apache.spark.sql.functions.col
    val c = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> c.getOption(k))
    try {
      c.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      c.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the shuffle-join shape
      val fact = Tables.t(spark, sfDir, "lineitem").select("l_orderkey", "l_quantity")
      val dim = Tables.t(spark, sfDir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
      val joined = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"))
      val opt = joined.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain") && opt.contains("bloom_filter_agg"),
        s"expected an injected runtime bloom filter:\n$opt")
      // and the filtered join still returns the right rows
      assert(joined.count() ==
        fact.join(dim.hint("broadcast"), fact("l_orderkey") === dim("o_orderkey")).count())
    } finally saved.foreach { case (k, v) => v.fold(c.unset(k))(c.set(k, _)) }
  }

  test("pipeline_pack_sequences: global prefix sum runs bucket-partitioned, offsets broadcast") {
    val df = SparkEntry.queries("pipeline_pack_sequences")(spark, sfDir)
    val plan = df.queryExecution.sparkPlan
    // the whole point of the two-phase form: the per-doc running sum must
    // NOT be an unpartitioned (single-task) window over the corpus
    val wins = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty, "expected the per-bucket running-sum window")
    wins.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"data-sized single-partition WindowExec found:\n$w"))
    // the driver-prefixed bucket offsets join back as a broadcast, never a
    // shuffle of the corpus side
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(30).mkString("\n"))
    assert(!p.contains("SortMergeJoin"), "offset join must broadcast")
  }

  test("dedup_chunk_exact: first-occurrence window partitions by chunk content") {
    val df = SparkEntry.queries("dedup_chunk_exact")(spark, sfDir)
    val wins = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty, "expected the first-occurrence window")
    wins.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"chunk dedup must shard by content, got single-partition window:\n$w"))
  }

  test("text_lm_score: vocab and total ride as broadcasts, no sort-merge join") {
    val p = plan("text_lm_score")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      p.linesIterator.take(30).mkString("\n"))
    assert(!p.contains("SortMergeJoin"), "the V-row model must broadcast")
  }

  test("sample_stratified: pure map-side filter — no data-sized exchange") {
    val df = SparkEntry.queries("sample_stratified")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("SortMergeJoin"), "thresholds must broadcast")
    // the documents side must reach its joins without shuffling: the only
    // hash exchanges allowed are under the tiny aggregations feeding the
    // broadcasts; the scan side feeds straight into BroadcastHashJoin
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("split_points: two-phase ranking — every window is pid-PARTITIONED, offsets broadcast") {
    val df = SparkEntry.queries("split_points")(spark, sfDir)
    val wins = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty, "expected the local-rank window")
    // round-14 design: no global window anywhere — local ranks run per
    // range partition, global rank = local + broadcast offset
    wins.foreach(w =>
      assert(w.partitionSpec.nonEmpty, s"unpartitioned window crept back in:\n$w"))
    df.collect()
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(p.contains("BroadcastHashJoin"), s"offset join must broadcast:\n$p")
    // and the result still matches the one-window definition bit for bit
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val wOld = Window.orderBy("urlkey", "ts", "id")
    val old = Cdx.df(spark, sfDir)
      .filter(col("id") % graft.queries.Relational.SplitSampleMod === 0)
      .select(col("urlkey"), row_number().over(wOld).as("rn"),
        count(lit(1)).over().as("cnt"))
      .filter(col("rn") % ceil(col("cnt") / graft.queries.Relational.DefaultSplits)
        .cast("bigint") === 0 && col("rn") < col("cnt"))
      .select(col("urlkey").as("boundary"), col("rn"))
      .orderBy("rn").collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    val got = df.collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(got == old, s"two-phase boundaries differ from the one-window reference: $got vs $old")
  }

  test("agg_pivot: explicit values keep pivot one scan; second agg level runs on reduced rows") {
    val p = plan("agg_pivot")
    // Spark plans pivot as a TWO-LEVEL aggregate: first reduce by
    // (l_returnflag, l_linestatus), then pivot-aggregate the reduced rows
    // — the second exchange moves |groups| rows, not the corpus. With the
    // values list given there is no distinct-discovery job, so exactly one
    // corpus scan and three exchanges (pre-agg hash, pivot hash, sort).
    val scans = p.linesIterator.count(_.trim.matches("""\(\d+\) Scan parquet.*"""))
    assert(scans == 1, s"one corpus scan expected, got $scans:\n$p")
    val exchangeOps = p.linesIterator.count(_.trim.matches("""\(\d+\) Exchange"""))
    assert(exchangeOps == 3, s"pre-agg + pivot + sort exchanges expected, got $exchangeOps:\n$p")
  }

  test("agg_unpivot: melt is a narrow Expand — only the final sort exchanges") {
    val p = plan("agg_unpivot")
    assert(p.contains("Expand"), s"unpivot should plan as Expand:\n$p")
    val exchangeOps = p.linesIterator.count(_.trim.matches("""\(\d+\) Exchange"""))
    assert(exchangeOps == 1, s"only the output sort may exchange, got $exchangeOps:\n$p")
  }

  test("agg_grouping_sets: marginals expand in one scan") {
    val p = plan("agg_grouping_sets")
    assert(p.contains("Expand"), s"grouping sets should plan as Expand:\n$p")
    val scans = p.linesIterator.count(_.trim.matches("""\(\d+\) Scan parquet.*"""))
    assert(scans == 1, s"one corpus scan expected, got $scans:\n$p")
  }

  test("corpus_shuffle: one sampled range exchange, like sort_global") {
    val p = plan("corpus_shuffle")
    assert(p.contains("rangepartitioning"), p)
    val exchangeOps = p.linesIterator.count(_.trim.matches("""\(\d+\) Exchange"""))
    assert(exchangeOps == 1, s"single exchange expected, got $exchangeOps:\n$p")
  }

  test("emb_quantize_int8: stats agg has no explode; stats broadcast back") {
    val p = plan("emb_quantize_int8")
    assert(!p.contains("Generate"),
      s"per-dim stats must come from array-indexed aggs, not explode:\n$p")
    assert(p.contains("BroadcastExchange"),
      s"the one-row stats relation must broadcast:\n$p")
  }

  test("sample_per_group: rank window partitions by group") {
    val df = SparkEntry.queries("sample_per_group")(spark, sfDir)
    val wins = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty, "expected the per-group rank window")
    wins.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"per-group sampling must not use a global window:\n$w"))
  }

  test("agg_topk_terms: TakeOrderedAndProject over a two-phase aggregate") {
    val p = plan("agg_topk_terms")
    assert(p.contains("TakeOrderedAndProject"), p.linesIterator.take(15).mkString("\n"))
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      "term counting must run partial+final")
  }

  test("join_set_similarity: never degrades to an all-pairs join; windows stay per-doc") {
    val df = SparkEntry.queries("join_set_similarity")(spark, sfDir)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "prefix filtering exists precisely to avoid the all-pairs plan")
    val wins = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    wins.foreach(w => assert(w.partitionSpec.nonEmpty,
      "the prefix-rank window must partition by doc_id, never run global"))
  }

  test("dedup_bloom_prefilter: the bloom probe filters BELOW the anti-join, inside codegen") {
    val df = SparkEntry.queries("dedup_bloom_prefilter")(spark, sfDir)
    df.collect() // finalize the AQE plan for THIS query execution
    val p = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(p.contains("LeftAnti"), "exact verification is an anti join")
    // the probe is the native kernel — it must appear as a Filter
    // condition feeding the join (candidates only) and, negated, on the
    // fast path — and it must sit inside a codegen'd (starred) operator,
    // the invariant the old Scala-closure UDF broke
    assert(p.contains("bloom_might_contain"),
      s"native bloom probe missing from the plan:\n${p.take(2000)}")
    assert(!p.contains("UDF("), "no Scala UDF may remain on the probe path")
    assert(p.linesIterator.exists(l => l.contains("bloom_might_contain") && l.contains("*(")),
      s"bloom probe must sit inside a codegen'd (starred) operator:\n$p")
  }

  test("crawl_diff: one partial+final HASH aggregation, no self-join, no window") {
    val df = SparkEntry.queries("crawl_diff")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("Join") && !p.contains("Window"),
      s"the diff must be a single aggregation, not a self-join/window:\n$p")
    // primitive (long) max buffers keep it HashAggregate — a string key
    // would demote to SortAggregate and per-partition-sort the corpus
    assert(p.contains("HashAggregate") && !p.contains("SortAggregate"),
      s"conditional-max buffers must stay primitive (HashAggregate):\n$p")
    // AQE "simple" mode prints the Initial Plan after the Final one —
    // count exchanges in the final section only
    val finalP = p.split("== Initial Plan ==")(0)
    val hashEx = finalP.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx == 1, s"exactly one corpus shuffle expected ($hashEx):\n$p")
  }

  test("cdx_acl_policy: rule sweep is a pure map-side projection — no join, no shuffle before the output sort") {
    val df = SparkEntry.queries("cdx_acl_policy")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("Join"),
      s"the rule table must compile into the projection, not join:\n$p")
    // the only exchange allowed is the single range exchange of the
    // deterministic output orderBy — the policy decision itself rides
    // the scan
    val finalP = p.split("== Initial Plan ==")(0)
    assert(!finalP.contains("Exchange hashpartitioning"),
      s"ACL application must not shuffle:\n$p")
    assert(finalP.linesIterator.count(_.contains("Exchange rangepartitioning")) <= 1, p)
    // the startswith chain must sit inside whole-stage codegen
    assert(p.linesIterator.exists(l => l.contains("Project") && l.contains("*(")) ||
      finalP.linesIterator.exists(_.startsWith("*(")),
      s"rule chain must stay in codegen:\n$p")
  }

  test("robots_check: winner window REUSES the captures-rules join exchange; no cartesian") {
    val df = SparkEntry.queries("robots_check")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    // rank pushdown: only each (host,id)'s top row survives the sort
    assert(p.contains("WindowGroupLimit"), s"rank pushdown lost:\n$p")
    // THE headline property: no Exchange between the winner window and
    // the captures-rules join below it — the window's (host,id)
    // clustering is satisfied by the join's HashPartitioning(host)
    val lines = p.linesIterator.toIndexedSeq
    val wi = lines.indexWhere(_.contains("row_number() windowspecdefinition(host"))
    val ji = lines.indexWhere(l => l.contains("Join [host") && l.contains("StartsWith"), wi)
    assert(wi >= 0 && ji > wi, s"expected window above the rules join:\n$p")
    val between = lines.slice(wi + 1, ji).filter(_.contains("Exchange "))
    assert(between.isEmpty, s"window no longer reuses the join exchange:\n$p")
  }

  test("cdx_policy_gate: the ACL verdict rides the robots join — no second verdict join") {
    val df = SparkEntry.queries("cdx_policy_gate")(spark, sfDir)
    df.collect()
    val full = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    // the simple mode prints Final AND Initial plans — count in the final only
    val p = full.split("== Initial Plan ==")(0)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    // exactly ONE join touches the capture corpus (the StartsWith
    // residual one robots_check owns); a verdict-join on id would add a
    // second corpus-sized join
    val corpusJoins = p.linesIterator.count(l => l.contains("Join") && l.contains("StartsWith"))
    assert(corpusJoins == 1, s"expected one captures-rules join, got $corpusJoins:\n$p")
    assert(!p.contains("Join [id"), s"verdict re-join on id crept in:\n$p")
  }

  test("stream_recent_k: ONE stateful exchange feeds TransformWithState, no second data shuffle") {
    // RocksDB provider for batch-run transformWithState (see StreamOps)
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val df = SparkEntry.queries("stream_recent_k")(spark, sfDir)
      df.collect()
      val p = df.queryExecution.explainString(ExplainMode.fromString("simple"))
      assert(p.contains("TransformWithState"), s"expected the v2 stateful operator:\n$p")
      // exactly one corpus-sized exchange: the key hash-partitioning the
      // stateful operator REQUIRES; everything above it is the bounded
      // changelog (the presentation sort's range exchange rides on that)
      val hashEx = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(hashEx == 1,
        s"the stateful key exchange must be the only data shuffle ($hashEx found):\n$p")
      assert(p.contains("REQUIRED_BY_STATEFUL_OPERATOR"),
        s"the exchange must be the operator's own requirement, not an extra repartition:\n$p")
    } finally prevProvider match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("text_bpe_encode: segmentation is map-side native-kernel work inside codegen") {
    val df = SparkEntry.queries("text_bpe_encode")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(p.contains("bpe_piece_count"),
      s"native BPE kernel missing from the plan:\n${p.take(2000)}")
    assert(!p.contains("UDF("), "no Scala UDF may remain on the encode path")
    assert(p.linesIterator.exists(l => l.contains("bpe_piece_count") && l.contains("*(")),
      s"BPE segmentation must sit inside a codegen'd (starred) operator:\n$p")
    // encoding itself must not shuffle: beyond the orderBy's range
    // partitioning, the only allowed exchange is the r15 scan fan-out
    // (Tables.fanOut — doc_id hash, identity at scale), which sits BELOW
    // the kernel; no aggregate/join may shuffle the corpus
    val hashEx = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.forall(_.contains("doc_id")),
      s"only the doc_id scan fan-out may hash-shuffle:\n$p")
  }

  test("join_dpp_partitioned: the fact scan dynamically prunes to the 8 weekend partitions") {
    val df = SparkEntry.queries("join_dpp_partitioned")(spark, sfDir)
    df.collect()
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
    }.flatten
    val factScan = scans(df.queryExecution.executedPlan)
      .filter(_.partitionFilters.exists(_.toString.contains("dynamicpruning")))
    assert(factScan.nonEmpty,
      "the day-partitioned fact scan must carry a dynamicpruningexpression")
    val nParts = factScan.head.metrics("numPartitions").value
    assert(nParts == 8,
      s"DPP must prune the scan to the 8 weekend day-partitions, read $nParts")
  }

  test("sink_ccindex: the (crawl, subset) filter statically prunes the columnar index scan") {
    val df = SparkEntry.queries("sink_ccindex")(spark, sfDir)
    df.collect()
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
    }.flatten
    val scan = scans(df.queryExecution.executedPlan)
    assert(scan.nonEmpty, "expected a parquet scan of the columnar index")
    assert(scan.head.partitionFilters.nonEmpty,
      "the crawl/subset predicates must be PARTITION filters, not data filters")
    // 8 crawls x 2 subsets on disk; the query reads exactly one cell
    val nParts = scan.head.metrics("numPartitions").value
    assert(nParts == 1,
      s"static pruning must reduce 16 (crawl, subset) cells to 1, read $nParts")
  }

  test("cdc_compact_changelog: last-writer-wins compacts as a mergeable agg, not a window") {
    val df = SparkEntry.queries("cdc_compact_changelog")(spark, sfDir)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("Window"),
      "compaction must be max_by partial+final, never a per-key history window")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      "expected map-side partial + final aggregation")
  }

  test("join_interval_bucket: the bucket rewrite plans an equi-join, never NLJ/cartesian") {
    val p = plan("join_interval_bucket")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the bucket equi-join rewrite exists precisely to avoid the theta-join plan")
    assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin"),
      s"expected the shuffled equi-join shape (neither side broadcastable at scale):\n${p.take(1500)}")
  }

  test("emb_knn_graph: per-src top-k group-limits before the window shuffle") {
    val df = SparkEntry.queries("emb_knn_graph")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(p.contains("WindowGroupLimit"),
      "Spark's rank-limit pushdown must prune candidates before the final window")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "candidates must come from the (table, bucket) equi-join")
  }

  test("text_gopher_rules: the whole rule panel is map-side — only the output sort exchanges") {
    val p = plan("text_gopher_rules")
    val exchangeOps = p.linesIterator.filter(_.trim.matches("""\(\d+\) Exchange.*""")).toSeq
    assert(exchangeOps.size == 1 && p.contains("rangepartitioning"),
      s"one range exchange (output sort) expected:\n${exchangeOps.mkString("\n")}")
    assert(!p.contains("Generate"), "HOF filters must not explode")
    assert(!p.contains("HashAggregate"), "the panel is a projection, not an aggregation")
  }

  test("html_main_content: page build + chrome strip + block classifier are one map-side pass") {
    val p = plan("html_main_content")
    val exchangeOps = p.linesIterator.filter(_.trim.matches("""\(\d+\) Exchange.*""")).toSeq
    assert(exchangeOps.size == 1 && p.contains("rangepartitioning"),
      s"one range exchange (output sort) expected:\n${exchangeOps.mkString("\n")}")
    assert(!p.contains("Generate"),
      "block split/classify are HOFs over the array — no explode")
    assert(!p.contains("HashAggregate") && !p.contains("Join"),
      "the extractor is a projection: no aggregate, no join")
  }

  test("html_links: extraction is map-side; the single Generate is the output posexplode") {
    val p = plan("html_links")
    // two exchanges: the r15 scan fan-out (doc_id hash — Tables.fanOut,
    // identity at scale) below the extraction, plus the output range sort
    val exchangeOps = p.linesIterator.filter(_.trim.matches("""\(\d+\) Exchange.*""")).toSeq
    assert(exchangeOps.size <= 2 && p.contains("rangepartitioning"),
      s"fan-out hash + output range sort expected:\n${exchangeOps.mkString("\n")}")
    assert(p.linesIterator.filter(_.contains("Exchange hashpartitioning"))
      .forall(_.contains("doc_id")),
      s"only the doc_id scan fan-out may hash-shuffle:\n$p")
    val gens = p.linesIterator.count(_.trim.matches("""\(\d+\) Generate.*"""))
    assert(gens == 1, s"exactly the output posexplode may Generate, got $gens")
    assert(!p.contains("HashAggregate") && !p.contains("Join"),
      "anchor extraction + href resolution are projections")
  }

  test("filter_url_blocklist: corpus side is one broadcast join, PSL runs on distinct hosts") {
    val df = SparkEntry.queries("filter_url_blocklist")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    // the CAPTURE-side join is the broadcast left join on host; the PSL
    // subtree (over DISTINCT hosts — the url_registered_domain exchange
    // class) may sort-merge internally (lab ⋈ best), which is fine: it
    // is bounded by |hosts|, never the corpus
    assert(p.contains("BroadcastHashJoin"), "blocked-host set must broadcast")
    assert(!p.contains("CartesianProduct"), "no cartesian anywhere")
    val smj = p.linesIterator.filter(_.contains("SortMergeJoin")).toSeq
    assert(smj.forall(_.contains("[host")),
      s"any sort-merge join must be the PSL host-keyed one, got: $smj")
    // the PSL machinery (explode + window) must sit on the DISTINCT host
    // aggregation's subtree, never the capture lineage: every Generate in
    // the plan is the suffix-candidate explode over host labels
    val gens = p.linesIterator.filter(_.contains("Generate")).toSeq
    assert(gens.nonEmpty && gens.forall(_.contains("sequence(1")),
      s"only the PSL suffix explode may Generate: $gens")
  }

  test("crawl_politeness: one host exchange feeds both window frames") {
    val p = plan("crawl_politeness")
    // formatted mode: op headers `(n) Exchange` with Arguments on the
    // next lines — exactly two exchanges total (hash on host + the
    // output range sort), and the host hash appears once
    val exchanges = p.linesIterator.count(_.trim.matches("""\(\d+\) Exchange.*"""))
    assert(exchanges == 2, s"two exchanges (host hash + output range) expected, got $exchanges")
    assert(p.linesIterator.count(_.contains("hashpartitioning(host")) == 1,
      "exactly one hash exchange on host")
    val sorts = p.linesIterator.count(_.trim.matches("""\(\d+\) Sort.*"""))
    assert(sorts == 2, s"two sorts (window-local + output) expected, got $sorts")
    assert(p.linesIterator.count(_.trim.matches("""\(\d+\) Window.*""")) == 2,
      "rn + running max are two Window nodes sharing the exchange")
  }

  test("pipeline_quality_funnel: the dedup window's exchange is the only data-sized one") {
    val df = SparkEntry.queries("pipeline_quality_funnel")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(p.contains("dedup_key"), "the first-occurrence window must key on (lang, dedup_key)")
    // the r12 blocklist stage joins the bounded blocked-host set as a
    // BROADCAST — the corpus side must never join-shuffle, and the only
    // Generate allowed is the PSL suffix explode inside that bounded
    // broadcast subtree (a second one would mean the page build or a
    // panel regressed into an explode)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      "the blocklist stage must broadcast; the corpus never join-shuffles")
    assert(p.contains("BroadcastHashJoin"), "blocked-host set must join as a broadcast")
    // the PSL explode is explode(sequence(1, n)) over host labels; it may
    // print once per join branch of the bounded subtree — what matters is
    // that NO OTHER Generate exists (a page-build or panel regression
    // into explode would carry a different generator expression)
    val gens = p.linesIterator.filter(_.contains("Generate")).toSeq
    assert(gens.forall(_.contains("sequence(1")),
      s"only the PSL suffix explode may Generate; got: $gens")
    // partial+final agg: the lang rollup shuffles partials, not the corpus
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      "lang rollup must run partial+final")
  }

  test("unpartitioned windows: every driver key's WindowExec is partitioned or allowlisted") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    // A WindowExec with no partitionSpec moves ALL data to one partition
    // — fatal at 100 TB. The bench tail's "No Partition Defined" warnings
    // were adjudicated bounded (documented sample/spine/lang-table
    // inputs); this sweep ENFORCES that adjudication: a new key shipping
    // an unbounded single-partition window fails here, not in review.
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val inner = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        case _ => p.children
      }
      p +: (inner ++ p.subqueries).flatMap(nodes)
    }
    // key -> why its unpartitioned window is bounded (the documented sites)
    val allow = Map(
      "agg_drift_report" -> ("Aggregates.scala drift spine: the window runs on the " +
        "per-(column,bin) rollup — at most |columns|x|bins| rows (~13 here)"),
      "sample_temperature" -> ("Llm.scala mix table: the window runs on the " +
        "per-language weight table — |langs| rows"))
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { k =>
      val df = SparkEntry.queries(k)(spark, sfDir)
      val n = nodes(df.queryExecution.executedPlan).count {
        case w: WindowExec => w.partitionSpec.isEmpty
        case w: WindowGroupLimitExec => w.partitionSpec.isEmpty
        case _ => false
      }
      if (n > 0) Seq(k -> n) else Nil
    }
    val unexpected = offenders.filterNot { case (k, _) => allow.contains(k) }
    assert(unexpected.isEmpty,
      s"unpartitioned WindowExec outside the allowlist: $unexpected — either " +
        "repartition the window or document the bounded input and allowlist it")
    // the allowlist must stay honest: an entry whose window disappeared
    // is stale documentation
    val stale = allow.keys.filterNot(k => offenders.exists(_._1 == k))
    assert(stale.isEmpty, s"stale allowlist entries (no unpartitioned window anymore): $stale")
  }

  test("url_agnostic_dedup: ONE partial+final digest HASH aggregation, no join anywhere") {
    val p = plan("url_agnostic_dedup")
    assert(!p.contains("Join"), "the audit is a single aggregation, never a join")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      "digest agg must run partial+final")
    // a string min/max buffer demotes the whole agg to SortAggregate —
    // a corpus sort; the bigint ts form keeps it hash
    assert(!p.contains("SortAggregate"), "agg must stay HASH, not sort")
    assert(!p.contains("Window"), "no window — mergeable aggregates only")
  }

  test("cdx_fuzzy_resolve_batch: canonical equi-join broadcasts; corpus never sort-merges") {
    val p = plan("cdx_fuzzy_resolve_batch")
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.filter(_.contains("Join")).mkString("\n"))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "the query canon set must broadcast — the index side never shuffles for resolution")
  }

  test("scan_warc_segments: segment rows shuffle once on the origin key; plain rows pass through") {
    val df = SparkEntry.queries("scan_warc_segments")(spark, sfDir)
    df.collect()
    // final plan only — the AQE explain repeats operators in its
    // "Initial Plan" section and would double-count the exchange
    val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
      .split("== Initial Plan ==").head
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      "reassembly is a grouped stitch, never a join")
    // exactly one data exchange: the okey hash partitioning into the
    // flatMapGroups (the union's plain leg is exchange-free)
    val exchanges = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected the single origin-key exchange:\n$p")
  }

  test("crawl_recrawl_schedule: shared urlkey exchange, one host shuffle, delays broadcast") {
    val p = plan("crawl_recrawl_schedule")
    // the lag window and the per-urlkey rollup must share ONE urlkey
    // exchange (the crawl_change_rate adjudication); the schedule window
    // is the single host shuffle; robots delays ride as a broadcast
    assert(p.linesIterator.count(_.contains("hashpartitioning(urlkey")) == 1,
      "lag window + rollup must share one urlkey exchange")
    // the robots-delays derivation adds small host exchanges on its
    // BOUNDED side (the 8-row fixture table feeding the broadcast);
    // the corpus-sized one is the schedule window's — the only host
    // exchange whose input carries the frontier columns
    val blocks = p.split("\n\n")
    val corpusHostEx = blocks.count(b =>
      b.contains("Arguments: hashpartitioning(host") && b.contains("desired_us"))
    assert(corpusHostEx == 1,
      s"exactly one corpus-sized host exchange for the schedule window, got $corpusHostEx")
    assert(p.contains("BroadcastHashJoin"), "robots delays must broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "nothing may join-shuffle the urlkey table")
  }

  test("mm_jpeg_decode: one narrow mapPartitions pass, no joins or aggregates") {
    val p = plan("mm_jpeg_decode")
    assert(!p.contains("Join") && !p.contains("HashAggregate"),
      "the lossy decode is per-row — nothing relational before the sort")
    val exchangeOps = p.linesIterator.filter(_.trim.matches("""\(\d+\) Exchange.*""")).toSeq
    assert(exchangeOps.size == 1 && p.contains("rangepartitioning"),
      s"one range exchange (output sort) expected:\n${exchangeOps.mkString("\n")}")
    assert(p.contains("MapPartitions"), "codec init must amortize per partition")
  }

  test("emb_kmeans: assignment is one narrow codegen pass — no join, no window, no explode") {
    val p = plan("emb_kmeans")
    // the centroids ride as plan literals: a centroid JOIN or an argmin
    // WINDOW in this plan would mean the 100 TB assignment pass shuffles
    assert(!p.contains("Join") && !p.contains("Window") && !p.contains("Generate"),
      "k-means assignment must stay map-side against literal centroids")
    val exchangeOps = p.linesIterator.filter(_.trim.matches("""\(\d+\) Exchange.*""")).toSeq
    assert(exchangeOps.size == 1 && p.contains("rangepartitioning"),
      s"one range exchange (output sort) expected:\n${exchangeOps.mkString("\n")}")
  }

  test("agg_heavy_hitters: the MG summary combines MAP-SIDE (partial ObjectHashAggregate)") {
    val p = plan("agg_heavy_hitters")
    // a TypedImperativeAggregate plans as ObjectHashAggregate; the
    // partial mode is the whole scale story — without it every raw row
    // crosses the wire instead of ≤ capacity pairs per partition
    assert(p.contains("ObjectHashAggregate"), "summary must plan as ObjectHashAggregate")
    assert(p.contains("partial_heavy_hitters") || p.contains("partial heavy_hitters"),
      "partial (map-side) aggregation must precede the exchange")
  }

  test("search_bm25_rank: stats ride as broadcasts, top-k avoids a global sort") {
    val df = SparkEntry.queries("search_bm25_rank")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    // the 1-row corpus stats and the ≤|terms|-row df relation broadcast;
    // the only sort-merge-eligible join is tf⋈dl on doc_id
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), "1-row stats must broadcast, not cartesian")
    assert(p.contains("TakeOrderedAndProject"), "top-20 must not globally sort")
  }
}
