package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators: selecting what goes INTO a training mix.
  * No reference analog (the reference indexes archives; choosing data is
  * the LLM-pipeline north star, SURVEY §2.10). */
object Corpus {

  /** Per-group token-budget fill: keep each group's highest-quality
    * documents until the group's token budget is spent — the core
    * corpus-mixing primitive ("N billion tokens per language/source").
    *
    * Precondition: `tokensCol` values must be >= 0 (token counts are).
    * The level-pruning step below drops a whole quality level once the
    * PRECEDING levels' token sum exceeds the budget; with a negative
    * token value the naive running sum could dip back under budget and
    * admit later documents this pruned form never sees, breaking the
    * hash-equality to the naive window. All in-repo producers
    * ([[graft.ops.Text.wordCount]] / [[graft.ops.Text.bpeEstimate]])
    * satisfy this; an
    * external caller feeding signed "token deltas" does not.
    *
    * Semantics are EXACTLY the naive form — one window per group ordered
    * by (quality DESC, id), keep rows whose running token sum stays
    * within budget — which is also the DuckDB oracle. But the naive
    * window is a scale-killer at 100 TB: `PARTITION BY lang` is a
    * handful of partitions, so the whole corpus funnels through a
    * handful of tasks. This implementation is hash-equal yet scale-safe:
    *
    *   1. aggregate token sums per (group, quality LEVEL). Quality
    *      scores arrive 6-dp-rounded ([[Text.qualityScore]]), so levels
    *      are a bounded domain (≤ 1e6 + 1 values) regardless of corpus
    *      size, and the shuffle key (group, level) is uniformly spread;
    *   2. one window over the AGGREGATED relation — rows are levels,
    *      not documents, so the per-group partition is ≤ 1e6 rows at
    *      ANY corpus size — gives each level its tokens-before prefix;
    *   3. levels with budget remaining (`cum_before <= budget`; `<=` so
    *      a zero-token document landing exactly on the budget survives,
    *      as it does in the naive order) join their documents back on
    *      the same well-spread key, and the per-document running sum
    *      windows by (group, level) — far finer than group alone. Only
    *      the boundary level actually needs it; interior levels pass the
    *      filter wholesale. A degenerate corpus where most documents
    *      share one quality value re-concentrates that window; the
    *      level aggregation makes per-level volume visible first, so a
    *      caller can pre-salt or widen the quality precision.
    */
  def budgetFill(
      docs: DataFrame, groupCol: String, qualityCol: String,
      tokensCol: String, idCol: String, budget: Long): DataFrame = {
    // null-quality docs are EXCLUDED, explicitly: they cannot rank in a
    // quality-ordered fill, and leaving them in would have them vanish
    // implicitly through the null-unsafe level join below — the silent
    // version of the same decision
    val ranked = docs.filter(col(qualityCol).isNotNull)
    val levels = ranked.groupBy(groupCol, qualityCol)
      .agg(sum(tokensCol).as("level_tokens"))
    val wLevel = Window.partitionBy(groupCol).orderBy(col(qualityCol).desc)
    val open = levels
      .withColumn("cum_before", coalesce(
        sum("level_tokens").over(
          wLevel.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("cum_before") <= budget)
      .select(col(groupCol), col(qualityCol), col("cum_before"))
    val wDoc = Window.partitionBy(groupCol, qualityCol).orderBy(idCol)
    ranked.join(open, Seq(groupCol, qualityCol))
      .withColumn("cum_tokens", col("cum_before") + sum(tokensCol).over(wDoc))
      .filter(col("cum_tokens") <= budget)
      .drop("cum_before")
  }

  /** Sequence packing: assign every document to a fixed-token-budget
    * training sequence in global `idCol` order — the step that turns a
    * curated corpus into the ~context-length chunks a trainer consumes.
    * `seq_id = floor(tokens_before_me / seqBudget)`, where
    * `tokens_before_me` is the GLOBAL prefix sum of `tokensCol` over
    * ascending id. Output adds (`cum_before`, `seq_id`) to the input.
    *
    * The naive form is one un-partitioned window — a single-partition
    * scale-killer (every row through one task). This is hash-equal but
    * two-phase, the distributed-prefix-sum shape:
    *
    *   1. bucket docs by the monotone key bucketizer `id DIV bucketWidth`
    *      and aggregate one token total per bucket (map-side partial
    *      combine; shuffle volume = #buckets);
    *   2. prefix-sum the bucket totals on the driver — O(#buckets), a
    *      bounded model artifact like the k-means centroids, NOT data
    *      (caller sizes bucketWidth so keyspace/bucketWidth stays ~1e5–1e6
    *      at any corpus size) — and broadcast-join the offsets back;
    *   3. one window PER BUCKET (≤ bucketWidth rows each) adds the
    *      within-bucket running sum to the bucket's global offset.
    *
    * Requires nonnegative ids (`DIV` truncates toward zero, which would
    * misorder negative buckets) and ids unique in the input. For a
    * non-integer or badly skewed key domain, substitute step 1's
    * bucketizer with range-partition bounds from `approx_percentile` —
    * monotonicity of bucket id in key order is the only property used.
    */
  def packSequences(
      docs: DataFrame, idCol: String, tokensCol: String,
      seqBudget: Long, bucketWidth: Long = 1L << 20): DataFrame = {
    require(seqBudget > 0 && bucketWidth > 0, "budgets must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val b = docs.withColumn(
      "gp_bucket", expr(s"CAST(`$idCol` AS BIGINT) DIV $bucketWidth"))
    // the driver artifact must stay bounded: a SPARSE id domain (e.g.
    // snowflake ids) with a small bucketWidth degenerates to ~one bucket
    // per row, which would turn this collect into a data-sized driver
    // transfer. The limit(cap+1) bounds the TRANSFER itself (the agg still
    // runs distributed, but at most cap+1 rows ever reach the driver), so
    // the overrun fails loudly here instead of as a driver OOM — the
    // caller widens bucketWidth (or pre-densifies ids via row_number).
    val bucketCap = 4 << 20
    val totals = b.groupBy("gp_bucket")
      .agg(sum(col(tokensCol)).cast("long").as("btot"))
      .limit(bucketCap + 1)
      .collect()
      // an all-null bucket sums to null; the naive window's sum() skips
      // nulls, so null contributes 0 here for hash-parity with the oracle
      .map { r =>
        // a null id bucket means null ids in the input: fail with the
        // precondition, not a bare driver NPE from getLong — and the
        // rows would anyway vanish in the offset join below, silently
        // breaking the documented naive-window hash-equality
        require(!r.isNullAt(0),
          s"packSequences: null $idCol values in the input — ids must be non-null")
        (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
      }
      .sortBy(_._1)
    require(totals.length <= bucketCap,
      s"packSequences: more than $bucketCap buckets; " +
        s"raise bucketWidth (=$bucketWidth) so keyspace/bucketWidth stays ~1e5-1e6")
    // prefix: bucket k's offset = sum of totals of buckets < k
    var acc = 0L
    val offRows = totals.map { case (bk, t) => val o = (bk, acc); acc += t; o }
    val offDf = broadcast(offRows.toSeq.toDF("gp_bucket", "gp_offset"))
    val w = Window.partitionBy("gp_bucket").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    b.join(offDf, "gp_bucket")
      .withColumn("cum_before",
        col("gp_offset") + coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .withColumn("seq_id", expr(s"cum_before DIV $seqBudget"))
      .drop("gp_bucket", "gp_offset")
  }

  /** [[packSequences]] with `bucketWidth` derived from the corpus itself:
    * width = max(minWidth, ceil(keyspan / targetBuckets)) where keyspan is
    * max(id)+1, so the driver-side offset array stays ≤ ~targetBuckets
    * entries at ANY corpus size AND any id sparsity, without the caller
    * having to know the key domain. Costs one max() agg job (a narrow
    * scan) before the packing plan runs. */
  def packSequencesAuto(
      docs: DataFrame, idCol: String, tokensCol: String, seqBudget: Long,
      targetBuckets: Long = 1L << 16, minWidth: Long = 64L): DataFrame =
    packSequences(docs, idCol, tokensCol, seqBudget,
      autoBucketWidth(docs, idCol, targetBuckets, minWidth))

  /** Self-sizing bucket width for the pack operators (see
    * [[packSequencesAuto]]): ceil(keyspan / targetBuckets), floored at
    * minWidth. Results are bucket-width-invariant (property-pinned), so
    * this only controls the driver-artifact size, never the output. */
  def autoBucketWidth(
      docs: DataFrame, idCol: String,
      targetBuckets: Long = 1L << 16, minWidth: Long = 64L): Long = {
    val maxId = docs.agg(max(col(idCol).cast("long"))).collect()(0) match {
      case r if r.isNullAt(0) => 0L // empty corpus: any width works
      case r => r.getLong(0)
    }
    val tb = math.max(1L, targetBuckets)
    math.max(minWidth, (maxId + tb) / tb) // ceil((maxId+1)/tb)
  }

  /** Splitting sequence packing: like [[packSequences]], but documents
    * SPAN sequence boundaries instead of being assigned whole — the exact
    * contract of a trainer that concatenates the token stream and cuts
    * every `seqBudget` tokens. One output row per (document, sequence)
    * overlap, with the doc-relative token sub-range [tok_start, tok_end)
    * that lands in that sequence; interior sequences are always exactly
    * full. Zero-token documents occupy no tokens and emit no row.
    *
    * Scale: the explode factor per row is n_tok/seqBudget + 1 — bounded
    * by the document/context-length ratio, not the corpus — on top of
    * [[packSequences]]'s two-phase prefix sum (still no global window).
    */
  def packSplit(
      docs: DataFrame, idCol: String, tokensCol: String,
      seqBudget: Long, bucketWidth: Long = 1L << 20): DataFrame =
    packSequences(docs, idCol, tokensCol, seqBudget, bucketWidth)
      .filter(col(tokensCol) > 0)
      .withColumn("seq_id", explode(expr(
        s"sequence(cum_before DIV $seqBudget, (cum_before + `$tokensCol` - 1) DIV $seqBudget)")))
      .withColumn("tok_start",
        greatest(lit(0L), expr(s"seq_id * $seqBudget - cum_before")))
      .withColumn("tok_end",
        least(col(tokensCol), expr(s"(seq_id + 1) * $seqBudget - cum_before")))

  /** Chunk-level exact dedup ("paragraph dedup" for a corpus without
    * paragraph marks): split each document's SINGLE-SPACE token stream
    * (split on ' ' literally — tabs/newlines/space-runs are NOT
    * separators, so reassembly is byte-faithful; normalize whitespace
    * upstream if cross-whitespace-variant boilerplate must collapse)
    * into consecutive `chunkTokens`-token chunks, keep each distinct chunk only
    * at its FIRST occurrence in (id, chunk-index) order, and reassemble
    * the surviving text per document. This is the scalable approximation
    * of exact-substring dedup: boilerplate repeated across documents
    * (headers, license blocks, mirrored passages) is removed once-seen,
    * at chunk granularity, in two shuffles — never an all-pairs compare.
    *
    * Output: (id, text_dedup, n_chunks, n_kept); documents whose every
    * chunk duplicates earlier content drop out entirely (n_kept would
    * be 0 — exactly the full-document-duplicate case).
    *
    * Scale: chunking is a per-row expression; first-occurrence is one
    * window partitioned by chunk CONTENT (uniformly hashed). A chunk
    * repeated across the whole corpus is NOT a skew hazard: Spark's
    * rank-limit pushdown plans the rn=1 filter as WindowGroupLimit with a
    * Partial stage, so each map task forwards at most ONE row per chunk
    * into the shuffle (pinned in PlanSpec via the partitioned window; the
    * Partial/Final pair is visible in PLANS.md). Reassembly groups by id.
    * Chunk values ride the shuffle; at 100 TB swap the partition key to
    * xxhash64(chunk) + an equality tie-check to shrink shuffle keys.
    */
  def dedupChunks(
      docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    // n_chunks is derivable BEFORE exploding — carrying it on every chunk
    // row costs one long per row and saves a second full tokenize+explode
    // pass (+ its shuffle) that a separate per-doc count would need
    val chunks = docs
      .withColumn("gp_toks", split(col(textCol), " "))
      .withColumn("n_chunks",
        expr(s"CAST((size(gp_toks) - 1) DIV $chunkTokens + 1 AS BIGINT)"))
      .select(col(idCol), col("n_chunks"), posexplode(expr(
        s"transform(sequence(0, (size(gp_toks) - 1) DIV $chunkTokens), " +
          s"i -> array_join(slice(gp_toks, i * $chunkTokens + 1, $chunkTokens), ' '))"))
        .as(Seq("cidx", "chunk")))
    val wFirst = Window.partitionBy("chunk").orderBy(idCol, "cidx")
    val kept = chunks
      .withColumn("gp_rn", row_number().over(wFirst))
      .filter(col("gp_rn") === 1)
      .drop("gp_rn")
    kept.groupBy(idCol)
      .agg(
        array_join(expr("transform(array_sort(collect_list(struct(cidx, chunk))), x -> x.chunk)"), " ")
          .as("text_dedup"),
        first("n_chunks").as("n_chunks"),
        count(lit(1)).as("n_kept"))
      .select(col(idCol), col("text_dedup"), col("n_chunks"), col("n_kept"))
  }
}
