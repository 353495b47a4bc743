package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.10 LLM-training-data-pipeline operators over the
  * `documents` and `embeddings` tables: exact + fuzzy dedup, text
  * analysis (tokenize/stats/lang-id/quality/token-count/fingerprint),
  * and similarity search.
  *
  * Scale notes (100 TB):
  *  - `dedup_exact` groups on a 256-bit content hash — uniformly
  *    distributed, skew-free shuffle; the window keeps min doc_id without
  *    a second pass.
  *  - `dedup_fuzzy_minhash` is the standard shingle → minhash → banded-LSH
  *    self-join: candidate generation is an equi-join on (band, signature),
  *    never an all-pairs cross join; bands/rows are constants to tune
  *    recall vs. candidate volume.
  *  - `sim_cosine_topk` is the brute-force baseline (one pass, map-side
  *    top-k via TakeOrderedAndProject); the LSH-bucketed variant
  *    (`sim_ann_lsh`) prunes to one bucket per probe at scale.
  *  - Text ops are all narrow (per-row expressions + one hash agg).
  */
object Llm extends QueryModule {

  /** THE shared tokenizer (ops.Dedup.tokens) — one definition, so a
    * tokenization tweak can't silently diverge from these oracles */
  private def tokens(c: Column): Column = graft.ops.Dedup.tokens(c)

  /** The bounded consecutive-doc pair relation (doc_id, toks_a, toks_b)
    * shared by dedup_ngram_jaccard and text_containment — ONE definition
    * of the pairing stride and the empty-token guard (a 0-token side
    * would divide 0/0: NaN on Spark, NULL on DuckDB, a guaranteed
    * verify mismatch), so the two set-similarity queries cannot drift. */
  private def consecutiveTokenPairs(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.fanOut(Tables.t(s, d, "documents"), col("doc_id"))
      .select(col("doc_id"), array_distinct(tokens(col("text"))).as("toks"))
    val a = docs.select(col("doc_id"), col("toks").as("toks_a"))
    val b = docs.select((col("doc_id") - 1).as("doc_id"), col("toks").as("toks_b"))
    a.join(b, "doc_id")
      .filter(size(col("toks_a")) > 0 && size(col("toks_b")) > 0)
  }

  private val tokensDuck =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"

  /** multilingual-gate word lists — ONE definition; both engines' SQL
    * fragments derive from it (the tokensDuck discipline), so the lists
    * can never drift between the key and its oracle. Tiny fixed lists
    * keep the oracle exact; production swaps the full per-language
    * tables in (DEPLOY). zh is CHARACTER-based: the alnum tokenizer
    * yields nothing for unsegmented CJK. */
  private val mlStopLists: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "la", "de", "los", "que"))
  private val mlZhChars: Seq[String] = Seq("的", "了", "是", "在", "和")
  /** per-lang planted token (the lead stopword; zh plants its lead char) */
  private val mlPlantCase: String =
    "CASE lang " +
      mlStopLists.map { case (l, ws) => s"WHEN '$l' THEN '${ws.head}'" }.mkString(" ") +
      s" WHEN 'zh' THEN '${mlZhChars.head}' ELSE '' END"
  private def mlList(ws: Seq[String]): String = ws.map(w => s"'$w'").mkString(", ")
  private val mlStopListCase: String = // Spark array() literal form
    "CASE lang " +
      mlStopLists.map { case (l, ws) => s"WHEN '$l' THEN array(${mlList(ws)})" }.mkString(" ") +
      " ELSE array() END"
  private val mlStopListCaseDuck: String = // DuckDB [] literal form
    "CASE lang " +
      mlStopLists.map { case (l, ws) => s"WHEN '$l' THEN [${mlList(ws)}]" }.mkString(" ") +
      " ELSE [] END"
  /** stop-CHARACTER occurrence sum; replace() is non-regex 3-arg in both
    * engines, so the identical string serves both */
  private val mlZhHits: String =
    mlZhChars.map(c => s"(length(page) - length(replace(page, '$c', '')))").mkString(" + ")

  // derived from THE definition (ops.Text) — a private copy here would
  // let an edit to either side silently diverge seven oracles from the
  // Spark results they verify
  private val stopwords = graft.ops.Text.defaultStopwords
  private val stopDuck = stopwords.mkString("['", "', '", "']")

  /** trained BPE merge memo — training is deterministic (argmax ties
    * break (freq DESC, left, right)), so sharing one training run across
    * the train/encode driver keys is sound; Verify's concurrent pool and
    * Bench's sequential pass then train once per sf dir. */
  private val bpeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[graft.ops.Bpe.Merge]]()
  private def bpeMerges(s: SparkSession, d: String): Seq[graft.ops.Bpe.Merge] =
    bpeCache.computeIfAbsent(d, _ =>
      graft.ops.Bpe.train(
        graft.ops.Bpe.wordFreq(
          Tables.fanOut(Tables.t(s, d, "documents"), col("doc_id")), "text"),
        nMerges = 24))

  /** documents ∪ re-keyed copy of every 5th doc — gives the dedup
    * operators real duplicates to find (the base table is all-distinct). */
  private def docsWithDups(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.t(s, d, "documents")
    docs.unionByName(
      docs.filter(col("doc_id") % 5 === 0)
        .withColumn("doc_id", col("doc_id") + 100000L))
  }

  /** word 3-gram array over a token-array column `w`; empty for short
    * docs (sequence(1,0) would run DESCENDING — hence the guard) */
  private val shingle3 =
    "IF(size(w) >= 3, transform(sequence(1, size(w) - 2), " +
      "i -> concat_ws(' ', w[i-1], w[i], w[i+1])), array())"

  /** DuckDB mirror of [[shingle3]] via indexed list_transform lambdas */
  private val shingle3Duck =
    "CASE WHEN len(t) >= 3 THEN list_transform(t[1:len(t)-2], " +
      "(x, i) -> x || ' ' || t[i+1] || ' ' || t[i+2]) ELSE [] END"

  private val docsWithDupsDuck =
    "(SELECT * FROM documents UNION ALL " +
      "SELECT doc_id + 100000, text, lang, source, n_chars FROM documents WHERE doc_id % 5 = 0)"

  override def queries: Map[String, QFn] = Map(
    // exact content dedup: keep the first doc_id per content hash
    "dedup_exact" -> ((s, d) => {
      val w = Window.partitionBy("content_hash").orderBy("doc_id")
      docsWithDups(s, d)
        .withColumn("content_hash", sha2(col("text"), 256))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("doc_id", "content_hash")
        .orderBy("doc_id")
    }),

    // bloom-prefiltered exact dedup against a HISTORICAL corpus — the
    // daily-ingest shape when the history is too big to anti-join every
    // batch against. The history collapses once into a bloom filter (a
    // driver/broadcast artifact of O(bits), ~1 MB per 10^6 docs at 3%
    // FPR — at 100 TB you'd size it from the known corpus count and keep
    // it beside the corpus like the minhash index); each batch then:
    //   might_contain = false  → definitely new (bloom has NO false
    //                            negatives) — never touches the join;
    //   might_contain = true   → candidate, verified by the exact
    //                            anti-join, so false positives cost I/O
    //                            but never correctness.
    // The result is EXACT (== the plain anti-join, which is the oracle)
    // while only the ~dup_rate + FPR fraction of the batch reaches the
    // shuffle. The membership probe is the codegen kernel
    // `bloom_might_contain` (NativeExpressions — Spark exposes
    // BloomFilter build only via DataFrameStatFunctions, with no public
    // probe expression), so the candidate projection stays inside
    // whole-stage codegen instead of boxing every row through a Scala
    // closure. SearchSpec pins exactness + that the prefilter actually
    // prunes; NativeExprSpec pins probe parity with
    // BloomFilter.mightContainString.
    "dedup_bloom_prefilter" -> ((s, d) => {
      val hist = Tables.t(s, d, "documents")
      val dupes = hist.filter(col("doc_id") % 5 === 0)
        .withColumn("doc_id", col("doc_id") + 100000L)
      val novel = hist.filter(col("doc_id") % 7 === 3)
        .withColumn("doc_id", col("doc_id") + 200000L)
        .withColumn("text", concat(col("text"), lit(" v2")))
      val batch = dupes.unionByName(novel)
      // size the filter from the HISTORY's actual count (floored so a
      // near-empty test corpus doesn't degenerate): a constant capacity
      // silently erodes the realized FPR — and with it the pruning this
      // query exists to demonstrate — once the corpus outgrows it. The
      // count is one cheap aggregate against the same scan the filter
      // build reads right after.
      val bf = hist.stat.bloomFilter("text", math.max(hist.count(), 1L << 16), 0.03)
      val bfBytes = { val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos); bos.toByteArray }
      graft.functions.GraftFunctions.register(s)
      val flagged = batch.withColumn("cand",
        call_udf("bloom_might_contain", col("text"), lit(bfBytes)))
      val definiteNew = flagged.filter(!col("cand"))
      val verified = flagged.filter(col("cand"))
        .join(hist.select("text"), Seq("text"), "left_anti")
      definiteNew.select("doc_id", "lang", "source")
        .unionByName(verified.select("doc_id", "lang", "source"))
        .orderBy("doc_id")
    }),

    // n-gram (token-set) Jaccard between consecutive docs — the pairwise
    // primitive under near-dup detection, on a bounded pair set
    "dedup_ngram_jaccard" -> ((s, d) =>
      consecutiveTokenPairs(s, d)
        .select(
          col("doc_id"),
          round(
            size(array_intersect(col("toks_a"), col("toks_b"))).cast("double") /
              size(array_union(col("toks_a"), col("toks_b"))), 6).as("jaccard"))
        .orderBy("doc_id")),

    // ASYMMETRIC token-set containment C(X|Y) = |X∩Y|/|X| over the same
    // bounded consecutive-doc pairs — the quote / doc-inside-doc detector
    // Jaccard can't express (a short doc fully quoted inside a long one
    // scores high containment but low Jaccard, because the union is
    // dominated by the long side). Both directions reported; same narrow
    // per-row set ops, same single equi-join shape as dedup_ngram_jaccard.
    "text_containment" -> ((s, d) =>
      consecutiveTokenPairs(s, d)
        .select(col("doc_id"),
          round(size(array_intersect(col("toks_a"), col("toks_b"))).cast("double") /
            size(col("toks_a")), 6).as("cont_ab"),
          round(size(array_intersect(col("toks_b"), col("toks_a"))).cast("double") /
            size(col("toks_b")), 6).as("cont_ba"))
        .orderBy("doc_id")),

    // shingle → minhash → banded LSH candidate pairs. Oracle-exempt
    // (xxhash64 is engine-specific); LlmSpec asserts the planted
    // near-dup pairs are all recovered with zero spurious-pair noise
    // beyond shared-band collisions.
    "dedup_fuzzy_minhash" -> ((s, d) => {
      val nearDup = Tables.t(s, d, "documents")
        .filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + 200000L)
        // perturb: drop the first token — high but non-exact overlap
        .withColumn("text", expr("substring(text, instr(text, ' ') + 1)"))
      val corpus = Tables.fanOut(Tables.t(s, d, "documents").unionByName(nearDup), col("doc_id"))
      graft.ops.Dedup.minhashCandidates(corpus, "doc_id", "text",
          nHashes = 16, bands = 4, shingleSize = 3)
        .orderBy("a", "b")
    }),

    // LSH CALIBRATION — the dedup family's quality report (the
    // obs_ann_recall discipline applied to minhash): for every candidate
    // pair the banded LSH surfaces, compare the SIGNATURE estimate
    // (matching slots / nHashes — the quantity the banding thresholds
    // on) against the EXACT 3-shingle Jaccard it estimates. Signatures
    // and shingle sets are per-doc narrow projections; candidates join
    // them twice; the per-pair error is map-side arithmetic — so the
    // report costs the candidate set, never all pairs. Oracle-exempt
    // (xxhash64 signatures); OperatorPropertiesSpec pins the estimator's
    // calibration (mean |err| bound on planted near-dup pairs + the
    // exact leg against a hand Jaccard).
    "obs_lsh_calibration" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val nearDup = Tables.t(s, d, "documents")
        .filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + 200000L)
        .withColumn("text", expr("substring(text, instr(text, ' ') + 1)"))
      val corpus = Tables.t(s, d, "documents").unionByName(nearDup)
      val pairs = graft.ops.Dedup.minhashCandidates(corpus, "doc_id", "text",
        nHashes = 16, bands = 4, shingleSize = 3)
      // the exact leg must replay the KERNEL's tokenization (sketchTokens
      // = tokens + per-char CJK), or a CJK pair's "exact" Jaccard would
      // measure a different shingle set than the signature estimates
      val toks = graft.ops.Dedup.sketchTokens(col("text"))
      val shingles = array_distinct(transform(
        sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
          element_at(toks, i + 2))))
      // one narrow per-doc projection feeds BOTH sides of the pair join
      val perDoc = corpus
        .select(col("doc_id"),
          expr("minhash_sig_text(text, 16, 3)").as("sig"),
          shingles.as("sh"))
        .filter(col("sig").isNotNull)
      val a = perDoc.select(col("doc_id").as("a"),
        col("sig").as("sig_a"), col("sh").as("sh_a"))
      val b = perDoc.select(col("doc_id").as("b"),
        col("sig").as("sig_b"), col("sh").as("sh_b"))
      pairs.join(a, "a").join(b, "b")
        .withColumn("est", round(
          size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
            v => v)).cast("double") / 16.0, 6))
        .withColumn("exact", round(
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))), 6))
        .select(col("a"), col("b"), col("est"), col("exact"),
          round(abs(col("est") - col("exact")), 6).as("abs_err"))
        .orderBy("a", "b")
    }),

    // winnowing (MOSS) fingerprint candidates — the DETERMINISTIC member
    // of the fuzzy-dedup family: any shared token run of >= w + k - 1
    // tokens GUARANTEES a shared fingerprint (minhash recall is only
    // probabilistic), so the planted dropped-first-token twins here are
    // recovered with certainty, not high probability. Fingerprinting is
    // narrow per-row array math (no shingle explode); candidates pair via
    // the same bounded bucket join as minhash. Oracle-exempt (xxhash64);
    // OperatorPropertiesSpec pins 100% planted recall + the window
    // guarantee boundary on a synthetic run.
    "dedup_winnow_pairs" -> ((s, d) => {
      val nearDup = Tables.t(s, d, "documents")
        .filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + 300000L)
        .withColumn("text", expr("substring(text, instr(text, ' ') + 1)"))
      val corpus = Tables.fanOut(Tables.t(s, d, "documents").unionByName(nearDup), col("doc_id"))
      graft.ops.Dedup.winnowCandidates(corpus, "doc_id", "text", k = 3, w = 4)
        .orderBy("a", "b")
    }),

    // INCREMENTAL near-dedup: the corpus's banded signatures persist as a
    // (band, sig)-bucketed index table, then a NEW batch (every 7th doc,
    // first token dropped — dedup_fuzzy_minhash's planted-near-dup
    // fixture) is deduped against the STORE: the probe join re-reads only
    // bands-longs-per-doc signatures, never corpus text, and the index
    // side joins without an exchange (daily-ingest shape; PlanSpec pins
    // the plan, LlmSpec pins probe pairs == the full-batch path's
    // cross pairs). Oracle-exempt (xxhash64, like dedup_fuzzy_minhash).
    "dedup_incremental_minhash" -> ((s, d) => {
      val docs = Tables.t(s, d, "documents")
      // same catalog/warehouse hygiene as join_bucketed_colocated
      val wh = new org.apache.hadoop.fs.Path(s.conf.get("spark.sql.warehouse.dir"))
      val fs = wh.getFileSystem(s.sparkContext.hadoopConfiguration)
      s.sql("DROP TABLE IF EXISTS graft_minhash_index")
      val loc = new org.apache.hadoop.fs.Path(wh, "graft_minhash_index")
      if (fs.exists(loc)) fs.delete(loc, true)
      graft.ops.Dedup.writeMinhashIndex(
        docs, "doc_id", "text", "graft_minhash_index")
      val newBatch = docs.filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + 200000L)
        .withColumn("text", expr("substring(text, instr(text, ' ') + 1)"))
      graft.ops.Dedup.incrementalCandidates(
          s, "graft_minhash_index", newBatch, "doc_id", "text")
        .orderBy("a", "b")
    }),

    // INCREMENTAL winnow dedup: the deterministic member's daily-ingest
    // shape — corpus fingerprints persist as an fp-bucketed index, a new
    // batch probes it exchange-free on the index side, and winnowing's
    // window guarantee makes the probe recall CERTAIN, not probabilistic
    // (dedup_incremental_minhash is the probabilistic sibling).
    // Oracle-exempt (xxhash64); OperatorPropertiesSpec pins probe pairs
    // == the full-batch winnowCandidates cross pairs + the exchange-free
    // index side.
    "dedup_incremental_winnow" -> ((s, d) => {
      val docs = Tables.t(s, d, "documents")
      val wh = new org.apache.hadoop.fs.Path(s.conf.get("spark.sql.warehouse.dir"))
      val fs = wh.getFileSystem(s.sparkContext.hadoopConfiguration)
      s.sql("DROP TABLE IF EXISTS graft_winnow_index")
      val loc = new org.apache.hadoop.fs.Path(wh, "graft_winnow_index")
      if (fs.exists(loc)) fs.delete(loc, true)
      graft.ops.Dedup.writeWinnowIndex(docs, "doc_id", "text", "graft_winnow_index")
      val newBatch = docs.filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + 300000L)
        .withColumn("text", expr("substring(text, instr(text, ' ') + 1)"))
      graft.ops.Dedup.incrementalWinnowCandidates(
          s, "graft_winnow_index", newBatch, "doc_id", "text")
        .orderBy("a", "b")
    }),

    // word counts over the corpus (top 100 by frequency)
    "text_tokenize" -> ((s, d) =>
      Tables.t(s, d, "documents")
        .select(explode(tokens(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word"))
        .limit(100)),

    // per-doc char/word/distinct/stopword stats
    "text_stats" -> ((s, d) =>
      Tables.t(s, d, "documents")
        .select(
          col("doc_id"),
          col("lang"),
          length(col("text")).as("n_chars_calc"),
          graft.ops.Text.wordCount(col("text")).as("n_words"),
          graft.ops.Text.distinctWordCount(col("text")).as("n_distinct"),
          round(graft.ops.Text.stopwordRatio(col("text")), 6).as("stop_ratio"))
        .orderBy("doc_id")),

    // language-ID heuristic: stopword ratio thresholds (n-gram-free
    // stand-in; the signal the real classifier would threshold)
    "text_lang_id" -> ((s, d) =>
      Tables.t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          graft.ops.Text.langClass(col("text")).as("pred_class"))
        .orderBy("doc_id")),

    // TRAINED language id — char-trigram Naive Bayes over hashed buckets
    // (ops/LangId): train on the labeled corpus' doc_id%5!=0 split (the
    // text_quality_train held-out convention), score EVERY doc map-side
    // with the model riding as per-language literal arrays (no join, no
    // explode on the scoring pass). The heuristic text_lang_id key stays
    // as the rule-based twin. Oracle-exempt per the classifier
    // convention (trained model, libm log); ClassifierSpec pins
    // planted-language recovery ≥0.9 on held-out docs.
    "text_lang_id_trained" -> ((s, d) => {
      val docs = Tables.fanOut(Tables.t(s, d, "documents"), col("doc_id"))
      val model = graft.ops.LangId.train(docs.where(col("doc_id") % 5 =!= 0))
      graft.ops.LangId.infer(docs, model).orderBy("doc_id")
    }),

    // quality score: length saturation + stopword-ratio composite
    "text_quality" -> ((s, d) =>
      Tables.t(s, d, "documents")
        .select(col("doc_id"),
          graft.ops.Text.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")),

    // MULTILINGUAL stop-signal quality gate — the CCNet/fineweb2 lesson:
    // Gopher/C4's English stop lists score every other language as junk,
    // so the gate needs per-language lists, and unsegmented CJK (where
    // the alnum tokenizer yields nothing) needs stop CHARACTERS counted
    // on the raw text. The fixture text is English-soup for every lang,
    // so each doc plants doc_id%4 copies of its language's lead stopword
    // (zh plants 的) — both keep arms populate per language. Integer
    // cross-product thresholds (10% of tokens / 2% of chars) keep both
    // engines exact. All map-side codegen'd built-ins; the output sort
    // is the only exchange.
    "text_quality_multilang" -> ((s, d) =>
      Tables.t(s, d, "documents")
        .selectExpr("doc_id", "lang",
          s"concat(text, ' ', repeat(concat($mlPlantCase, ' '), CAST(doc_id % 4 AS INT))) AS page")
        .selectExpr("doc_id", "lang", "page",
          s"$mlStopListCase AS sl",
          "filter(split(lower(page), '[^a-z0-9]+'), t -> t <> '') AS tok")
        .selectExpr("doc_id", "lang",
          "CASE WHEN lang = 'zh' THEN length(page) ELSE size(tok) END AS n_units",
          s"CASE WHEN lang = 'zh' THEN $mlZhHits " +
            "ELSE size(filter(tok, t -> array_contains(sl, t))) END AS stop_hits")
        .selectExpr("doc_id", "lang", "n_units", "stop_hits",
          "CASE WHEN lang = 'zh' THEN stop_hits * 50 >= n_units " +
            "ELSE stop_hits * 10 >= n_units END AS keep")
        .orderBy("doc_id")),

    // the DATA CARD a training-corpus release publishes (the
    // datasheets-for-datasets practice, public): per language —
    // document count, token total, mean document length, distinct
    // payload count and the exact-dup fraction. ONE hash aggregation
    // over documents (the digest distinct-count rides the same agg);
    // the report is |langs| rows at any corpus size — the per-release
    // observability twin of obs_pipeline_counters.
    "obs_corpus_card" -> ((s, d) =>
      Tables.t(s, d, "documents")
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(graft.ops.Text.wordCount(col("text")).cast("long")).as("total_tokens"),
          round(avg(col("n_chars")), 6).as("mean_chars"),
          countDistinct(md5(col("text"))).as("n_unique"),
          round((count(lit(1)) - countDistinct(md5(col("text")))).cast("double") /
            count(lit(1)), 6).as("dup_frac"))
        .orderBy("lang")),

    // token counting: whitespace tokens + a chars/4 BPE-style estimate
    "text_token_count" -> ((s, d) =>
      Tables.t(s, d, "documents")
        .select(
          col("doc_id"),
          graft.ops.Text.wordCount(col("text")).as("ws_tokens"),
          graft.ops.Text.bpeEstimate(col("text")).as("bpe_est"))
        .orderBy("doc_id")),

    // Substring-level dedup (the suffix-array exact-substring pass of
    // Lee et al. 2022, at token 5-gram granularity): mark every maximal
    // token span covered by a 5-gram that occurs ≥2 times ANYWHERE in
    // the corpus (cross-doc or within-doc), and report per-doc span
    // count / covered-token mass — the signal that drives span excision,
    // which doc-level dedup (exact/minhash) structurally cannot see.
    // Shape: the gram relation is token-sized (the build_inverted_index
    // scale class); duplicated grams fall out of one partial+final hash
    // agg; the hit set comes back via an equi join; span merging is a
    // gaps-and-islands window partitioned per doc (bounded by doc
    // length, never global). At 100 TB the gram string would ride as
    // xxhash64(gram) to narrow the shuffle — kept as the string here so
    // the DuckDB oracle checks identical keys.
    "text_dedup_substring" -> ((s, d) => {
      val toks = docsWithDups(s, d)
        .select(col("doc_id"), graft.ops.Dedup.tokens(col("text")).as("w"))
      // pos = 0-based start token of the gram (array order == token order)
      val grams = toks.filter(size(col("w")) >= 5)
        .select(col("doc_id"), posexplode(expr(
          "transform(sequence(1, size(w) - 4), " +
            "i -> concat_ws(' ', w[i-1], w[i], w[i+1], w[i+2], w[i+3]))"))
          .as(Seq("pos", "gram")))
      val dup = grams.groupBy("gram").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 2).select("gram")
      val hits = grams.join(dup, "gram")
        .select(col("doc_id"), col("pos"), (col("pos") + 4).as("e"))
      val byPos = Window.partitionBy("doc_id").orderBy("pos")
      // island break when this gram starts past (running max end + 1):
      // overlapping OR token-adjacent coverage fuses into one span
      val prevMax = max("e").over(
        byPos.rowsBetween(Window.unboundedPreceding, -1))
      val spans = hits
        .withColumn("brk",
          when(coalesce(prevMax, lit(-2L)) < col("pos") - 1, 1L).otherwise(0L))
        .withColumn("iid",
          sum("brk").over(byPos.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("doc_id", "iid")
        .agg(min("pos").as("s"), max("e").as("e"))
      val perDoc = spans.groupBy("doc_id").agg(
        count(lit(1)).as("n_dup_spans"),
        sum(col("e") - col("s") + 1).as("dup_tokens"))
      toks.select(col("doc_id"), size(col("w")).cast("long").as("n_tokens"))
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
          coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
          when(col("n_tokens") === 0, 0.0).otherwise(
            round(coalesce(col("dup_tokens"), lit(0L)).cast("double") /
              col("n_tokens"), 6)).as("dup_frac"))
        .orderBy("doc_id")
    }),

    // N-gram novelty — the marginal-contribution metric of ingestion-order
    // curation: what fraction of THIS doc's distinct 3-grams does the
    // corpus see here FIRST (first = min doc_id, the deterministic stand-in
    // for arrival order)? Planted full copies score 0; fresh docs score
    // ~1; boilerplate-heavy docs fall in between — the rank signal for
    // "does adding this doc buy any new text". Shape: one distinct on
    // (doc, gram), one gram-level min agg (partial+final), an equi join
    // back, a per-doc agg — the text_tfidf scale class, nothing global.
    "text_ngram_novelty" -> ((s, d) => {
      val toks = docsWithDups(s, d)
        .select(col("doc_id"), graft.ops.Dedup.tokens(col("text")).as("w"))
      val grams = toks
        .select(col("doc_id"), explode(expr(shingle3)).as("gram"))
        .distinct()
      val first = grams.groupBy("gram").agg(min("doc_id").as("first_doc"))
      val perDoc = grams.join(first, "gram")
        .groupBy("doc_id").agg(
          count(lit(1)).as("n_grams"),
          sum(when(col("doc_id") === col("first_doc"), 1L).otherwise(0L))
            .as("n_novel"))
      toks.select("doc_id")
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_grams"), lit(0L)).as("n_grams"),
          coalesce(col("n_novel"), lit(0L)).as("n_novel"),
          when(coalesce(col("n_grams"), lit(0L)) === 0, 0.0).otherwise(
            round(col("n_novel").cast("double") / col("n_grams"), 6))
            .as("novelty"))
        .orderBy("doc_id")
    }),

    // fingerprint: hash of whitespace-normalized content (prefix kept
    // short — collision-safe enough for grouping, cheap to store)
    "doc_fingerprint" -> ((s, d) =>
      Tables.t(s, d, "documents")
        .select(col("doc_id"),
          graft.ops.Text.fingerprint(col("text")).as("fingerprint"))
        .orderBy("doc_id")),

    // Corpus TF-IDF — the document-term weighting behind quality scoring
    // and feature extraction. Three aggregations, all partial+final
    // (term counts combine map-side); the corpus size joins in as a
    // broadcast single row, so the plan is two hash aggs + one equi join
    // — no collect, no global window — and scales linearly in tokens.
    "text_tfidf" -> ((s, d) => {
      val docs = Tables.fanOut(Tables.t(s, d, "documents"), col("doc_id"))
      val terms = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val docFreq = terms.distinct().groupBy("term").agg(count(lit(1)).as("df"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      tf.join(docFreq, "term")
        .crossJoin(broadcast(nDocs))
        .withColumn("tfidf",
          round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
        .select("doc_id", "term", "tf", "df", "tfidf")
        .orderBy(col("tfidf").desc, col("doc_id"), col("term"))
        .limit(200)
    }),

    // PII scrubbing — the redaction pass every training-data pipeline runs
    // before tokenization. The corpus text carries no PII, so each doc is
    // first augmented with a deterministic synthetic email + IPv4 (the
    // oracle builds the identical string), then both patterns are redacted
    // and counted. Pure codegen'd regexp expressions — no UDF, narrow, so
    // the pass is a free rider on whatever scan feeds it at 100 TB.
    "text_pii_scrub" -> ((s, d) => {
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val ipRe = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"
      Tables.t(s, d, "documents")
        .withColumn("aug", concat(
          col("text"), lit(" contact user"), col("doc_id"),
          lit("@crawl.example.com from 10."), col("doc_id") % 256, lit(".0.1")))
        .select(
          col("doc_id"),
          regexp_count(col("aug"), lit(emailRe)).cast("bigint").as("n_emails"),
          regexp_count(col("aug"), lit(ipRe)).cast("bigint").as("n_ips"),
          regexp_replace(
            regexp_replace(col("aug"), emailRe, "<EMAIL>"), ipRe, "<IP>").as("scrubbed"))
        .orderBy("doc_id")
    }),

    // the composed training-data flow: quality-filter -> exact-dedup ->
    // per-language corpus stats (what a 100 TB curation job aggregates)
    "pipeline_training_corpus" -> ((s, d) => {
      val w = Window.partitionBy("content_hash").orderBy("doc_id")
      docsWithDups(s, d)
        .withColumn("quality", graft.ops.Text.qualityScore(col("text")))
        .filter(col("quality") >= 0.3)
        .withColumn("content_hash", sha2(col("text"), 256))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(graft.ops.Text.bpeEstimate(col("text"))).as("est_tokens"),
          round(avg("quality"), 6).as("avg_quality"))
        .orderBy("lang")
    }),

    // dedup cluster resolution: candidate pairs -> connected components ->
    // every doc labeled with its canonical (min-id) representative. The
    // edge set is a deterministic chain graph (doc_id -> doc_id+1 except
    // every 5th) so DuckDB can oracle the fixpoint via a recursive CTE;
    // production feeds minhash/simhash candidate pairs in instead.
    "dedup_cluster_resolve" -> ((s, d) => {
      val ids = Tables.t(s, d, "documents").select(col("doc_id"))
      val edges = ids.filter(col("doc_id") % 5 =!= 4)
        .select(col("doc_id").as("a"), (col("doc_id") + 1).as("b"))
        .join(ids.select(col("doc_id").as("b")), Seq("b"), "left_semi")
      graft.ops.Dedup.resolveClusters(ids.select(col("doc_id").as("v")), edges)
        .select(col("v").as("doc_id"), col("rep").as("cluster_id"))
        .orderBy("doc_id")
    }),

    // Leakage-safe train/val/test split: the assignment hashes the
    // near-dup CLUSTER id, not the doc id, so two near-duplicates can
    // never straddle train and eval — the contamination mode a naive
    // per-doc split bakes in. Same deterministic chain-edge graph as
    // dedup_cluster_resolve (so DuckDB can oracle the fixpoint); the
    // split is the md5-uniform idiom (pure integer compares, engine-
    // portable) at 90/5/5. Shape: cluster resolve + one map-side
    // projection — nothing beyond the resolve's own shuffles.
    "corpus_split_leakage_safe" -> ((s, d) => {
      val ids = Tables.t(s, d, "documents").select(col("doc_id"))
      val edges = ids.filter(col("doc_id") % 5 =!= 4)
        .select(col("doc_id").as("a"), (col("doc_id") + 1).as("b"))
        .join(ids.select(col("doc_id").as("b")), Seq("b"), "left_semi")
      graft.ops.Dedup.resolveClusters(ids.select(col("doc_id").as("v")), edges)
        .select(col("v").as("doc_id"), col("rep").as("cluster_id"))
        .withColumn("u",
          conv(substring(md5(concat(col("cluster_id").cast("string"), lit(":split"))), 1, 8),
            16, 10).cast("long"))
        .select(col("doc_id"), col("cluster_id"),
          when(col("u") % 100 < 90, "train")
            .when(col("u") % 100 < 95, "val")
            .otherwise("test").as("split"))
        .orderBy("doc_id")
    }),

    // Corpus-relative quality filtering: keep docs at or above their
    // language's p25 quality. The 100 TB shape matters more than the
    // score: the per-language thresholds are ONE tiny aggregation
    // (n_langs rows) broadcast back onto the corpus, so the filter stays
    // map-side — never a corpus-wide window/sort to rank every doc.
    // Threshold rounded to the score's own 6-decimal grain so the >=
    // comparison is stable across engines.
    "filter_quality_quantile" -> ((s, d) => {
      val scored = Tables.fanOut(Tables.t(s, d, "documents"), col("doc_id"))
        .select(col("doc_id"), col("lang"),
          graft.ops.Text.qualityScore(col("text")).as("quality"))
      val thr = scored.groupBy("lang")
        .agg(round(expr("percentile(quality, 0.25)"), 6).as("q25"))
      scored.join(broadcast(thr), "lang")
        .filter(col("quality") >= col("q25"))
        .select("doc_id", "lang", "quality", "q25")
        .orderBy("doc_id")
    }),

    // The full near-dup curation decision: candidate pairs -> connected
    // components -> keep the HIGHEST-QUALITY doc per cluster (not the
    // min-id — dedup_cluster_resolve's representative is canonical, the
    // kept doc should be the best one). Same deterministic chain-edge
    // graph as dedup_cluster_resolve so DuckDB can oracle the fixpoint;
    // the keep choice is one row_number over (cluster, quality desc).
    "dedup_keep_best" -> ((s, d) => {
      val docs = Tables.t(s, d, "documents")
      val ids = docs.select(col("doc_id"))
      val edges = ids.filter(col("doc_id") % 5 =!= 4)
        .select(col("doc_id").as("a"), (col("doc_id") + 1).as("b"))
        .join(ids.select(col("doc_id").as("b")), Seq("b"), "left_semi")
      val clusters = graft.ops.Dedup
        .resolveClusters(ids.select(col("doc_id").as("v")), edges)
        .select(col("v").as("doc_id"), col("rep").as("cluster_id"))
      val w = Window.partitionBy("cluster_id")
        .orderBy(col("quality").desc, col("doc_id"))
      docs.select(col("doc_id"),
          graft.ops.Text.qualityScore(col("text")).as("quality"))
        .join(clusters, "doc_id")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("cluster_id"), col("doc_id").as("kept_doc"), col("quality"))
        .orderBy("cluster_id")
    }),

    // Test-set decontamination — flag corpus docs sharing any word
    // 3-gram with a benchmark set (the overlap check every training run
    // does before its evals mean anything). The benchmark's shingle set
    // is tiny → broadcast left-semi join; the corpus side is one narrow
    // explode feeding it, so nothing shuffles on corpus size. Benchmark
    // stand-in = every 97th doc (deterministic, so DuckDB oracles it).
    "text_decontaminate" -> ((s, d) => {
      val docs = Tables.t(s, d, "documents")
      // sequence(1, 0) would run DESCENDING, so guard short docs explicitly
      val withSh = docs
        .select(col("doc_id"), tokens(col("text")).as("w"))
        .selectExpr("doc_id", s"$shingle3 AS sh")
      val bench = withSh.filter(col("doc_id") % 97 === 0)
        .select(explode(col("sh")).as("shingle")).distinct()
      val flagged = withSh.select(col("doc_id"), explode(col("sh")).as("shingle"))
        .join(broadcast(bench), Seq("shingle"), "left_semi")
        .select("doc_id").distinct()
        .withColumn("hit", lit(true))
      docs.join(flagged, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("hit"), lit(false)).as("contaminated"))
        .orderBy("doc_id")
    }),

    // Repetition scoring (the Gopher-style "repeated n-gram fraction"
    // quality signal): 1 - distinct/total over word 3-grams, per doc.
    // Pure per-row expressions — a free rider on any scan.
    "text_repetition" -> ((s, d) =>
      Tables.t(s, d, "documents")
        .select(col("doc_id"), tokens(col("text")).as("w"))
        .selectExpr("doc_id", s"$shingle3 AS sh")
        .select(col("doc_id"),
          when(size(col("sh")) === 0, 0.0).otherwise(
            round(lit(1.0) - size(array_distinct(col("sh"))).cast("double") /
              size(col("sh")), 6)).as("rep_ratio"))
        .orderBy("doc_id")),

    // Data-mixing weights: per (lang, source) doc counts -> the sampling
    // weight that flattens the mix to uniform across groups. Two tiny
    // aggregations broadcast back — the mixing table a 100 TB sampler
    // joins against is KBs regardless of corpus size.
    "corpus_mix_weights" -> ((s, d) => {
      val docs = Tables.t(s, d, "documents")
      val counts = docs.groupBy("lang", "source").agg(count(lit(1)).as("n_docs"))
      val total = docs.agg(count(lit(1)).as("total"))
      val groups = counts.agg(count(lit(1)).as("n_groups"))
      counts.crossJoin(broadcast(total)).crossJoin(broadcast(groups))
        .select(col("lang"), col("source"), col("n_docs"),
          round(col("n_docs").cast("double") / col("total"), 6).as("frac"),
          round(col("total").cast("double") / (col("n_groups") * col("n_docs")), 6)
            .as("weight"))
        .orderBy("lang", "source")
    }),

    // TEMPERATURE-scaled sampling weights per language — the standard
    // multilingual rebalance (the p^α recipe popularized by the
    // mBERT/XLM-R line of work, α = 0.7): sampling probability
    // q_i = p_i^α / Σ p_j^α upweights low-resource languages without
    // corpus_mix_weights' hard uniformity, and per-doc sampling weight
    // = q_i / p_i. All on the |languages|-row count artifact: one
    // corpus agg, a 1-row Σ p^α broadcast back in-plan, narrow
    // arithmetic — the POW/ln float path matches across engines at
    // 6-digit rounding (the text_lm_score precedent). α rides as a
    // literal in both engines so the exponent can't drift.
    "sample_temperature" -> ((s, d) => {
      val docs = Tables.t(s, d, "documents")
      val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_docs"))
      val total = docs.agg(count(lit(1)).as("total"))
      val scaled = counts.crossJoin(broadcast(total))
        .withColumn("p", col("n_docs").cast("double") / col("total"))
        .withColumn("pa", pow(col("p"), 0.7))
      // Σ p^α folds in FIXED lang order (running sum, then max — monotone
      // for positive terms), not a bare hash-agg double sum whose
      // accumulation order could diverge from the oracle's at a rounding
      // boundary (the agg_drift_report discipline)
      val zw = Window.orderBy("lang").rowsBetween(Window.unboundedPreceding, 0)
      val z = scaled.withColumn("zr", sum("pa").over(zw)).agg(max("zr").as("z"))
      scaled.crossJoin(broadcast(z))
        .select(col("lang"), col("n_docs"),
          round(col("p"), 6).as("p"),
          round(col("pa") / col("z"), 6).as("q"),
          round((col("pa") / col("z")) / col("p"), 6).as("weight"))
        .orderBy("lang")
    }),

    // Token-budget corpus fill: keep each language's highest-quality
    // docs until a 5k-token budget is spent — the mixing primitive
    // ("N tokens per language"). Implemented scale-safe
    // (ops/Corpus.budgetFill: per-quality-LEVEL aggregation + a window
    // over levels, never one document window per language) but
    // hash-equal to the naive per-language window the oracle runs.
    "corpus_budget_fill" -> ((s, d) => {
      val docs = Tables.fanOut(Tables.t(s, d, "documents"), col("doc_id")).select(
        col("doc_id"), col("lang"),
        graft.ops.Text.qualityScore(col("text")).as("quality"),
        graft.ops.Text.wordCount(col("text")).cast("long").as("ws_tokens"))
      graft.ops.Corpus
        .budgetFill(docs, "lang", "quality", "ws_tokens", "doc_id", budget = 5000L)
        .select("lang", "doc_id", "quality", "ws_tokens", "cum_tokens")
        .orderBy("lang", "doc_id")
    }),

    // The composed near-dup curation flow (Pipeline.curateCorpus):
    // quality gate -> minhash LSH -> connected components -> keep best.
    // Oracle-exempt (xxhash64 signatures are engine-specific);
    // PipelineSpec pins planted-pair collapse + keeper invariants.
    "pipeline_near_dedup" -> ((s, d) => {
      val nearDup = Tables.t(s, d, "documents")
        .filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + 400000L)
        .withColumn("text", expr("substring(text, instr(text, ' ') + 1)"))
      val corpus = Tables.t(s, d, "documents").unionByName(nearDup)
      graft.Pipeline.curateCorpus(corpus, exactThreshold = true).orderBy("cluster_id")
    }),

    // global sequence packing: every doc assigned to a fixed-token-budget
    // training sequence in doc_id order. The oracle is the naive global
    // window; the Spark side must hash-match it through the two-phase
    // distributed prefix sum (per-bucket totals -> driver prefix of
    // O(#buckets) offsets -> broadcast join -> per-bucket windows), so no
    // single-partition WindowExec appears in the plan at any scale.
    // Width is SELF-SIZING (ceil(keyspan/2^16), floored at 64): at the
    // testdata's 500 docs that floor gives 64 — multi-bucket stitching is
    // exercised even at sf0.001 — while a 1e9-doc corpus gets ~2^16
    // buckets instead of tripping the driver-artifact cap. Results are
    // width-invariant (property-pinned), so the knob never changes output.
    "pipeline_pack_sequences" -> ((s, d) => {
      val t = Tables.t(s, d, "documents")
        .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tok"))
      graft.ops.Corpus.packSequencesAuto(t, "doc_id", "n_tok", seqBudget = 512)
        .select("doc_id", "n_tok", "cum_before", "seq_id")
        .orderBy("doc_id")
    }),

    // corpus-wide adjacent-pair (bigram) counts — the counting pass a
    // BPE-style tokenizer trainer iterates: per-row pair synthesis (no
    // self-join; pairs come from an indexed transform over the token
    // array), one partial+final hash agg, TakeOrdered for the top slice
    "text_bigram_counts" -> ((s, d) => {
      val docs = Tables.t(s, d, "documents")
      docs
        .withColumn("w", tokens(col("text")))
        .select(explode(expr(
          "IF(size(w) >= 2, transform(sequence(1, size(w) - 1), " +
            "i -> concat_ws(' ', w[i-1], w[i])), array())")).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("pair")).limit(100)
    }),

    // stratified systematic sampling: downsample every language to the
    // smallest language's share via a deterministic id-modulus test —
    // corpus_mix_weights' downsampling twin (that op UPweights, this one
    // drops rows). Scale shape: two bounded aggs broadcast back, then a
    // pure map-side filter — ZERO data-sized shuffle; the keep decision is
    // floor-based integer math so both engines agree exactly. Systematic
    // (id-mod) rather than hash-based sampling keeps the oracle
    // engine-independent; ids are synthetic and uncorrelated with content.
    "sample_stratified" -> ((s, d) => {
      val docs = Tables.t(s, d, "documents")
      val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_g"))
      val minN = counts.agg(min("n_g").as("min_n"))
      docs.join(broadcast(counts), "lang").crossJoin(broadcast(minN))
        .withColumn("thresh", expr("CAST((1000 * min_n) DIV n_g AS BIGINT)"))
        .filter(pmod(col("doc_id"), lit(1000L)) < col("thresh"))
        .select("doc_id", "lang", "thresh")
        .orderBy("doc_id")
    }),

    // WEIGHT-PROPORTIONAL Bernoulli sampling, fully deterministic — the
    // quality-weighted downsampling step a data-mix recipe runs (keep
    // probability ∝ n_chars here; any per-doc score works). Each doc gets
    // a reproducible uniform u ∈ [0, 2³²) from the md5 of its id (+ a
    // seed tag), and keeps iff u·max_w·8 < w·2³² — i.e. P(keep) =
    // w / (8·max_w) — evaluated in PURE INTEGER arithmetic (≤2⁴⁵, no
    // float rounding for engines to disagree on; md5 hex is
    // byte-identical across engines, unlike xxhash64 vs DuckDB hash()).
    // Scale shape: one 1-row max agg broadcast back, then a map-side
    // filter — zero data-sized shuffle, and re-running on a grown corpus
    // re-selects the same surviving docs as long as max_w is pinned.
    "sample_weighted" -> ((s, d) => {
      val docs = Tables.t(s, d, "documents")
      val maxW = docs.agg(max("n_chars").as("max_w"))
      docs.crossJoin(broadcast(maxW))
        .withColumn("u",
          conv(substring(md5(concat(col("doc_id").cast("string"), lit(":g8"))), 1, 8),
            16, 10).cast("bigint"))
        .filter(col("u") * col("max_w") * 8 < col("n_chars") * lit(4294967296L))
        .select("doc_id", "n_chars", "u")
        .orderBy("doc_id")
    }),

    // Learned quality classifier, inference half — scoring the corpus
    // under a FIXED rational weight vector over md5-hashed unigram
    // buckets (graft.ops.Classifier). The logit numerator is an exact
    // integer sum (order-free, no libm), so this is fully DuckDB-oracled
    // down to the 6th decimal: it pins the featurize+score plumbing the
    // trained model (text_quality_train) rides on. Map-side hashing +
    // one per-doc agg — the full-corpus scoring shape.
    "text_quality_infer" -> ((s, d) =>
      graft.ops.Classifier.inferLiteral(Tables.t(s, d, "documents"))
        .orderBy("doc_id")),

    // Learned quality classifier, training half — distributed batch-GD
    // logistic regression over hashed unigram features. Labels are a
    // PLANTED linear rule (count('fast') > count('slow')) the model must
    // recover; ClassifierSpec pins held-out accuracy. Output is the
    // D=128 weight table (the driver-side model artifact, KMeans
    // precedent); rows-only driver check, property-verified. Train docs
    // = doc_id % 5 != 0 (the held-out fifth never touches training).
    "text_quality_train" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.fanOut(
        Tables.t(s, d, "documents"), col("doc_id")).where(col("doc_id") % 5 =!= 0)
      val labels = docs.select(col("doc_id"),
        (size(filter(tokens(col("text")), t => t === "fast")) >
          size(filter(tokens(col("text")), t => t === "slow"))).cast("int").as("y"))
      val w = graft.ops.Classifier.train(
        graft.ops.Classifier.features(docs), labels)
      w.zipWithIndex
        .map { case (wt, b) => (b, math.rint(wt * 1e6) / 1e6) }
        .toSeq.toDF("bucket", "weight")
        .orderBy("bucket")
    }),

    // unigram-LM quality score (the CCNet-style LM filter shape): train
    // token counts over the corpus, take the top-V vocab (V=16 so the OOV
    // smoothing path is exercised even on the small-vocab fixture), score
    // each doc by mean log p(token) under add-one smoothing. Two passes by
    // nature (train, then score); the model rides as a BROADCAST (V rows),
    // the total-count scalar as a broadcast single-row relation — scoring
    // is map-side, the only data shuffle is the per-doc mean.
    "text_lm_score" -> ((s, d) => {
      val docs = Tables.t(s, d, "documents")
      val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      val counts = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      val vocab = counts.orderBy(col("c").desc, col("tok")).limit(16)
      val tot = counts.agg(sum("c").as("n"))
      toks.join(broadcast(vocab), Seq("tok"), "left")
        .crossJoin(broadcast(tot))
        .withColumn("lp",
          log((coalesce(col("c"), lit(0L)) + 1).cast("double") / (col("n") + 17)))
        .groupBy("doc_id").agg(round(avg("lp"), 6).as("lm_score"))
        .orderBy("doc_id")
    }),

    // SECOND-ORDER LM quality score — text_lm_score's bigram sibling
    // (the stronger fluency signal a CCNet-style filter actually wants:
    // unigram scores can't see scrambled word order). Model = the top-16
    // bigrams + top-16 context unigrams by corpus count, both broadcast;
    // each doc's adjacent pairs (the text_bigram_counts indexed-transform
    // shape, no self-join) score p(w|prev) = (c_bigram+1)/(c_prev+17)
    // with add-one smoothing, unseen counts coalescing to 0 — so scoring
    // is map-side against two tiny broadcast tables, and the only data
    // shuffle is the per-doc mean.
    "text_lm_score_bigram" -> ((s, d) => {
      val docs = Tables.t(s, d, "documents")
      val pairs = docs
        .withColumn("w", tokens(col("text")))
        .select(col("doc_id"), explode(expr(
          "IF(size(w) >= 2, transform(sequence(1, size(w) - 1), " +
            "i -> struct(w[i-1] AS prev, w[i] AS cur)), array())")).as("pr"))
        .select(col("doc_id"), col("pr.prev").as("prev"), col("pr.cur").as("cur"))
      val bigrams = pairs.groupBy("prev", "cur").agg(count(lit(1)).as("cb"))
        .orderBy(col("cb").desc, col("prev"), col("cur")).limit(16)
      val contexts = pairs.groupBy("prev").agg(count(lit(1)).as("cp"))
        .orderBy(col("cp").desc, col("prev")).limit(16)
      pairs
        .join(broadcast(bigrams), Seq("prev", "cur"), "left")
        .join(broadcast(contexts), Seq("prev"), "left")
        .withColumn("lp",
          log((coalesce(col("cb"), lit(0L)) + 1).cast("double") /
            (coalesce(col("cp"), lit(0L)) + 17)))
        .groupBy("doc_id").agg(round(avg("lp"), 6).as("lm2_score"))
        .orderBy("doc_id")
    }),

    // splitting variant: documents SPAN sequence boundaries (the trainer's
    // concatenate-and-cut contract) — one row per (doc, seq) overlap with
    // the doc-relative token sub-range; interior sequences exactly full
    "pipeline_pack_split" -> ((s, d) => {
      val t = Tables.t(s, d, "documents")
        .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tok"))
      graft.ops.Corpus.packSplit(t, "doc_id", "n_tok", seqBudget = 512,
          bucketWidth = graft.ops.Corpus.autoBucketWidth(t, "doc_id"))
        .select("doc_id", "seq_id", "tok_start", "tok_end")
        .orderBy("doc_id", "seq_id")
    }),

    // chunk-level exact dedup with reassembly: 20-token chunks, each
    // distinct chunk survives only at its first (doc_id, cidx) occurrence,
    // then documents are rebuilt from their surviving chunks. Run against
    // docsWithDups so full-document duplicates (every chunk already seen)
    // vanish and the partial-overlap rows keep their novel tail.
    "dedup_chunk_exact" -> ((s, d) =>
      graft.ops.Corpus.dedupChunks(docsWithDups(s, d), "doc_id", "text",
          chunkTokens = 20)
        .orderBy("doc_id")),

    // brute-force cosine top-k against the vec_id=0 query vector — the
    // exact baseline the ANN variants are measured against; per-row math
    // is the native codegen cosine kernel (value-parity with the composed
    // HOF form pinned in NativeExprSpec), and the top-k compiles to
    // TakeOrderedAndProject (map-side heaps, no global sort)
    "sim_cosine_topk" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val e = Tables.t(s, d, "embeddings")
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>").as("qd"))
      e.crossJoin(broadcast(q))
        .withColumn("ed", col("embedding").cast("array<double>"))
        .select(col("vec_id"), col("label"),
          round(call_udf("cosine_sim", col("ed"), col("qd")), 6).as("cos"))
        .orderBy(col("cos").desc, col("vec_id")).limit(20)
    }),

    // deterministic global corpus shuffle — the pre-shard ordering pass a
    // trainer runs before cutting the corpus into training shards
    // (sequential readers then see a content-decorrelated stream). Order
    // key = md5(doc_id:seed): seeded, reproducible, engine-portable. The
    // plan is sort_global's: ONE range exchange with sampled boundaries —
    // no single-partition sort at any scale. `shard` (the key's hex
    // prefix) is the downstream 256-way shard assignment, free with the
    // same key — writers just partitionBy it.
    "corpus_shuffle" -> ((s, d) =>
      Tables.t(s, d, "documents")
        .withColumn("skey", md5(concat(col("doc_id").cast("string"), lit(":42"))))
        .withColumn("shard", substring(col("skey"), 1, 2))
        .select("doc_id", "skey", "shard")
        .orderBy("skey")),

    // DETERMINISTIC WEIGHTED INTERLEAVE — the training-order op a
    // multi-source corpus runs after mixing weights are chosen
    // (corpus_mix_weights picks the rates; this materializes an order
    // where each source appears at its rate THROUGHOUT, not merely in
    // total, so a run truncated or resumed at any step has consumed the
    // intended mix). Window-FREE scalable form: each doc draws a 60-bit
    // uniform position from its hash and divides by its source's integer
    // weight — a weight-w source's docs land w× denser on the position
    // axis, so any pos-ordered prefix carries sources ∝ weights (law of
    // large numbers, OperatorPropertiesSpec pins the prefix mix). One
    // map-side projection + one range sort; no per-source window (a
    // mega-source would hot-spot a rank window at 100 TB), integer-exact
    // in both engines (conv/hex-cast agree bit-for-bit).
    "corpus_interleave_sources" -> ((s, d) =>
      Tables.t(s, d, "documents")
        .withColumn("skey", md5(concat(col("doc_id").cast("string"), lit(":interleave"))))
        .withColumn("weight", expr("CAST(substring(source, 4) AS INT) % 3 + 1"))
        .withColumn("pos",
          expr("CAST(conv(substring(skey, 1, 15), 16, 10) AS BIGINT) div weight"))
        .select("doc_id", "source", "weight", "pos")
        .orderBy("pos", "doc_id")),

    // per-document character entropy — the classic cheap gibberish /
    // boilerplate detector (random bytes ≈ ln 256, natural language
    // ≈ 2.8–3.2, padding → 0). Runs as the char_entropy NATIVE KERNEL:
    // one codegen'd per-row pass, no explode, no shuffle (the composed
    // explode→aggs→join form puts |text| rows per doc through a shuffle;
    // NativeExprSpec pins the two paths equal).
    "text_char_entropy" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      Tables.t(s, d, "documents")
        .select(col("doc_id"),
          round(call_udf("char_entropy", col("text")), 6).as("entropy"))
        .orderBy("doc_id")
    }),

    // deterministic k-per-group sampling — eval-set construction's "take
    // 20 uniform docs per language", reproducible across runs and
    // engines: rank by md5(doc_id:seed) within the language, keep the k
    // smallest. One WindowExec partitioned by lang (never a global
    // window); at 100 TB per-group rank beats ORDER BY ... LIMIT k
    // per group (k·|groups| rows survive the shuffle, not the corpus).
    "sample_per_group" -> ((s, d) => {
      val w = Window
        .partitionBy("lang")
        .orderBy(col("skey"), col("doc_id"))
      Tables.t(s, d, "documents")
        .withColumn("skey", md5(concat(col("doc_id").cast("string"), lit(":7"))))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 20)
        .select("lang", "rn", "doc_id", "skey")
        .orderBy("lang", "rn")
    }),

    // distributed BPE tokenizer training (ops/Bpe.scala): the corpus is
    // aggregated ONCE into the Zipf-bounded (word, freq) relation; each
    // of the 24 merge rounds runs on that aggregate alone (pair synthesis
    // → one count agg → 1-row argmax → map-side fold), never back over
    // the corpus. Oracle-exempt (iterative argmax training is not a
    // single SQL statement); OperatorPropertiesSpec proves the learned
    // merge sequence EQUALS an independent in-memory reference BPE.
    "text_bpe_train" -> ((s, d) => {
      import s.implicits._
      bpeMerges(s, d).toDF()
        .select(col("rank"), col("left"), col("right"),
          concat(col("left"), col("right")).as("merged"), col("freq"))
        .orderBy("rank")
    }),

    // apply the learned merges back over the corpus — the merge table
    // rides the plan as a binary literal inside the bpe_piece_count
    // kernel, so encoding is map-side codegen at any corpus size;
    // per-doc piece counts + the compression diagnostic a
    // tokenizer-training run reports
    "text_bpe_encode" -> ((s, d) =>
      graft.ops.Bpe.encode(
        Tables.fanOut(Tables.t(s, d, "documents"), col("doc_id")), "doc_id", "text",
          bpeMerges(s, d).map(m => (m.left, m.right)))
        .withColumn("compression", round(
          col("n_chars_tok").cast("double") / greatest(col("n_pieces"), lit(1)), 6))
        .orderBy("doc_id"))
  )

  private val statsDuckCols =
    s"len($tokensDuck) AS n_words, len(list_distinct($tokensDuck)) AS n_distinct, " +
      s"round(len(list_filter($tokensDuck, t -> list_contains($stopDuck, t)))::DOUBLE / " +
      s"greatest(len($tokensDuck), 1), 6) AS stop_ratio"

  private val stopRatioDuck =
    s"len(list_filter($tokensDuck, t -> list_contains($stopDuck, t)))::DOUBLE / " +
      s"greatest(len($tokensDuck), 1)"

  override def oracleSql: Map[String, String] = Map(
    // the NAIVE global-window form; the Spark side hash-matches it via the
    // two-phase distributed prefix sum (no single-partition window)
    "pipeline_pack_sequences" ->
      (s"SELECT doc_id, n_tok, cum_before, cum_before // 512 AS seq_id FROM (" +
        "SELECT doc_id, n_tok, CAST(coalesce(sum(n_tok) OVER (ORDER BY doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before " +
        s"FROM (SELECT doc_id, len($tokensDuck) AS n_tok FROM documents)) ORDER BY doc_id"),
    "text_bigram_counts" ->
      (s"SELECT pair, count(*) AS cnt FROM (" +
        s"SELECT unnest(CASE WHEN len(t) >= 2 THEN list_transform(t[1:len(t)-1], " +
        "(x, i) -> x || ' ' || t[i+1]) ELSE [] END) AS pair " +
        s"FROM (SELECT $tokensDuck AS t FROM documents)) " +
        "GROUP BY pair ORDER BY cnt DESC, pair LIMIT 100"),
    "sample_stratified" ->
      ("WITH counts AS (SELECT lang, count(*) AS n_g FROM documents GROUP BY lang), " +
        "m AS (SELECT min(n_g) AS min_n FROM counts) " +
        "SELECT doc_id, lang, CAST((1000 * min_n) // n_g AS BIGINT) AS thresh " +
        "FROM documents JOIN counts USING (lang), m " +
        "WHERE doc_id % 1000 < thresh ORDER BY doc_id"),
    // same md5-derived uniform, same pure-integer keep test
    "sample_weighted" ->
      ("WITH m AS (SELECT max(n_chars) AS max_w FROM documents), " +
        "u AS (SELECT doc_id, n_chars, " +
        "CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':g8'), 1, 8) AS BIGINT) AS u " +
        "FROM documents) " +
        "SELECT doc_id, n_chars, u FROM u, m " +
        "WHERE u * max_w * 8 < n_chars * 4294967296 ORDER BY doc_id"),
    // same md5 bucket + same integer-numerator logit; k_b replayed
    // arithmetically: ((b*37+11)%21)-10. Integer ppm via round() on the
    // identical exact double (fractional round(x,6) hits exact decimal
    // half-boundaries when n is a power of two — see Classifier scaladoc)
    "text_quality_infer" ->
      (s"WITH toks AS (SELECT doc_id, unnest($tokensDuck) AS tok FROM documents), " +
        "fb AS (SELECT doc_id, CAST(CAST('0x' || substring(md5(tok), 1, 4) AS BIGINT) % 128 AS INT) AS bucket, " +
        "count(*) AS cnt FROM toks GROUP BY 1, 2) " +
        "SELECT doc_id, " +
        "CAST(round(CAST(sum((((bucket * 37 + 11) % 21) - 10) * cnt) AS DOUBLE) * 100000 / " +
        "CAST(sum(cnt) AS DOUBLE)) AS BIGINT) AS logit_ppm, " +
        "sum((((bucket * 37 + 11) % 21) - 10) * cnt) >= 0 AS pred " +
        "FROM fb GROUP BY doc_id ORDER BY doc_id"),
    "text_lm_score" ->
      (s"WITH toks AS (SELECT doc_id, unnest($tokensDuck) AS tok FROM documents), " +
        "counts AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok), " +
        "vocab AS (SELECT tok, c FROM counts ORDER BY c DESC, tok LIMIT 16), " +
        "tot AS (SELECT sum(c) AS n FROM counts) " +
        "SELECT doc_id, round(avg(ln((coalesce(v.c, 0) + 1)::DOUBLE / (n + 17))), 6) AS lm_score " +
        "FROM toks t LEFT JOIN vocab v USING (tok), tot GROUP BY doc_id ORDER BY doc_id"),
    // parallel unnest zips the shifted slices positionally — the same
    // adjacent pairs the Spark indexed transform emits
    "text_lm_score_bigram" ->
      (s"WITH toks AS (SELECT doc_id, $tokensDuck AS t FROM documents), " +
        "pr AS (SELECT doc_id, unnest(t[1:len(t)-1]) AS prev, unnest(t[2:len(t)]) AS cur " +
        "FROM toks WHERE len(t) >= 2), " +
        "bg AS (SELECT prev, cur, count(*) AS cb FROM pr GROUP BY 1, 2 " +
        "ORDER BY cb DESC, prev, cur LIMIT 16), " +
        "cx AS (SELECT prev, count(*) AS cp FROM pr GROUP BY 1 " +
        "ORDER BY cp DESC, prev LIMIT 16) " +
        "SELECT doc_id, round(avg(ln((coalesce(cb, 0) + 1)::DOUBLE / (coalesce(cp, 0) + 17))), 6) AS lm2_score " +
        "FROM pr LEFT JOIN bg USING (prev, cur) LEFT JOIN cx USING (prev) " +
        "GROUP BY doc_id ORDER BY doc_id"),
    "pipeline_pack_split" ->
      (s"SELECT doc_id, s AS seq_id, CAST(greatest(0, s * 512 - cum_before) AS BIGINT) AS tok_start, " +
        "CAST(least(n_tok, (s + 1) * 512 - cum_before) AS BIGINT) AS tok_end FROM (" +
        "SELECT doc_id, n_tok, CAST(coalesce(sum(n_tok) OVER (ORDER BY doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before " +
        s"FROM (SELECT doc_id, len($tokensDuck) AS n_tok FROM documents)), " +
        "unnest(generate_series(cum_before // 512, (cum_before + n_tok - 1) // 512)) AS u(s) " +
        "WHERE n_tok > 0 ORDER BY doc_id, seq_id"),
    "dedup_chunk_exact" ->
      (s"WITH src AS (SELECT * FROM $docsWithDupsDuck), " +
        "toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM src), " +
        "chunks AS (SELECT doc_id, ci AS cidx, " +
        "array_to_string(list_slice(t, ci * 20 + 1, ci * 20 + 20), ' ') AS chunk " +
        "FROM toks, unnest(generate_series(0, (len(t) - 1) // 20)) AS u(ci)), " +
        "kept AS (SELECT doc_id, cidx, chunk FROM (SELECT doc_id, cidx, chunk, " +
        "row_number() OVER (PARTITION BY chunk ORDER BY doc_id, cidx) AS rn FROM chunks) WHERE rn = 1), " +
        "tot AS (SELECT doc_id, count(*) AS n_chunks FROM chunks GROUP BY doc_id) " +
        "SELECT k.doc_id, string_agg(k.chunk, ' ' ORDER BY k.cidx) AS text_dedup, " +
        "any_value(t.n_chunks) AS n_chunks, count(*) AS n_kept " +
        "FROM kept k JOIN tot t USING (doc_id) GROUP BY k.doc_id ORDER BY doc_id"),
    "dedup_exact" ->
      (s"SELECT min(doc_id) AS doc_id, sha256(text) AS content_hash FROM $docsWithDupsDuck " +
        "GROUP BY sha256(text) ORDER BY doc_id"),
    // the bloom path must be invisible in the result: the oracle is the
    // plain batch-vs-history anti-join (false positives get verified,
    // false negatives are impossible)
    "dedup_bloom_prefilter" ->
      ("WITH batch AS (" +
        "SELECT doc_id + 100000 AS doc_id, text, lang, source FROM documents WHERE doc_id % 5 = 0 " +
        "UNION ALL " +
        "SELECT doc_id + 200000, text || ' v2', lang, source FROM documents WHERE doc_id % 7 = 3) " +
        "SELECT b.doc_id, b.lang, b.source FROM batch b " +
        "WHERE NOT EXISTS (SELECT 1 FROM documents h WHERE h.text = b.text) " +
        "ORDER BY doc_id"),
    "dedup_ngram_jaccard" ->
      ("WITH toks AS (SELECT doc_id, list_distinct(" + tokensDuck + ") AS t FROM documents) " +
        "SELECT a.doc_id - 1 AS doc_id, " +
        "round(len(list_intersect(a.t, b.t))::DOUBLE / len(list_distinct(list_concat(a.t, b.t))), 6) AS jaccard " +
        "FROM toks a JOIN toks b ON a.doc_id = b.doc_id + 1 " +
        "WHERE len(a.t) > 0 AND len(b.t) > 0 ORDER BY doc_id"),
    "text_containment" ->
      ("WITH toks AS (SELECT doc_id, list_distinct(" + tokensDuck + ") AS t FROM documents) " +
        "SELECT b.doc_id - 1 AS doc_id, " +
        "round(len(list_intersect(a.t, b.t))::DOUBLE / len(a.t), 6) AS cont_ab, " +
        "round(len(list_intersect(a.t, b.t))::DOUBLE / len(b.t), 6) AS cont_ba " +
        "FROM toks a JOIN toks b ON b.doc_id = a.doc_id + 1 " +
        "WHERE len(a.t) > 0 AND len(b.t) > 0 ORDER BY doc_id"),
    "text_tokenize" ->
      (s"SELECT word, count(*) AS cnt FROM (SELECT unnest($tokensDuck) AS word FROM documents) " +
        "GROUP BY word ORDER BY cnt DESC, word LIMIT 100"),
    "text_stats" ->
      (s"SELECT doc_id, lang, length(text) AS n_chars_calc, $statsDuckCols " +
        "FROM documents ORDER BY doc_id"),
    "text_lang_id" ->
      (s"SELECT doc_id, lang, CASE WHEN $stopRatioDuck >= 0.15 THEN 'en_like' " +
        s"WHEN $stopRatioDuck >= 0.05 THEN 'latin_like' ELSE 'other' END AS pred_class " +
        "FROM documents ORDER BY doc_id"),
    "text_quality" ->
      (s"SELECT doc_id, round(least(length(text) / 500.0, 1.0) * 0.5 + ($stopRatioDuck) * 0.5, 6) AS quality " +
        "FROM documents ORDER BY doc_id"),
    "text_token_count" ->
      (s"SELECT doc_id, len($tokensDuck) AS ws_tokens, " +
        "CAST(ceil(length(text) / 4.0) AS BIGINT) AS bpe_est FROM documents ORDER BY doc_id"),
    // md5 hex agrees between engines, so the distinct-payload legs match
    "obs_corpus_card" ->
      (s"SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, " +
        s"CAST(sum(len($tokensDuck)) AS BIGINT) AS total_tokens, " +
        "round(avg(n_chars), 6) AS mean_chars, " +
        "CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique, " +
        "round((count(*) - count(DISTINCT md5(text)))::DOUBLE / count(*), 6) AS dup_frac " +
        "FROM documents GROUP BY lang ORDER BY lang"),
    // per-language lists + the zh char path, derived from the SAME
    // mlStopLists/mlZhChars the Spark side reads
    "text_quality_multilang" ->
      ("SELECT doc_id, lang, n_units, stop_hits, " +
        "CASE WHEN lang = 'zh' THEN stop_hits * 50 >= n_units " +
        "ELSE stop_hits * 10 >= n_units END AS keep FROM (" +
        "SELECT doc_id, lang, " +
        "CASE WHEN lang = 'zh' THEN length(page) ELSE len(tok) END AS n_units, " +
        s"CASE WHEN lang = 'zh' THEN $mlZhHits " +
        "ELSE len(list_filter(tok, t -> list_contains(sl, t))) END AS stop_hits FROM (" +
        s"SELECT doc_id, lang, page, $mlStopListCaseDuck AS sl, " +
        "list_filter(string_split_regex(lower(page), '[^a-z0-9]+'), t -> t <> '') AS tok FROM (" +
        s"SELECT doc_id, lang, concat(text, ' ', " +
        s"repeat(concat($mlPlantCase, ' '), CAST(doc_id % 4 AS INT))) AS page " +
        "FROM documents))) ORDER BY doc_id"),
    "doc_fingerprint" ->
      ("SELECT doc_id, substr(sha256(regexp_replace(lower(text), '\\s+', ' ', 'g')), 1, 16) AS fingerprint " +
        "FROM documents ORDER BY doc_id"),
    // same distinct-gram/min-first/join pipeline; shingle3Duck binds `t`
    "text_ngram_novelty" ->
      (s"WITH src AS (SELECT * FROM $docsWithDupsDuck), " +
        s"toks AS (SELECT doc_id, $tokensDuck AS t FROM src), " +
        s"grams AS (SELECT DISTINCT doc_id, gram FROM " +
        s"(SELECT doc_id, unnest($shingle3Duck) AS gram FROM toks)), " +
        "firsts AS (SELECT gram, min(doc_id) AS first_doc FROM grams GROUP BY gram), " +
        "perdoc AS (SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams, " +
        "CAST(sum(CASE WHEN g.doc_id = f.first_doc THEN 1 ELSE 0 END) AS BIGINT) AS n_novel " +
        "FROM grams g JOIN firsts f USING (gram) GROUP BY g.doc_id) " +
        "SELECT tk.doc_id, coalesce(n_grams, 0) AS n_grams, " +
        "coalesce(n_novel, 0) AS n_novel, " +
        "CASE WHEN coalesce(n_grams, 0) = 0 THEN 0.0 ELSE " +
        "round(n_novel::DOUBLE / n_grams, 6) END AS novelty " +
        "FROM toks tk LEFT JOIN perdoc USING (doc_id) ORDER BY doc_id"),
    // same 5-gram/coverage/islands pipeline in ANSI window SQL; the
    // coalesce(-2) seed makes the first hit per doc always open a span
    "text_dedup_substring" ->
      (s"WITH src AS (SELECT * FROM $docsWithDupsDuck), " +
        s"toks AS (SELECT doc_id, $tokensDuck AS t FROM src), " +
        "grams AS (SELECT doc_id, pos, t[pos+1] || ' ' || t[pos+2] || ' ' || " +
        "t[pos+3] || ' ' || t[pos+4] || ' ' || t[pos+5] AS gram " +
        "FROM (SELECT doc_id, t, unnest(range(len(t) - 4)) AS pos FROM toks WHERE len(t) >= 5)), " +
        "dup AS (SELECT gram FROM grams GROUP BY gram HAVING count(*) >= 2), " +
        "hits AS (SELECT g.doc_id, g.pos, g.pos + 4 AS e FROM grams g JOIN dup USING (gram)), " +
        "isl AS (SELECT doc_id, pos, e, CASE WHEN coalesce(max(e) OVER " +
        "(PARTITION BY doc_id ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2) " +
        "< pos - 1 THEN 1 ELSE 0 END AS brk FROM hits), " +
        "isl2 AS (SELECT doc_id, pos, e, sum(brk) OVER " +
        "(PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS iid FROM isl), " +
        "spans AS (SELECT doc_id, iid, min(pos) AS s, max(e) AS e FROM isl2 GROUP BY doc_id, iid), " +
        "perdoc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans, " +
        "CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens FROM spans GROUP BY doc_id) " +
        "SELECT tk.doc_id, CAST(len(t) AS BIGINT) AS n_tokens, " +
        "coalesce(n_dup_spans, 0) AS n_dup_spans, " +
        "coalesce(dup_tokens, 0) AS dup_tokens, " +
        "CASE WHEN len(t) = 0 THEN 0.0 ELSE " +
        "round(coalesce(dup_tokens, 0)::DOUBLE / len(t), 6) END AS dup_frac " +
        "FROM toks tk LEFT JOIN perdoc USING (doc_id) ORDER BY doc_id"),
    // same tokenizer as text_tokenize; ln() == Spark log(); ::DOUBLE
    // guards DuckDB integer division
    "text_tfidf" ->
      (s"WITH terms AS (SELECT doc_id, unnest($tokensDuck) AS term FROM documents), " +
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term), " +
        "df AS (SELECT term, count(DISTINCT doc_id) AS df FROM terms GROUP BY term), " +
        "n AS (SELECT count(*) AS n_docs FROM documents) " +
        "SELECT doc_id, term, tf, df, round(tf * ln(n_docs::DOUBLE / df), 6) AS tfidf " +
        "FROM tf JOIN df USING (term), n " +
        "ORDER BY tfidf DESC, doc_id, term LIMIT 200"),
    // same augmented string, same two REs (RE2 and java.util.regex agree
    // on this character-class subset); 'g' flag = Spark's replace-all
    "text_pii_scrub" ->
      ("SELECT doc_id, " +
        "CAST(len(regexp_extract_all(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails, " +
        "CAST(len(regexp_extract_all(aug, '\\b\\d{1,3}(\\.\\d{1,3}){3}\\b')) AS BIGINT) AS n_ips, " +
        "regexp_replace(regexp_replace(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), " +
        "'\\b\\d{1,3}(\\.\\d{1,3}){3}\\b', '<IP>', 'g') AS scrubbed " +
        "FROM (SELECT doc_id, text || ' contact user' || doc_id || '@crawl.example.com from 10.' || (doc_id % 256) || '.0.1' AS aug " +
        "FROM documents) ORDER BY doc_id"),
    "pipeline_training_corpus" ->
      (s"WITH src AS (SELECT * FROM $docsWithDupsDuck), " +
        s"scored AS (SELECT *, round(least(length(text) / 500.0, 1.0) * 0.5 + ($stopRatioDuck) * 0.5, 6) AS quality FROM src), " +
        "kept AS (SELECT * FROM scored WHERE quality >= 0.3), " +
        "dedup AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn FROM kept) WHERE rn = 1) " +
        "SELECT lang, count(*) AS n_docs, CAST(sum(CAST(ceil(length(text) / 4.0) AS BIGINT)) AS BIGINT) AS est_tokens, " +
        "round(avg(quality), 6) AS avg_quality FROM dedup GROUP BY lang ORDER BY lang"),
    "dedup_cluster_resolve" ->
      ("WITH RECURSIVE edges AS (" +
        "SELECT d.doc_id AS a, d.doc_id + 1 AS b FROM documents d " +
        "WHERE d.doc_id % 5 <> 4 AND EXISTS (SELECT 1 FROM documents x WHERE x.doc_id = d.doc_id + 1)), " +
        "sym AS (SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges), " +
        "reach(v, r) AS (" +
        "SELECT doc_id, doc_id FROM documents " +
        "UNION " +
        "SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.v) " +
        "SELECT v AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id " +
        "FROM reach GROUP BY v ORDER BY doc_id"),
    // same fixpoint, then the md5-uniform split keyed on cluster_id
    "corpus_split_leakage_safe" ->
      ("WITH RECURSIVE edges AS (" +
        "SELECT d.doc_id AS a, d.doc_id + 1 AS b FROM documents d " +
        "WHERE d.doc_id % 5 <> 4 AND EXISTS (SELECT 1 FROM documents x WHERE x.doc_id = d.doc_id + 1)), " +
        "sym AS (SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges), " +
        "reach(v, r) AS (" +
        "SELECT doc_id, doc_id FROM documents " +
        "UNION " +
        "SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.v), " +
        "cl AS (SELECT v AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id FROM reach GROUP BY v) " +
        "SELECT doc_id, cluster_id, CASE WHEN u % 100 < 90 THEN 'train' " +
        "WHEN u % 100 < 95 THEN 'val' ELSE 'test' END AS split FROM (" +
        "SELECT doc_id, cluster_id, " +
        "CAST('0x' || substring(md5(CAST(cluster_id AS VARCHAR) || ':split'), 1, 8) AS BIGINT) AS u " +
        "FROM cl) ORDER BY doc_id"),
    "sim_cosine_topk" ->
      ("SELECT vec_id, label, round(list_cosine_similarity(embedding::DOUBLE[], " +
        "(SELECT embedding FROM embeddings WHERE vec_id = 0)::DOUBLE[]), 6) AS cos " +
        "FROM embeddings ORDER BY cos DESC, vec_id LIMIT 20"),
    // Spark percentile() and DuckDB quantile_cont both linear-interpolate
    // (agg_percentiles precedent); both sides compare at 6 decimals
    "filter_quality_quantile" ->
      (s"WITH scored AS (SELECT doc_id, lang, round(least(length(text) / 500.0, 1.0) * 0.5 + ($stopRatioDuck) * 0.5, 6) AS quality FROM documents), " +
        "thr AS (SELECT lang, round(quantile_cont(quality, 0.25), 6) AS q25 FROM scored GROUP BY lang) " +
        "SELECT doc_id, lang, quality, q25 FROM scored JOIN thr USING (lang) " +
        "WHERE quality >= q25 ORDER BY doc_id"),
    "text_decontaminate" ->
      (s"WITH toks AS (SELECT doc_id, $tokensDuck AS t FROM documents), " +
        s"sh AS (SELECT doc_id, unnest($shingle3Duck) AS shingle FROM toks), " +
        "bsh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0), " +
        "flagged AS (SELECT DISTINCT sh.doc_id FROM sh JOIN bsh USING (shingle)) " +
        "SELECT d.doc_id, f.doc_id IS NOT NULL AS contaminated " +
        "FROM documents d LEFT JOIN flagged f ON d.doc_id = f.doc_id ORDER BY d.doc_id"),
    "text_repetition" ->
      (s"WITH toks AS (SELECT doc_id, $tokensDuck AS t FROM documents), " +
        s"sh AS (SELECT doc_id, $shingle3Duck AS s FROM toks) " +
        "SELECT doc_id, CASE WHEN len(s) = 0 THEN 0.0 " +
        "ELSE round(1 - len(list_distinct(s))::DOUBLE / len(s), 6) END AS rep_ratio " +
        "FROM sh ORDER BY doc_id"),
    // the NAIVE budget-fill form — one window per language; the Spark
    // side must hash-match it through the level-aggregated plan
    "corpus_budget_fill" ->
      (s"SELECT lang, doc_id, quality, ws_tokens, cum_tokens FROM (" +
        "SELECT lang, doc_id, quality, ws_tokens, " +
        "CAST(sum(ws_tokens) OVER (PARTITION BY lang ORDER BY quality DESC, doc_id) AS BIGINT) AS cum_tokens " +
        "FROM (SELECT doc_id, lang, " +
        s"round(least(length(text) / 500.0, 1.0) * 0.5 + ($stopRatioDuck) * 0.5, 6) AS quality, " +
        s"len($tokensDuck) AS ws_tokens FROM documents)) " +
        "WHERE cum_tokens <= 5000 ORDER BY lang, doc_id"),
    "corpus_mix_weights" ->
      ("WITH counts AS (SELECT lang, source, count(*) AS n_docs FROM documents GROUP BY lang, source), " +
        "t AS (SELECT count(*) AS total FROM documents), " +
        "g AS (SELECT count(*) AS n_groups FROM counts) " +
        "SELECT lang, source, n_docs, round(n_docs::DOUBLE / total, 6) AS frac, " +
        "round(total::DOUBLE / (n_groups * n_docs), 6) AS weight " +
        "FROM counts, t, g ORDER BY lang, source"),
    // identical arithmetic: p, p^0.7, the Σ p^α normalizer, q/p
    "sample_temperature" ->
      ("WITH counts AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang), " +
        "t AS (SELECT count(*) AS total FROM documents), " +
        "sc AS (SELECT lang, n_docs, n_docs::DOUBLE / total AS p, " +
        "pow(n_docs::DOUBLE / total, 0.7) AS pa FROM counts, t), " +
        "z AS (SELECT max(zr) AS z FROM " +
        "(SELECT sum(pa) OVER (ORDER BY lang) AS zr FROM sc)) " +
        "SELECT lang, n_docs, round(p, 6) AS p, round(pa / z, 6) AS q, " +
        "round((pa / z) / p, 6) AS weight FROM sc, z ORDER BY lang"),
    "dedup_keep_best" ->
      (s"WITH RECURSIVE edges AS (" +
        "SELECT d.doc_id AS a, d.doc_id + 1 AS b FROM documents d " +
        "WHERE d.doc_id % 5 <> 4 AND EXISTS (SELECT 1 FROM documents x WHERE x.doc_id = d.doc_id + 1)), " +
        "sym AS (SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges), " +
        "reach(v, r) AS (" +
        "SELECT doc_id, doc_id FROM documents " +
        "UNION " +
        "SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.v), " +
        "clusters AS (SELECT v AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id FROM reach GROUP BY v), " +
        s"scored AS (SELECT doc_id, round(least(length(text) / 500.0, 1.0) * 0.5 + ($stopRatioDuck) * 0.5, 6) AS quality FROM documents) " +
        "SELECT cluster_id, doc_id AS kept_doc, quality FROM (" +
        "SELECT c.cluster_id, s.doc_id, s.quality, " +
        "row_number() OVER (PARTITION BY c.cluster_id ORDER BY s.quality DESC, s.doc_id) AS rn " +
        "FROM clusters c JOIN scored s USING (doc_id)) WHERE rn = 1 ORDER BY cluster_id"),
    "corpus_shuffle" ->
      ("SELECT doc_id, md5(doc_id::VARCHAR || ':42') AS skey, " +
        "substr(md5(doc_id::VARCHAR || ':42'), 1, 2) AS shard " +
        "FROM documents ORDER BY skey"),
    // the same 60-bit draw: DuckDB parses '0x…'::BIGINT, Spark conv()s —
    // bit-for-bit agreement verified, integer division in both
    "corpus_interleave_sources" ->
      ("SELECT doc_id, source, weight, " +
        "CAST(('0x' || substr(md5(doc_id::VARCHAR || ':interleave'), 1, 15)) AS BIGINT) // weight AS pos " +
        "FROM (SELECT doc_id, source, CAST(substr(source, 4) AS INT) % 3 + 1 AS weight " +
        "FROM documents) ORDER BY pos, doc_id"),
    "text_char_entropy" ->
      ("WITH chars AS (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents), " +
        "freq AS (SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY doc_id, ch), " +
        "tot AS (SELECT doc_id, count(*) AS n FROM chars GROUP BY doc_id) " +
        "SELECT f.doc_id, round(-sum((c::DOUBLE / n) * ln(c::DOUBLE / n)), 6) AS entropy " +
        "FROM freq f JOIN tot USING (doc_id) GROUP BY f.doc_id ORDER BY f.doc_id"),
    "sample_per_group" ->
      ("SELECT lang, rn, doc_id, skey FROM (" +
        "SELECT lang, doc_id, skey, " +
        "row_number() OVER (PARTITION BY lang ORDER BY skey, doc_id) AS rn " +
        "FROM (SELECT lang, doc_id, md5(doc_id::VARCHAR || ':7') AS skey FROM documents)) " +
        "WHERE rn <= 20 ORDER BY lang, rn")
  )
}
