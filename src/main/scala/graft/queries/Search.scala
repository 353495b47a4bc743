package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword-search surface over the documents corpus: inverted-index
  * construction, conjunctive term lookup, and corpus vocabulary stats —
  * the retrieval companion to the embedding ANN keys (SURVEY §2.10
  * extension surface; the reference's CDX cluster is itself an inverted
  * index from urlkey to captures, this is the text-side analog).
  *
  * Scale notes (100 TB):
  *  - `build_inverted_index`: per-doc `array_distinct` dedupes tokens
  *    BEFORE the explode (map-side, cuts the shuffle to one row per
  *    (doc, distinct term)), then one hash agg partitioned by term — the
  *    natural hash-partitioned layout the postings table is stored in
  *    (term-bucketed, the `join_bucketed_colocated` precedent), so a
  *    query probe reads only its terms' buckets.
  *  - `search_keyword_and`: the term filter sits directly above the
  *    generate, so only rows for the queried terms reach the shuffle —
  *    the aggregate sees |matching (doc, term) pairs|, never the corpus
  *    token stream. Against the STORED index this is a 2-postings fetch.
  *  - `agg_topk_terms`: partial+final hash agg + TakeOrderedAndProject;
  *    the full term->count relation never sorts globally.
  */
object Search extends QueryModule {

  /** THE shared tokenizer (ops.Dedup.tokens) — same definition as Llm's
    * oracles so tokenization can't diverge between modules */
  private def tokens(c: Column): Column = graft.ops.Dedup.tokens(c)

  private val tokensDuck =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"

  /** conjunctive query fixture — both terms frequent in the synthetic
    * vocab (~300 matching docs at sf0.01), so the key is never vacuous */
  private val qTerms = Seq("spark", "merge")

  /** phrase fixture — adjacent occurrence in ~30 docs at sf0.01 (and
    * ≥20 at every sf), measured against the regex oracle */
  private val qPhrase = Seq("fast", "merge")

  /** ranked-retrieval fixture — three terms with DIFFERENT document
    * frequencies so the idf weighting actually orders the result; listed
    * in the FIXED order both engines add the per-term scores in */
  private val qRank = Seq("fast", "merge", "spark")

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.t(s, d, "documents")

  /** (doc_id, term) pairs, distinct per doc via map-side array_distinct */
  private def termPairs(df: DataFrame): DataFrame =
    df.select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("term"))

  // ------------------------------------------------------------ stored index

  /** term-hash partition count of the stored index */
  private val IdxBuckets = 64

  /** CRC32 is the bucket hash ON PURPOSE: Spark's crc32 and
    * java.util.zip.CRC32 are the same standard function, so the probe can
    * compute a query term's bucket DRIVER-SIDE (a static partition filter,
    * no engine round trip) and be byte-certain it matches what the writer
    * computed engine-side. */
  private def termBucketCol(c: Column): Column =
    pmod(crc32(c.cast("binary")), lit(IdxBuckets.toLong)).cast("int")

  private def termBucketLocal(t: String): Int = {
    val c = new java.util.zip.CRC32()
    c.update(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (c.getValue % IdxBuckets).toInt
  }

  /** write the (doc_id, term) relation as a term-hash-partitioned parquet
    * table — the at-rest layout where a query's terms live in a known
    * subset of directories (the ivfpq_index / bucketed-fact-table
    * precedent, applied to text) */
  def writeTermIndex(df: DataFrame, dir: String): Unit =
    termPairs(df)
      .withColumn("tb", termBucketCol(col("term")))
      .write.mode("overwrite").partitionBy("tb").parquet(dir)

  /** conjunctive probe of the STORED index: the term-bucket filter is a
    * STATIC partition filter (buckets computed driver-side via the shared
    * CRC32), so the scan lists ≤ |distinct buckets| of IdxBuckets
    * directories and never touches the rest of the index */
  def probeTermIndex(stored: DataFrame, terms: Seq[String]): DataFrame = {
    // distinct: the stored pairs are distinct-per-doc, so raw user
    // tokens with a repeated term would make the n_hit test unsatisfiable
    val distinctTerms = terms.distinct
    val buckets = distinctTerms.map(termBucketLocal).distinct
    stored
      .filter(col("tb").isin(buckets: _*) && col("term").isin(distinctTerms: _*))
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
      .filter(col("n_hit") === distinctTerms.size)
      .select("doc_id")
  }

  /** Prefix-filtered set-similarity self-join core (the
    * join_set_similarity engine; SkewSpec volume-ladders it): `sets` =
    * (doc_id, toks sorted-distinct array); returns (a, b, jac ≥ t). Two
    * sets at Jaccard ≥ t provably share a token inside both prefixes
    * (|prefix| = n − ⌈t·n⌉ + 1 of the RAREST tokens), so the prefix-token
    * equi-join is a lossless candidate filter; candidates verify with the
    * exact Jaccard. */
  private[graft] def setSimilarityJoin(
      sets0: org.apache.spark.sql.DataFrame, t: Double): org.apache.spark.sql.DataFrame = {
    val sets = sets0
      .localCheckpoint() // consumed 3×: freq, prefixes, both verify fetches
    val freq = sets.select(explode(col("toks")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("tf"))
    val pref = sets
      .select(col("doc_id"), size(col("toks")).as("n"), explode(col("toks")).as("term"))
      .join(broadcast(freq), "term")
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("tf"), col("term"))))
      .filter(col("rn") <= col("n") - ceil(col("n") * t) + 1)
      .select("doc_id", "term")
    val cand = pref.select(col("term"), col("doc_id").as("a"))
      .join(pref.select(col("term"), col("doc_id").as("b")), "term")
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    cand
      .join(sets.select(col("doc_id").as("a"), col("toks").as("ta")), "a")
      .join(sets.select(col("doc_id").as("b"), col("toks").as("tb")), "b")
      .withColumn("jac",
        size(array_intersect(col("ta"), col("tb"))).cast("double") /
          size(array_union(col("ta"), col("tb"))))
      .filter(col("jac") >= t)
      .select(col("a"), col("b"), round(col("jac"), 6).as("jac"))
  }

  override def queries: Map[String, QFn] = Map(
    // term -> (document frequency, sorted postings list); postings render
    // as a csv string — the driver's compare hashes scalar columns
    // (array columns crash its sort, the minhash_sig_text lesson)
    "build_inverted_index" -> ((s, d) =>
      termPairs(docs(s, d))
        .groupBy("term")
        .agg(
          count(lit(1)).as("df"),
          concat_ws(",", sort_array(collect_list(col("doc_id"))).cast("array<string>"))
            .as("postings"))
        .orderBy("term")),

    // conjunctive AND: docs containing every query term — evaluated the
    // way a stored index answers it (per-term postings intersected via a
    // doc-grouped count), with the term filter pruning before the shuffle
    "search_keyword_and" -> ((s, d) =>
      termPairs(docs(s, d))
        .filter(col("term").isin(qTerms: _*))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_hit"))
        .filter(col("n_hit") === qTerms.size)
        .select("doc_id")
        .orderBy("doc_id")),

    // PHRASE query over positional postings — the adjacency refinement a
    // real text index answers "fast merge" (as a phrase, not an AND)
    // with. Positional pairs (doc, pos, term) are the stored shape;
    // adjacency is an EQUI-join on (doc_id, pos) after shifting the
    // second term's positions by −1 — no window, no per-doc collect, and
    // the term filters prune each side to its postings BEFORE the join
    // shuffle (the same filter-above-generate discipline as
    // search_keyword_and). k-term phrases chain k−1 shifted joins, all
    // on the same (doc_id, pos) key. The oracle is an independent
    // formulation: a token-boundary regex over the raw text (exact
    // parity with token adjacency because the tokenizer splits on
    // [^a-z0-9]+ — the separator class the regex requires between the
    // phrase words).
    "search_phrase" -> ((s, d) => {
      val pp = docs(s, d)
        .select(col("doc_id"), posexplode(tokens(col("text"))))
        .toDF("doc_id", "pos", "term")
      val first = pp.filter(col("term") === qPhrase(0)).select("doc_id", "pos")
      val second = pp.filter(col("term") === qPhrase(1))
        .select(col("doc_id"), (col("pos") - 1).as("pos"))
      first.join(second, Seq("doc_id", "pos"))
        .select("doc_id").distinct()
        .orderBy("doc_id")
    }),

    // the write-once/probe-many leg: the SAME conjunctive query answered
    // from the STORED term-hash-partitioned index — the `tb IN (...)`
    // filter is a static PARTITION filter, so the scan reads the query
    // terms' buckets (≤2 of 64 dirs here) and skips the rest of the
    // index on disk. Same oracle as search_keyword_and: the storage
    // layout must be invisible in the result.
    "search_index_probe" -> ((s, d) => {
      // keyTag suffix: tmp() keys by basename(d), which aliases across
      // distinct data dirs sharing a basename (the Tables.keyTag hazard)
      val dir = tmp(d, s"term_index_${keyTag(d)}")
      writeTermIndex(docs(s, d), dir)
      probeTermIndex(s.read.parquet(dir), qTerms).orderBy("doc_id")
    }),

    // set-similarity self-join with PREFIX FILTERING (Bayardo et al.
    // AllPairs / PPJoin): all document pairs with token-set Jaccard ≥ t,
    // EXACTLY — but without the all-pairs join. Every set sorts its
    // tokens by global (frequency ASC, token) and explodes only its
    // PREFIX (|X| − ⌈t·|X|⌉ + 1 rarest tokens): a pair with J ≥ t
    // provably shares a token inside both prefixes, so the equi-join on
    // prefix tokens is a LOSSLESS candidate filter — rare tokens carry
    // tiny buckets, and the frequent tokens that would explode the join
    // sit outside every prefix. Candidates then verify with the exact
    // Jaccard, which is what makes the oracle the brute-force all-pairs
    // (prefix filtering must be invisible in the result). At 100 TB the
    // freq table is a broadcast vocab artifact and the only data-sized
    // shuffles are the prefix-token join + the two set fetches.
    "join_set_similarity" -> ((s, d) => {
      // fan the RAW scan below the tokenize (the Cdx.dfFan placement
      // rule): both union branches and the checkpointed sets relation
      // otherwise tokenize+sort the whole corpus in the single scan
      // task (guide §2.5). Result is partition-independent: freq is an
      // exact count agg, the prefix window orders totally by (tf, term),
      // verification is per-pair.
      val base = graft.Tables.fanOut(docs(s, d), col("doc_id"))
        .filter(col("doc_id") % 10 === 0)
      val twins = base.filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + 400000L)
        .withColumn("text", expr("substring(text, instr(text, ' ') + 1)"))
      val sets = base.unionByName(twins)
        .select(col("doc_id"), array_sort(array_distinct(tokens(col("text")))).as("toks"))
        .filter(size(col("toks")) > 0)
      setSimilarityJoin(sets, t = 0.9).orderBy("a", "b")
    }),

    // BM25 ranked retrieval — the scoring leg the keyword/phrase keys
    // stop short of (Robertson-Spärck Jones probabilistic weighting, the
    // Lucene/Elasticsearch default). Per-(doc, query-term) tf after a
    // term filter directly above the generate (only matching postings
    // reach the shuffle), df from the already-tiny tf relation
    // (broadcast), doc length from a second narrow corpus pass, corpus N
    // + avgdl as an IN-PLAN broadcast 1-row aggregate (the pageRank
    // dangling-mass pattern — no driver collect). Determinism: each
    // term's contribution is a conditional sum over the ONE (doc, term)
    // row, and the final score adds the three terms in FIXED textual
    // order — no float-accumulation order for engines to disagree on
    // (integer token counts stay exact in doubles; ln matches the
    // text_lm_score precedent). Top-20 by (rounded score, doc_id), both
    // tie-break keys deterministic.
    "search_bm25_rank" -> ((s, d) => {
      val toks = docs(s, d).select(col("doc_id"), tokens(col("text")).as("t"))
      val dl = toks.select(col("doc_id"), size(col("t")).as("dl"))
      val stats = dl.agg(
        count(lit(1)).cast("double").as("n"), avg("dl").as("avgdl"))
      val tf = toks.select(col("doc_id"), explode(col("t")).as("term"))
        .filter(col("term").isin(qRank: _*))
        .groupBy("doc_id", "term").agg(count(lit(1)).cast("double").as("tf"))
      val dft = tf.groupBy("term").agg(count(lit(1)).cast("double").as("dft"))
      val comp = tf
        .join(broadcast(dft), "term")
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .withColumn("c",
          log((col("n") - col("dft") + 0.5) / (col("dft") + 0.5) + 1.0) *
            (col("tf") * 2.2) /
            (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      val perTerm = comp.groupBy("doc_id")
        .agg(
          sum(when(col("term") === qRank(0), col("c"))).as("s0"),
          sum(when(col("term") === qRank(1), col("c"))).as("s1"),
          sum(when(col("term") === qRank(2), col("c"))).as("s2"))
      perTerm
        .select(col("doc_id"), round(
          coalesce(col("s0"), lit(0.0)) + coalesce(col("s1"), lit(0.0)) +
            coalesce(col("s2"), lit(0.0)), 6).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    }),

    // corpus vocabulary heavy hitters: top 20 terms by total occurrences
    "agg_topk_terms" -> ((s, d) =>
      docs(s, d)
        .select(explode(tokens(col("text"))).as("term"))
        .groupBy("term")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("term"))
        .limit(20))
  )

  override def oracleSql: Map[String, String] = Map(
    "build_inverted_index" ->
      (s"WITH pairs AS (SELECT DISTINCT doc_id, term FROM " +
        s"(SELECT doc_id, unnest($tokensDuck) AS term FROM documents)) " +
        "SELECT term, count(*) AS df, " +
        "array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings " +
        "FROM pairs GROUP BY term ORDER BY term"),
    "search_keyword_and" ->
      (s"SELECT doc_id FROM (SELECT doc_id, $tokensDuck AS t FROM documents) " +
        s"WHERE ${qTerms.map(t => s"list_contains(t, '$t')").mkString(" AND ")} " +
        "ORDER BY doc_id"),
    // brute-force all-pairs: prefix filtering must be invisible
    "join_set_similarity" ->
      (s"WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0), " +
        "raw AS (SELECT doc_id, text FROM base UNION ALL " +
        "SELECT doc_id + 400000, substring(text, instr(text, ' ') + 1) FROM base WHERE doc_id % 7 = 0), " +
        s"sets AS (SELECT doc_id, list_distinct($tokensDuck) AS t FROM raw " +
        s"WHERE len($tokensDuck) > 0) " +
        "SELECT x.doc_id AS a, y.doc_id AS b, round(" +
        "len(list_intersect(x.t, y.t))::DOUBLE / len(list_distinct(list_concat(x.t, y.t))), 6) AS jac " +
        "FROM sets x JOIN sets y ON x.doc_id < y.doc_id " +
        "WHERE len(list_intersect(x.t, y.t))::DOUBLE / len(list_distinct(list_concat(x.t, y.t))) >= 0.9 " +
        "ORDER BY a, b"),
    // independent formulation: token-boundary regex over the raw text
    "search_phrase" ->
      ("SELECT doc_id FROM documents WHERE regexp_matches(lower(text), " +
        s"'(^|[^a-z0-9])${qPhrase(0)}[^a-z0-9]+${qPhrase(1)}([^a-z0-9]|$$)') " +
        "ORDER BY doc_id"),
    "search_index_probe" ->
      (s"SELECT doc_id FROM (SELECT doc_id, $tokensDuck AS t FROM documents) " +
        s"WHERE ${qTerms.map(t => s"list_contains(t, '$t')").mkString(" AND ")} " +
        "ORDER BY doc_id"),
    // identical arithmetic in identical textual order — only the plan
    // differs (DuckDB recomputes everything from the raw corpus)
    "search_bm25_rank" ->
      (s"WITH toks AS (SELECT doc_id, $tokensDuck AS t FROM documents), " +
        "dl AS (SELECT doc_id, len(t) AS dl FROM toks), " +
        "stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl), " +
        "tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM " +
        "(SELECT doc_id, unnest(t) AS term FROM toks) " +
        s"WHERE term IN (${qRank.map(t => s"'$t'").mkString(", ")}) GROUP BY doc_id, term), " +
        "dft AS (SELECT term, CAST(count(*) AS DOUBLE) AS dft FROM tf GROUP BY term), " +
        "comp AS (SELECT doc_id, term, " +
        "ln((n - dft + 0.5) / (dft + 0.5) + 1.0) * (tf * 2.2) / " +
        "(tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS c " +
        "FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN stats), " +
        "pt AS (SELECT doc_id, " +
        s"sum(CASE WHEN term = '${qRank(0)}' THEN c END) AS s0, " +
        s"sum(CASE WHEN term = '${qRank(1)}' THEN c END) AS s1, " +
        s"sum(CASE WHEN term = '${qRank(2)}' THEN c END) AS s2 " +
        "FROM comp GROUP BY doc_id) " +
        "SELECT doc_id, round(coalesce(s0, 0.0) + coalesce(s1, 0.0) + coalesce(s2, 0.0), 6) AS score " +
        "FROM pt ORDER BY score DESC, doc_id LIMIT 20"),
    "agg_topk_terms" ->
      (s"SELECT term, count(*) AS cnt FROM " +
        s"(SELECT unnest($tokensDuck) AS term FROM documents) " +
        "GROUP BY term ORDER BY cnt DESC, term LIMIT 20")
  )
}
