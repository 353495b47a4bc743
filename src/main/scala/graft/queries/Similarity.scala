package graft.queries

import graft.{QueryModule, Tables}
import graft.functions.{GraftFunctions, VecAlg}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.10 similarity / fuzzy-dedup extensions beyond the Llm module:
  * embedding normalization, embedding-cosine near-dup, SimHash content
  * fingerprints, and LSH / IVF / PQ approximate nearest neighbors.
  *
  * Scale notes (100 TB):
  *  - `sim_ann_lsh` prunes the candidate set to one hyperplane-sign bucket
  *    (expected N/2^bits vectors) before scoring — the scale path over
  *    `sim_cosine_topk`'s full scan; buckets are an equi-shuffle key.
  *  - `dedup_simhash` reduces each doc to 64 bits; near-dup candidates at
  *    scale pair up via band equi-joins on simhash prefixes, never a cross
  *    join (same banding idea as minhash-LSH).
  *  - PQ/IVF codebooks and ADC tables are DRIVER-SIDE MODEL ARTIFACTS
  *    (k×dim doubles) that ride into plans as literals — broadcast with
  *    the plan, so encode/assign/score are single narrow codegen passes
  *    over the scan. No explode, no centroid join, no argmin window
  *    (round-3 pqTopK recomputed an interpreted dist subtree twice; the
  *    fused [[graft.functions.PqEncodeExpr]] kernel replaces all of it).
  *  - All per-row vector math runs through the native codegen kernels
  *    ([[VecAlg]]); the composed higher-order-function forms they
  *    value-match are pinned in NativeExprSpec/SimilaritySpec.
  */
object Similarity extends QueryModule {

  private def normD(a: String): String =
    s"sqrt(aggregate($a, 0D, (acc, v) -> acc + v * v))"

  /** embeddings with a double-cast copy of the vector (Cast on arrays is
    * codegen'd, unlike a transform(...) lambda) */
  /** deterministic PQ codebook literal for the kernel driver rows:
    * 32 entries = 4 subspaces × 8 centroids (VecAlg.pqEncode layout —
    * entry j*nCent+c is centroid c of subspace j), each 16-dim with a
    * per-subspace offset so no two subspaces quantize identically */
  private val kernelBook =
    "transform(sequence(0, 31), k -> transform(sequence(0, 15), " +
      "i -> ((k % 8) - 3.5) * 0.02 + ((i + k) % 3 - 1) * 0.01))"

  private def emb(s: SparkSession, d: String): DataFrame =
    Tables.t(s, d, "embeddings")
      .withColumn("ed", col("embedding").cast("array<double>"))

  /** default-params IVF-PQ fit memo — the model is deterministic (seeded
    * Lloyd's over a fixed relation), so the six ivfpq scenario keys share
    * ONE day-1 training per sf dir instead of six identical refits (the
    * same soundness argument as Llm's BPE memo, and truer to the
    * write-once/probe-many story each scenario tells). Every key still
    * exercises its distinct SERVING leg: in-memory probe, stored-index
    * partition-pruned probe, DPP batch, frozen-model append, cold model
    * load. The checkpointed `assigned` relation lives with the session —
    * one process, one day-1 build. */
  private val ivfpqFitCache =
    new java.util.concurrent.ConcurrentHashMap[String, IvfPqModel]()
  /** keyed by [[sessionKey]] (session identity + dir), not dir alone: the
    * model caches a localCheckpointed DataFrame whose blocks belong to ONE
    * session — a second SparkSession in the same JVM (Verify then Bench,
    * or two suites) must refit rather than probe a stopped session's
    * blocks */
  private def ivfpqFitMemo(s: SparkSession, d: String): IvfPqModel =
    ivfpqFitCache.computeIfAbsent(
      sessionKey(s, d),
      _ => ivfpqFit(emb(s, d).select(col("vec_id"), col("ed"))))

  /** emb_kmeans fit memo — the assignment key and the cluster-quality
    * report (obs_cluster_quality) share ONE Lloyd's fit per sf dir (the
    * ivfpqFitMemo discipline). Unlike the ivfpq memo the artifact is a
    * plain k×dim codebook (no session-owned checkpoint blocks), but the
    * key stays session-scoped so a refit under a new session is a fresh
    * deterministic train, never a stale read. */
  private val kmeansFitCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Double]]]()
  private def kmeansFitMemo(s: SparkSession, d: String, k: Int): Array[Array[Double]] =
    // k rides the cache key: a future caller with a different k must
    // refit, not silently read the first caller's codebook
    kmeansFitCache.computeIfAbsent(sessionKey(s, d) + s":k=$k", { _ =>
      val e = emb(s, d).select(col("vec_id"), col("ed"))
      graft.ops.KMeans.train(
        e, "ed", graft.ops.KMeans.seedById(e, "vec_id", "ed", k, dim = 64), maxIters = 5)
    })


  override def queries: Map[String, QFn] = Map(
    // L2 normalization (unit vectors) — first element + norm checked
    "emb_normalize" -> ((s, d) =>
      emb(s, d)
        .withColumn("nrm", expr(normD("ed")))
        .withColumn("unit", expr(s"transform(ed, x -> x / nrm)"))
        .select(
          col("vec_id"),
          round(col("nrm"), 6).as("nrm"),
          round(element_at(col("unit"), 1), 6).as("u0"),
          round(expr(normD("unit")), 6).as("unit_norm"))
        .orderBy("vec_id")),

    // per-dimension int8 scalar quantization — the 4× storage compressor
    // an embedding store applies before ANN (the PQ codebooks below are
    // the 32×+ variant). The stats pass is ONE global agg carrying 2×dim
    // partial min/max columns — no explode (an explode-based stats pass
    // would multiply 100 TB of vectors by dim before reducing, and its
    // groupBy(dim) shuffle would hash the whole corpus; this plan shuffles
    // exactly one row per partition). The one-row stats relation
    // broadcasts back and quantization is a narrow map. The dim probe
    // reads a single row (LocalLimit 1), not a scan — a production
    // pipeline knows dim statically.
    "emb_quantize_int8" -> ((s, d) => {
      val e = emb(s, d)
      val dim = e.select(size(col("ed")).as("n")).head().getInt(0)
      val stats = e.agg(
        array((0 until dim).map(i => min(col("ed")(i))): _*).as("mn"),
        array((0 until dim).map(i => max(col("ed")(i))): _*).as("mx"))
      e.crossJoin(broadcast(stats))
        // the mx=mn arm is load-bearing under Spark 4 ANSI: a dimension
        // constant across the corpus (zero-padding) makes the scale 0/0 =
        // NaN, and CAST(NaN AS INT) THROWS — a constant dimension carries
        // no information, so its code is pinned to 0 (oracle matches)
        .withColumn("q", expr(
          "transform(ed, (v, i) -> CAST(CASE WHEN mx[i] = mn[i] THEN 0 " +
            "ELSE round((v - mn[i]) * 255.0D / (mx[i] - mn[i])) - 128 END AS INT))"))
        .select(col("vec_id"),
          concat_ws(",", expr("transform(q, x -> CAST(x AS STRING))")).as("qvec"))
        .orderBy("vec_id")
    }),

    // top principal component by distributed power iteration
    // (ops/Pca.scala) — the whitening/centering preprocessor an embedding
    // store runs before ANN or clustering. No dim×dim covariance ever
    // materializes: each round is one narrow corpus pass + one global agg
    // with dim sum columns (the emb_quantize_int8 stats pattern), the
    // centered relation localCheckpointed once. Oracle-exempt (iterative;
    // float-order); SimilaritySpec pins planted-direction recovery,
    // centering (the deliberate mean offset must not leak into v), and
    // driver-key determinism.
    "emb_pca_power" -> ((s, d) => {
      import s.implicits._
      val e = emb(s, d).select(col("vec_id"), col("ed"))
      val dim = e.select(size(col("ed")).as("n")).head().getInt(0)
      val tc = graft.ops.Pca.topComponent(e, "ed", dim)
      tc.v.zipWithIndex.map { case (x, i) =>
        (i, math.rint(x * 1e6) / 1e6, math.rint(tc.eigenvalue * 1e6) / 1e6)
      }.toSeq.toDF("i", "loading", "eigenvalue")
    }),

    // embedding-cosine near-dup over consecutive vec_id pairs
    "dedup_embedding_cos" -> ((s, d) => {
      GraftFunctions.register(s)
      val e = emb(s, d).select(col("vec_id"), col("ed"))
      val a = e.select(col("vec_id"), col("ed").as("ea"))
      val b = e.select((col("vec_id") - 1).as("vec_id"), col("ed").as("eb"))
      a.join(b, "vec_id")
        .withColumn("cos", call_udf("cosine_sim", col("ea"), col("eb")))
        // near_dup thresholds the ROUNDED cosine — both engines compare
        // the same 6-digit value, so a pair sitting within accumulation
        // ulps of 0.95 can't flip the boolean between them
        .select(col("vec_id"), round(col("cos"), 6).as("cos"),
          (round(col("cos"), 6) > 0.95).as("near_dup"))
        .orderBy("vec_id")
    }),

    // SEMANTIC dedup (the SemDeDup recipe — Abbas et al. 2023,
    // arXiv:2303.09540, public): embeddings cluster under a trained
    // coarse quantizer, and near-duplicate pruning runs WITHIN each
    // cluster only — cosine ≥ τ to a lower-id member of the same cell
    // drops a vector, so the corpus never sees an all-pairs join. This is
    // the embedding-space sibling of dedup_fuzzy_minhash (token space)
    // and dedup_image_phash (pixel space): candidates come from a
    // bucketing structure (here the k-means cells the IVF family already
    // trains), verification is the exact cosine kernel. Planted dups are
    // exact-direction copies (new ids, +AppendIdOffset) — identical vectors land
    // in the SAME cell with cos = 1, so recall through the cell structure
    // is certain, which SimilaritySpec pins along with the
    // survivors+dropped partition. Over-cap cells SUB-SPLIT on residual
    // sign-LSH before the self-join (quadratic fan-out stays bounded
    // without the round-8 skip-the-hot-cell recall hole; degenerate
    // leaves collapse exact copies linearly). Oracle-exempt: trained
    // centroids depend on distributed float-summation order, the same
    // reason as every *_trained key.
    "dedup_semantic" -> ((s, d) => {
      GraftFunctions.register(s)
      val base = emb(s, d).select(col("vec_id"), col("ed"))
      val twins = base.filter(col("vec_id") % 9 === 0)
        .withColumn("vec_id", col("vec_id") + AppendIdOffset)
      // the coarse cells come from the SHARED day-1 fit (ivfpqFitMemo —
      // the corpus-wide quantizer every sim_ann_ivfpq* key serves from):
      // SemDeDup does not need cells trained on the dedup batch itself;
      // a frozen codebook assigns identical vectors identically, so the
      // planted twins' certain-recall argument is codebook-independent —
      // and the daily dedup run costs ZERO training jobs.
      val e = base.unionByName(twins)
      val model = ivfpqFitMemo(s, d)
      val cents = model.coarse
      val centLit = typedLit(cents.map(_.toSeq).toSeq)
      // checkpoint AFTER assignment (the ivfpqFit discipline): the
      // assigned relation feeds five subtrees (cell count, bounded join,
      // both vector fetches, final output) — materializing the union
      // instead would re-run the corpus-wide pq_encode pass per consumer
      // dims DERIVED from the shared model, never hard-coded: a changed
      // ivfpqFit geometry with stale literals would NULL every cid and
      // silently stop deduping anything
      val assigned = e.withColumn("cid",
        element_at(call_udf("pq_encode", col("ed"), centLit,
          lit(model.dim), lit(cents.length)), 1))
        .localCheckpoint()
      // candidate pairing + hot-cell sub-split live in
      // [[graft.ops.Dedup.semDedupDropped]]: over-cap cells re-bucket on
      // residual sign-LSH (never skipped — the round-8 recall hole), and
      // pathological leaves fall back to linear exact-vector collapse
      val dropped = graft.ops.Dedup.semDedupDropped(
        assigned, cents.map(_.toSeq).toSeq, model.dim)
      // DELIBERATE null-cid policy (differs from ivfpqFit/ivfpqEncode's
      // filter): a damaged vector (wrong length / null slot) encodes to
      // cid NULL, can never pair in the null-unsafe cid equi-join, and
      // therefore always SURVIVES — a dedup operator must pass through
      // data it cannot embed rather than silently delete it; the null
      // cid in the output row is the caller's quarantine signal
      assigned.select("vec_id", "cid")
        .join(dropped, Seq("vec_id"), "left_anti")
        .orderBy("vec_id")
    }),

    // 64-bit SimHash over token hashes (oracle-exempt: xxhash64 is
    // engine-specific; SimilaritySpec asserts near-dups land close in
    // Hamming distance, far pairs far, and that this codegen-kernel path
    // equals the composed explode+agg reference bit-for-bit)
    "dedup_simhash" -> ((s, d) =>
      graft.ops.Dedup.simhash64Native(Tables.t(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    // the fused tokenize+sketch kernel as its own driver row (SURVEY §2.11
    // contract key; oracle-exempt — xxhash64 inside is engine-specific,
    // golden/parity pins live in NativeExprSpec). hex() so the sketch is
    // eyeballable in the dump.
    "simhash64_text" -> ((s, d) => {
      GraftFunctions.register(s)
      Tables.t(s, d, "documents")
        .selectExpr("doc_id", "hex(simhash64_text(text)) AS simhash_hex")
        .orderBy("doc_id")
    }),

    // the fused tokenize+shingle+minhash kernel as its own driver row
    // (SURVEY §2.11 contract key; oracle-exempt, parity in NativeExprSpec).
    // The raw array<bigint> signature is rendered as a comma-joined hex
    // string (mirroring simhash64_text's hex()) so the driver's dump
    // pipeline can sort/hash the column — pandas can't factorize ndarrays.
    "minhash_sig_text" -> ((s, d) => {
      GraftFunctions.register(s)
      Tables.t(s, d, "documents")
        .selectExpr("doc_id",
          "concat_ws(',', transform(minhash_sig_text(text, 16, 3), x -> hex(x))) AS sig_hex")
        .orderBy("doc_id")
    }),

    // ---- the 5 vector kernels as their own driver projection rows ----
    // (kernelBook is defined on the module: 4 subspaces × 8 centroids of
    // 16 dims, flattened in VecAlg.pqEncode's j*nCent+c layout)
    // (simhash64_text's discipline: every SURVEY §2 kernel row gets a
    // CORRECTNESS entry and a bench line. Oracle-exempt — float kernels
    // with engine-specific accumulation; bit-parity vs the composed HOF
    // forms and damage/guard behavior are pinned in NativeExprSpec, and
    // every kernel is ALSO inside oracled composite keys like
    // sim_ann_pq/sim_cosine_topk. Query/codebook/plane literals are
    // closed-form sequence() expressions — nothing driver-side.)
    "cosine_sim" -> ((s, d) => {
      GraftFunctions.register(s)
      emb(s, d).selectExpr("vec_id",
        "round(cosine_sim(ed, transform(sequence(0, 63), i -> 0.5 + i * 0.01)), 6) AS cos_q")
        .orderBy("vec_id")
    }),
    "l2_dist" -> ((s, d) => {
      GraftFunctions.register(s)
      emb(s, d).selectExpr("vec_id",
        "round(l2_dist(ed, transform(sequence(0, 63), i -> 0.5 + i * 0.01)), 6) AS l2_q")
        .orderBy("vec_id")
    }),
    "lsh_bucket" -> ((s, d) => {
      GraftFunctions.register(s)
      emb(s, d).selectExpr("vec_id",
        "lsh_bucket(ed, transform(sequence(0, 3), p -> transform(sequence(0, 63), " +
          "i -> CASE WHEN (i + p) % 3 = 0 THEN 1.0 ELSE -0.5 END))) AS bucket")
        .orderBy("vec_id")
    }),
    "pq_encode" -> ((s, d) => {
      GraftFunctions.register(s)
      // 4 subspaces x 16 dims against the deterministic 32-entry codebook
      // (entry j*nCent+c = centroid c of subspace j — VecAlg.pqEncode layout);
      // codes render comma-joined so the dump pipeline can hash them
      emb(s, d).selectExpr("vec_id",
        "concat_ws(',', transform(pq_encode(ed, " + kernelBook + ", 16, 8), " +
          "x -> CAST(x AS STRING))) AS codes")
        .orderBy("vec_id")
    }),
    "pq_adc" -> ((s, d) => {
      GraftFunctions.register(s)
      // encode-then-score composition: the ADC distance of each vector's
      // OWN codes against the fixed query — the executor-side serving op
      emb(s, d)
        .selectExpr("vec_id",
          "pq_encode(ed, " + kernelBook + ", 16, 8) AS codes")
        .selectExpr("vec_id",
          "round(pq_adc(transform(sequence(0, 63), i -> 0.5 + i * 0.01), codes, " +
            kernelBook + ", 8), 6) AS adc_q")
        .orderBy("vec_id")
    }),

    // banded SimHash candidate pairs over a corpus with planted near-dups
    // (oracle-exempt; SimilaritySpec asserts the planted pairs appear)
    "dedup_simhash_pairs" -> ((s, d) => {
      val nearDup = Tables.t(s, d, "documents")
        .filter(col("doc_id") % 11 === 0)
        .withColumn("doc_id", col("doc_id") + 300000L)
        .withColumn("text", expr("substring(text, instr(text, ' ') + 1)"))
      val corpus = Tables.fanOut(
        Tables.t(s, d, "documents").unionByName(nearDup), col("doc_id"))
      graft.ops.Dedup.simhashCandidates(
          graft.ops.Dedup.simhash64Native(corpus, "doc_id", "text"), bands = 4)
        .orderBy("a", "b")
    }),

    // ANN: 8 hyperplane sign bits -> bucket; score only the query's bucket.
    // Bucketing and scoring are native codegen kernels; the planes are a
    // literal (driver-side model artifact, like the PQ codebook).
    "sim_ann_lsh" -> ((s, d) => {
      GraftFunctions.register(s)
      val planesCol = typedLit(hyperplanes(8, 64))
      val e = emb(s, d)
        .withColumn("bucket", call_udf("lsh_bucket", col("ed"), planesCol))
      val q = e.filter(col("vec_id") === 0)
        .select(col("ed").as("qd"), col("bucket").as("qbucket"))
      e.join(broadcast(q), col("bucket") === col("qbucket"))
        .withColumn("cos", call_udf("cosine_sim", col("ed"), col("qd")))
        .select(col("vec_id"), col("bucket"), round(col("cos"), 6).as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10)
    }),

    // BINARY quantization ANN — the 512× compression end of the
    // quantization spectrum (1 bit/dim vs PQ's byte-per-subspace vs
    // int8's byte-per-dim): bit i = sign(ed[i]), packed into two 32-bit
    // words (BIGINT-safe, the dedup_image_phash convention), distance =
    // XOR popcount. Fully deterministic — sign extraction and bit packing
    // are exact integer ops — so unlike the trained variants this ANN
    // path is DuckDB-ORACLED end to end. Scale shape: packing is one
    // narrow codegen projection (the corpus at rest is 8 bytes/vector),
    // the query words broadcast, top-10 is TakeOrderedAndProject on
    // (hamming, vec_id).
    "sim_ann_binary_quant" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id"), col("ed"))
      def word(lo: Int) =
        (lo until lo + 32)
          .map(i => when(col("ed")(i) > 0, lit(1L << (i - lo))).otherwise(lit(0L)))
          .reduce(_ + _)
      val packed = e.select(col("vec_id"), word(0).as("h1"), word(32).as("h2"))
      val q = packed.filter(col("vec_id") === 0)
        .select(col("h1").as("q1"), col("h2").as("q2"))
      packed.crossJoin(broadcast(q))
        .withColumn("ham",
          bit_count(col("h1").bitwiseXOR(col("q1"))) +
            bit_count(col("h2").bitwiseXOR(col("q2"))))
        .select(col("vec_id"), col("ham"))
        .orderBy(col("ham"), col("vec_id"))
        .limit(10)
    }),

    // Product-quantization ANN (the classic 100-TB-scale path: vectors
    // compress to m small codes, the scan touches codes only). m=4
    // subspaces × 16 dims; codebook per subspace = subvectors of the first
    // 16 embeddings (deterministic stand-in for k-means, same convention
    // as sim_ann_ivf). Encode = one narrow `pq_encode` pass — a 64×
    // storage reduction (256 B float vector → 4 one-byte codes). Query =
    // ADC: the 4×16 query→centroid distance table is computed driver-side
    // and rides the plan as a literal; the approximate distance is a sum
    // of table lookups per code — no full-vector math on the scan side.
    // Fully relational and DuckDB-oracled (everything is deterministic).
    // Shared kernel in [[pqTopK]]; SimilaritySpec plants near-duplicates
    // to pin recall.
    "sim_ann_pq" -> ((s, d) =>
      pqTopK(emb(s, d).select(col("vec_id"), col("ed")), queryId = 0L)),

    // Two-stage ANN (the production shape): PQ/ADC narrows to 50
    // candidates from codes alone, then ONLY those 50 touch their full
    // vectors for an exact cosine re-rank. At 100 TB the exact pass costs
    // candidates × dim regardless of corpus size — the re-rank join is a
    // broadcast of 50 ids into the embedding scan.
    "sim_ann_pq_rerank" -> ((s, d) => {
      GraftFunctions.register(s)
      val e = emb(s, d).select(col("vec_id"), col("ed"))
      val cand = pqTopK(e, queryId = 0L, k = 50).select("vec_id")
      val q = e.filter(col("vec_id") === 0).select(col("ed").as("qd"))
      e.join(broadcast(cand), "vec_id")
        .crossJoin(broadcast(q))
        .withColumn("cos", call_udf("cosine_sim", col("ed"), col("qd")))
        .select(col("vec_id"), round(col("cos"), 6).as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10)
    }),

    // IVF-style ANN: coarse quantizer = 16 fixed centroid vectors (the
    // first 16 embeddings — a deterministic stand-in for k-means); assign
    // every vector to its nearest centroid, probe only the query's cell.
    // Fully SQL-expressible, so unlike the LSH variant it IS oracle-checked.
    "sim_ann_ivf" -> ((s, d) => ivfTopK(emb(s, d), nProbe = 1)),

    // Same index, nProbe=2: THE recall/latency knob of IVF at scale — the
    // scan touches nProbe/nCells of the corpus, and raising nProbe
    // recovers neighbors whose cell boundary the query sits on. The probe
    // list is still a broadcast (nProbe rows), so the plan shape is
    // unchanged: no shuffle added, just a bigger pruned-in candidate set.
    "sim_ann_ivf_multiprobe" -> ((s, d) => ivfTopK(emb(s, d), nProbe = 2)),

    // IVF with a TRAINED coarse quantizer: seeded Lloyd's k-means over the
    // corpus (ops/KMeans — assignment is the same narrow pq_encode pass,
    // means are one k×dim aggregation per round), then assign + probe the
    // query's 2 nearest cells by L2 and cosine-score only those members.
    // Oracle-exempt by design: the trained centroids depend on distributed
    // float summation order, so a DuckDB re-derivation can't be expected
    // to hash-match; SimilaritySpec pins planted-neighbor recall and
    // self-hit instead (the reserved-vector variants above stay as the
    // deterministic-oracle path).
    "sim_ann_ivf_trained" -> ((s, d) => {
      GraftFunctions.register(s)
      val e = emb(s, d).select(col("vec_id"), col("ed"))
      val cents = graft.ops.KMeans.train(
        e, "ed", graft.ops.KMeans.seedById(e, "vec_id", "ed", k = 16, dim = 64), maxIters = 4)
      ivfTrainedTopK(e, cents, queryId = 0L, nProbe = 2)
    }),

    // K-MEANS CLUSTERING as a first-class curation output — the semantic
    // partitioning step of cluster-based dedup / diversity sampling
    // (SemDeDup and the cluster-balanced corpus recipes, public): the
    // SAME seeded Lloyd's trainer the quantizers use, but the DELIVERABLE
    // is the assignment table (vec_id → cluster) downstream curation
    // joins on, not a probe result. Assignment is one narrow codegen
    // pq_encode pass against the literal centroids (k×dim doubles riding
    // the plan — no centroid join, no argmin window); at 100 TB the FIT
    // runs on a seeded sample while the assignment pass still touches
    // every row exactly once. Oracle-exempt for the family reason
    // (trained centroids depend on distributed float-summation order);
    // SimilaritySpec pins planted-cluster recovery, total coverage,
    // cluster-id range, and objective improvement over the seed.
    "emb_kmeans" -> ((s, d) => {
      GraftFunctions.register(s)
      val k = 8
      val centLit = typedLit(kmeansFitMemo(s, d, k).map(_.toSeq).toSeq)
      emb(s, d).select(col("vec_id"), col("ed"))
        .withColumn("cluster",
          element_at(call_udf("pq_encode", col("ed"), centLit, lit(64), lit(k)), 1))
        .filter(col("cluster").isNotNull)
        .select(col("vec_id"), col("cluster"))
        .orderBy("vec_id")
    }),

    // CLUSTER-QUALITY REPORT beside emb_kmeans (the obs_* discipline —
    // obs_ann_recall asks "is the index still accurate?", this asks "is
    // the clustering MEANINGFUL?"): per cluster, member count, mean L2
    // to the own centroid (compactness), distance to the nearest OTHER
    // centroid (separation), and their Davies-Bouldin-style ratio.
    // Shares the memoized fit with emb_kmeans (one Lloyd's run serves
    // the pair — the ivfpq-fit discipline); compactness is ONE narrow
    // assignment+distance pass and a k-row hash agg, separation is k×k
    // driver arithmetic on the codebook — never corpus-sized. Output is
    // k rows at any corpus scale. Oracle-exempt (trained centroids);
    // SimilaritySpec pins the planted-cluster separation story and the
    // report's structural invariants on the driver corpus.
    "obs_cluster_quality" -> ((s, d) => {
      GraftFunctions.register(s)
      val k = 8
      val cents = kmeansFitMemo(s, d, k)
      val centLit = typedLit(cents.map(_.toSeq).toSeq)
      // nearest-other-centroid separation: pure driver math on k vectors
      val sep = cents.indices.map { i =>
        i -> cents.indices.filter(_ != i).map { j =>
          math.sqrt(cents(i).zip(cents(j)).map { case (a, b) => (a - b) * (a - b) }.sum)
        }.min
      }
      val sepLit = map(sep.flatMap { case (c, v) => Seq(lit(c), lit(v)) }: _*)
      emb(s, d).select(col("ed"))
        .withColumn("cluster",
          element_at(call_udf("pq_encode", col("ed"), centLit, lit(64), lit(k)), 1))
        .filter(col("cluster").isNotNull)
        .withColumn("dist",
          call_udf("l2_dist", col("ed"), element_at(centLit, col("cluster") + 1)))
        .groupBy("cluster")
        .agg(count(lit(1)).as("n"), avg("dist").as("m"))
        .withColumn("no", element_at(sepLit, col("cluster")))
        .select(col("cluster"), col("n"),
          round(col("m"), 6).as("mean_l2"),
          round(col("no"), 6).as("nearest_other"),
          round(col("m") / col("no"), 6).as("db_ratio"))
        .orderBy("cluster")
    }),

    // PQ with TRAINED per-subspace codebooks: m independent seeded
    // k-means runs over the corpus's subvector slices (each a narrow
    // slice projection + the same KMeans DataFrame loop), then the
    // identical encode/ADC query as sim_ann_pq. Oracle-exempt for the
    // same float-summation-order reason as sim_ann_ivf_trained;
    // SimilaritySpec pins planted-neighbor recall. Real recall on real
    // embeddings comes from exactly this path — the reserved-vector
    // variant stays as the deterministic-oracle twin.
    "sim_ann_pq_trained" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id"), col("ed"))
      pqTopK(e, queryId = 0L, codebook = Some(trainPqCodebook(e)))
    }),

    // IVF-PQ, the composed production index (the classic large-scale ANN
    // shape): a trained coarse quantizer partitions the corpus into
    // cells, each vector stores only its cell id + PQ codes of its
    // RESIDUAL (vector − cell centroid — residuals concentrate near 0,
    // so the same code budget quantizes them much tighter than raw
    // vectors), and a query probes its nProbe nearest cells with a
    // PER-CELL ADC table built from the query's residual against that
    // cell. Storage per vector: 1 cell id + m bytes. Everything the scan
    // touches is narrow: assignment, residual (native vec_sub), and
    // encode are one codegen pass; the per-cell ADC tables are driver
    // literals behind a CASE on the cell id. Oracle-exempt (trained
    // centroids; same float-order reason as the other trained variants);
    // SimilaritySpec pins planted-neighbor recall + self-hit.
    "sim_ann_ivfpq" -> ((s, d) =>
      ivfpqTopKModel(ivfpqFitMemo(s, d), queryId = 0L, nProbe = 2)),

    // FILTERED IVF-PQ — sim_ann_hnsw_filtered's inverted-file twin: the
    // predicate is a plain boolean column on the codes relation, matching
    // rows filter BEFORE ranking, and the probe WIDENS to
    // ceil(nProbe × corpus/allowed) cells via an in-plan broadcast
    // aggregate (the filtered-HNSW frontier-widening analog), so recall
    // survives selective predicates. Oracle-exempt like the family;
    // SimilaritySpec pins admit-all == plain probe bit-for-bit,
    // predicate purity, the widened-probe exactness bound, and
    // null-flag-is-not-matching.
    "sim_ann_ivfpq_filtered" -> ((s, d) => {
      val model = ivfpqFitMemo(s, d)
      ivfpqProbeFiltered(
        ivfpqCodes(model).withColumn("allowed", col("vec_id") % 3 === 1),
        model, model.vectorOf(0L), nProbe = 2)
    }),

    // IVF-PQ through the MATERIALIZED index: write (vec_id, cid, codes)
    // as a cid-partitioned parquet table, then answer the query from the
    // stored table — the probe's cid filter partition-prunes the read to
    // nProbe of nCells directories (the write-once/probe-many serving
    // shape; SimilaritySpec pins stored == in-memory top-k and the pruned
    // partition count). Oracle-exempt like the other trained variants.
    "sim_ann_ivfpq_index" -> ((s, d) =>
      ivfpqIndexTopKModel(ivfpqFitMemo(s, d), queryId = 0L, nProbe = 2,
        dir = tmp(d, "ivfpq_index"))),

    // BATCHED IVF-PQ: three query vectors through ONE probe plan — the
    // shape a retrieval/dedup pipeline actually runs (nobody serves 100 TB
    // one driver-planned query at a time). Cell ranking, residuals, and
    // ADC scoring all distribute via the native kernels (pq_adc replaces
    // the per-query driver-built literal table); top-k is a per-qid
    // window. Oracle-exempt like the other trained variants;
    // SimilaritySpec pins each query's batch rows == its single-probe rows
    // bit-for-bit.
    "sim_ann_ivfpq_batch" -> ((s, d) => {
      val model = ivfpqFitMemo(s, d)
      val queries = model.assigned.filter(col("vec_id").isin(0L, 7L, 23L))
        .select(col("vec_id").as("qid"), col("ed").as("qed"))
      ivfpqBatchProbe(ivfpqCodes(model), model, queries, nProbe = 2)
    }),

    // THE serving shape, fully composed: a query batch answered from the
    // STORED cid-partitioned index — the broadcast probe join on cid is
    // what dynamic partition pruning keys on, so the scan lists only the
    // cells the batch actually probes (SimilaritySpec pins the DPP filter
    // and the pruned partition count; rows == the in-memory batch under
    // one model). Oracle-exempt like the other trained variants.
    "sim_ann_ivfpq_serve" -> ((s, d) =>
      ivfpqIndexBatchTopKModel(
        ivfpqFitMemo(s, d), queryIds = Seq(0L, 7L, 23L), nProbe = 2,
        dir = tmp(d, "ivfpq_serve"))),

    // Day-2 APPEND into the stored index with the model FROZEN: the new
    // batch (planted near-dup twins of every 17th vector, fresh ids)
    // encodes against the EXISTING centroids + codebook — one narrow
    // codegen pass — and parquet-appends into the cid= layout: no refit,
    // no rewrite of stored files (the IVF-PQ twin of
    // dedup_incremental_minhash's INSERT INTO). The probe then reads
    // old + new through the same pruned scan, and query 0's planted twin
    // surfaces in the top-k. Oracle-exempt like the other trained
    // variants; SimilaritySpec pins append == full frozen-model
    // re-encode bit-for-bit, the planted-neighbor hit, and the
    // undisturbed cid= partition layout.
    "sim_ann_ivfpq_append" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id"), col("ed"))
      ivfpqAppendTopKModel(ivfpqFitMemo(s, d), e, queryId = 0L, nProbe = 2,
        dir = tmp(d, "ivfpq_append"))
    }),

    // Graph-based ANN (HNSW — Malkov & Yashunin 2016): the recall end of
    // the ANN spectrum. Sharded scatter-gather: nShards independent
    // per-task graphs, each greedy-searched in O(ef·m·log n), global
    // top-k merges nShards·k candidate rows. Oracle-exempt: the
    // candidate set depends on graph traversal (SimilaritySpec pins
    // planted recall ≥ the IVF-PQ ladder, exact-cosine agreement with
    // the brute-force scores, and determinism).
    "sim_ann_hnsw" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id"), col("ed"))
      val q = e.filter(col("vec_id") === 0L).select("ed").head().getSeq[Double](0).toArray
      graft.ops.Hnsw.topK(e, q)
    }),

    // HNSW through the STORED adjacency: day 1 writes the graph's edges
    // as a shard-partitioned parquet relation (the ivfpq_index
    // write-once/probe-many shape); the serve leg reconstructs each
    // shard's graph VERBATIM from disk (no rebuild) and answers the
    // query bit-equal to the in-memory search (SimilaritySpec pins the
    // parity). Oracle-exempt like sim_ann_hnsw.
    "sim_ann_hnsw_index" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id"), col("ed"))
      val q = e.filter(col("vec_id") === 0L).select("ed").head().getSeq[Double](0).toArray
      val dir = tmp(d, "hnsw_index")
      graft.ops.Hnsw.adjacency(e, dim = q.length)
        .write.mode("overwrite").partitionBy("shard").parquet(dir)
      graft.ops.Hnsw.topKStored(s.read.parquet(dir), e, q)
    }),

    // BATCHED HNSW: three query vectors through ONE plan (the
    // sim_ann_ivfpq_batch shape) — each shard builds once and answers
    // every query, the batch rides the closure as a driver artifact
    // (nQ·dim doubles, the codebook precedent), per-qid top-k merges
    // through one qid-partitioned window. Oracle-exempt like the other
    // graph-ANN keys; HnswSpec pins batch == single per query.
    "sim_ann_hnsw_batch" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id"), col("ed"))
      val queries = e.filter(col("vec_id").isin(0L, 7L, 23L))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1)
      graft.ops.Hnsw.batchTopK(e, queries)
    }),

    // FILTERED ANN — the production vector-search reality (top-k among
    // docs passing a metadata predicate: language, license, date): the
    // predicate is a plain COLUMN on the vector relation (Catalyst
    // plans it like any filter; only a 1-bit flag rides the shard
    // shuffle), each shard's graph builds over its FULL slice and walks
    // FILTERED — non-matching nodes route the walk, only matching ones
    // surface (the filtered-HNSW traversal rule; a pre-filtered build
    // would disconnect under selective predicates). The fixture
    // predicate vec_id % 3 == 1 excludes the query's own self-hit, so
    // the filter is visibly load-bearing. efS rises with 1/selectivity
    // (64 here for the 1/3 gate). Oracle-exempt like the graph-ANN
    // family; HnswSpec pins predicate-purity, recall vs the filtered
    // brute force, and admit-all == plain topK bit-for-bit.
    "sim_ann_hnsw_filtered" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id"), col("ed"))
      val q = e.filter(col("vec_id") === 0L).select("ed").head().getSeq[Double](0).toArray
      graft.ops.Hnsw.topKFiltered(
        e.withColumn("allowed", col("vec_id") % 3 === 1), q, efS = 64)
    }),

    // GRAPH-INDEX HEALTH — the structural audit an ANN deployment
    // monitors next to its recall report (obs_ann_recall answers "is
    // the index still accurate?"; this answers "is the index still
    // WELL-FORMED?" — node counts per shard, level depth, the entry
    // derivation, degree stats, level-0 sinks): one relational
    // aggregation over the stored adjacency alone — no vectors read, no
    // graph reconstruction, so the audit is index-sized at 100 TB.
    // Oracle-exempt (the adjacency content is graph traversal);
    // HnswSpec pins the report invariants against the graph's caps.
    "obs_index_health" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id"), col("ed"))
      val q = e.filter(col("vec_id") === 0L).select("ed").head().getSeq[Double](0).toArray
      val dir = tmp(d, "hnsw_health")
      graft.ops.Hnsw.adjacency(e, dim = q.length)
        .write.mode("overwrite").partitionBy("shard").parquet(dir)
      graft.ops.Hnsw.indexHealth(s.read.parquet(dir))
    }),

    // TAKEDOWN from the stored HNSW adjacency — the vector-index side of
    // the zipnum_takedown_merge obligation (a legal takedown must leave
    // the SERVING index, not just the source table): the v1 serve's #2
    // and #3 hits are tombstoned, Hnsw.removeStored drops their nodes
    // and BRIDGES the holes (bounded repair: only the deleted nodes'
    // ex-neighbors re-select, by the same Alg-4 heuristic the build
    // uses), the pruned adjacency lands in the NEXT version dir, and the
    // serve re-answers from it WITHOUT the deleted ids — visibly
    // different top-k, no rebuild. Oracle-exempt like the other
    // graph-ANN keys; HnswSpec pins never-surfaces + bounded repair.
    "sim_ann_hnsw_takedown" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id"), col("ed"))
      val q = e.filter(col("vec_id") === 0L).select("ed").head().getSeq[Double](0).toArray
      val dir = tmp(d, "hnsw_takedown")
      graft.ops.Hnsw.adjacency(e, dim = q.length)
        .write.mode("overwrite").partitionBy("shard").parquet(s"$dir/v1")
      val before = graft.ops.Hnsw.topKStored(s.read.parquet(s"$dir/v1"), e, q)
        .collect()
      val dead = before.iterator.drop(1).take(2).map(_.getLong(0)).toSet
      graft.ops.Hnsw.removeStored(s.read.parquet(s"$dir/v1"), e, dead)
        .write.mode("overwrite").partitionBy("shard").parquet(s"$dir/v2")
      val alive = e.filter(!col("vec_id").isin(dead.toSeq.map(Long.box): _*))
      graft.ops.Hnsw.topKStored(s.read.parquet(s"$dir/v2"), alive, q)
    }),

    // Day-2 APPEND into the stored HNSW adjacency — the graph index's
    // native incremental insert (no rebuild, no retraining): the planted
    // twin batch (appendBatch — every 17th vector nudged, fresh ids
    // above the corpus range) folds into the stored graph per shard via
    // cogroup, the updated adjacency lands in the NEXT version dir (the
    // zipnum-merge generation discipline — never read-and-overwrite one
    // live dir), and the serve answers from it: query 0's planted twin
    // surfaces in the top-k. Because levels are id-hash-deterministic
    // and batch ids sort after the base, the appended graph equals a
    // from-scratch build over base ∪ batch EXACTLY (HnswSpec pins it).
    // Oracle-exempt like the other graph-ANN keys.
    "sim_ann_hnsw_append" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id"), col("ed"))
      val q = e.filter(col("vec_id") === 0L).select("ed").head().getSeq[Double](0).toArray
      val dir = tmp(d, "hnsw_append")
      graft.ops.Hnsw.adjacency(e, dim = q.length)
        .write.mode("overwrite").partitionBy("shard").parquet(s"$dir/v1")
      val batch = appendBatch(e)
      val all = e.unionByName(batch)
      graft.ops.Hnsw.appendStored(s.read.parquet(s"$dir/v1"), all, batch, dim = q.length)
        .write.mode("overwrite").partitionBy("shard").parquet(s"$dir/v2")
      graft.ops.Hnsw.topKStored(s.read.parquet(s"$dir/v2"), all, q)
    }),

    // ANN RECALL EVALUATION — the report an ANN deployment actually
    // monitors (closes the quality-observability loop the way
    // obs_dedup_savings closes storage accounting): for a bounded query
    // sample, recall@10 of the graph index vs the brute-force exact
    // top-10. The exact side is ONE corpus pass against the broadcast
    // query sample (cost |sample|·N — the evaluation budget; at 100 TB
    // you sample queries and run this per release, not per query); the
    // index side is the batched graph search. Hits join on (qid,
    // vec_id); the report is |sample| rows. Oracle-exempt (the index
    // side is graph traversal); HnswSpec pins the report shape and a
    // recall floor.
    //
    // The sample is FIXED-K bottom-k by deterministic hash (the
    // stream_sample_reservoir recipe): xxhash64(vec_id) ranks every id
    // in one global random permutation and the k smallest win — a
    // uniform sample whose size is the EVALUATION BUDGET, not a
    // fraction of the corpus. The old `% 97` sample grew linearly with
    // corpus size, so the driver-side collect, the batch closure, AND
    // the broadcast exact side all scaled with N — at 100 TB the
    // evaluation would dwarf what it evaluates. orderBy+limit compiles
    // to TakeOrderedAndProject: per-partition top-k, k-row merge.
    "obs_ann_recall" -> ((s, d) => {
      GraftFunctions.register(s)
      val e = emb(s, d).select(col("vec_id"), col("ed"))
      val sample = e
        .orderBy(xxhash64(col("vec_id")), col("vec_id"))
        .limit(AnnRecallSampleK)
      val qarr = sample.collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
      val ann = graft.ops.Hnsw.batchTopK(e, qarr)
        .select(col("qid"), col("vec_id"))
      val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
      val exact = e.crossJoin(broadcast(
          sample.select(col("vec_id").as("qid"), col("ed").as("qed"))))
        .withColumn("cos", round(call_udf("cosine_sim", col("ed"), col("qed")), 6))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .select(col("qid"), col("vec_id"))
      val hitCounts = exact.join(ann, Seq("qid", "vec_id"), "left_semi")
        .groupBy("qid").agg(count(lit(1)).as("hits"))
      // report EVERY sampled query — a zero-recall query must show as a
      // 0 row, not silently vanish from its own audit
      sample.select(col("vec_id").as("qid"))
        .join(hitCounts, Seq("qid"), "left")
        .select(col("qid"), coalesce(col("hits"), lit(0L)).as("hits"),
          round(coalesce(col("hits"), lit(0L)) / 10.0, 2).as("recall_at_10"))
        .orderBy("qid")
    }),

    // STREAMING graph-index ingest, batch-run (the stream_* driver
    // convention): three ascending vec_id slices fold in as micro-batches
    // — each publishes the next index version via the stored-append path
    // (batchId-keyed vector dirs + version dirs = the exactly-once
    // contract of streamingZipNumBatches) — and the serve answers from
    // the NEWEST version. Because levels are id-hash-deterministic and
    // batches ascend, the final index equals the one-shot build, so the
    // served top-k equals sim_ann_hnsw's (StreamingSpec pins it, plus
    // MemoryStream batch-boundary behavior and replay idempotence).
    // Oracle-exempt like the other graph-ANN keys.
    "stream_hnsw_ingest" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id"), col("ed"))
      val q = e.filter(col("vec_id") === 0L).select("ed").head().getSeq[Double](0).toArray
      val dir = tmp(d, "hnsw_stream_ingest")
      val maxId = e.agg(max("vec_id")).head().getLong(0)
      val cut1 = maxId / 3
      val cut2 = 2 * maxId / 3
      graft.ops.Hnsw.ingestBatch(
        e.filter(col("vec_id") <= cut1), dir, 0L, dim = q.length)
      graft.ops.Hnsw.ingestBatch(
        e.filter(col("vec_id") > cut1 && col("vec_id") <= cut2), dir, 1L, dim = q.length)
      graft.ops.Hnsw.ingestBatch(
        e.filter(col("vec_id") > cut2), dir, 2L, dim = q.length)
      graft.ops.Hnsw.topKLatest(s, dir, q)
    }),

    // COLD serve: day 1 stores the index AND its model (centroids +
    // codebook, a few KB, parquet beside the codes); day N loads the
    // model and probes the stored cid-partitioned table. NOTHING in the
    // serve path trains or scans the corpus — the query vector is a
    // single-row lookup, the probe reads nProbe of nCells partitions.
    // This is the missing leg the other index keys imply but don't run:
    // their probes hold the model in the fitting process's memory.
    // Oracle-exempt like the other trained variants; SimilaritySpec pins
    // cold == warm bit-for-bit (doubles round-trip parquet exactly).
    "sim_ann_ivfpq_cold" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id"), col("ed"))
      val dir = tmp(d, "ivfpq_cold")
      // day-1 build (not the serve path): fit (shared memo), store
      // codes + model — the serve leg below starts from disk regardless
      val model = ivfpqFitMemo(s, d)
      ivfpqCodes(model)
        .write.mode("overwrite").partitionBy("cid").parquet(s"$dir/index")
      ivfpqWriteModel(model, s"$dir/model")
      // day-N serve: load model, fetch the query vector, probe the codes
      val served = ivfpqLoadModel(s, s"$dir/model")
      val q = e.filter(col("vec_id") === 0L)
        .select("ed").head().getSeq[Double](0).toArray
      ivfpqProbe(s.read.parquet(s"$dir/index"), served, q, nProbe = 2)
    })
  )

  /** A fitted IVF-PQ model: trained coarse centroids, trained residual
    * codebook (flat j·nCent + c layout), and the checkpointed
    * (vec_id, ed, cid, res) assignment relation the fit ran over. The
    * driver-side arrays are model artifacts (nCells×dim + m·nCent×subDim
    * doubles) — they ride into probe plans as literals. */
  final case class IvfPqModel(
      coarse: Array[Array[Double]], book: Array[Array[Double]],
      m: Int, subDim: Int, nCent: Int, assigned: DataFrame) {
    def dim: Int = m * subDim
    /** a vector off the checkpointed assignment (never re-executes the
      * upstream plan) */
    def vectorOf(vecId: Long): Array[Double] = {
      require(assigned != null,
        "vectorOf needs the fit's assignment relation; a model loaded " +
          "via ivfpqLoadModel serves probes only — fetch query vectors " +
          "from your own source")
      assigned.filter(col("vec_id") === vecId).select("ed").head().getSeq[Double](0).toArray
    }
  }

  /** Persist the fitted model BESIDE its stored index: a tiny parquet
    * relation of (kind, idx, vec) rows — "coarse" centroids, "book"
    * entries, and one "shape" row carrying (m, subDim, nCent). The model
    * is nCells×dim + m·nCent×subDim doubles (a few KB) — the index's
    * companion artifact, not data — and persisting it is what makes the
    * serve path COLD: a fresh process loads the model + probes the
    * stored codes without ever scanning, let alone re-training on, the
    * corpus. Doubles round-trip parquet bit-exactly, so a cold probe
    * equals the warm one (SimilaritySpec pins it). Works for BOTH fit
    * models and serving models loaded via [[ivfpqLoadModel]] (assigned =
    * null — model copy/migration): the rows written are centroids +
    * codebook + shape only, none of which need the assignment relation. */
  def ivfpqWriteModel(model: IvfPqModel, dir: String): Unit = {
    val s =
      if (model.assigned != null) model.assigned.sparkSession
      else SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
        .getOrElse(throw new IllegalStateException(
          "ivfpqWriteModel: model has no assignment relation (loaded via " +
            "ivfpqLoadModel) and no SparkSession is active on this thread or " +
            "registered as default — create/activate the session that should " +
            "own the write first"))
    import s.implicits._
    val rows =
      model.coarse.zipWithIndex.toSeq.map { case (v, i) => ("coarse", i, v.toSeq) } ++
        model.book.zipWithIndex.toSeq.map { case (v, i) => ("book", i, v.toSeq) } :+
        (("shape", 0,
          Seq(model.m.toDouble, model.subDim.toDouble, model.nCent.toDouble)))
    rows.toDF("kind", "idx", "vec").coalesce(1)
      .write.mode("overwrite").parquet(dir)
  }

  /** Load a serving model written by [[ivfpqWriteModel]]. The returned
    * model has NO assignment relation (`assigned = null`) — it encodes,
    * probes, and appends, but [[IvfPqModel.vectorOf]] and
    * [[ivfpqCodes]] (fit-side operations) refuse it. */
  def ivfpqLoadModel(spark: SparkSession, dir: String): IvfPqModel = {
    val rows = spark.read.parquet(dir).collect() // bounded: a model artifact
    def part(kind: String): Array[Array[Double]] = {
      val rs = rows.filter(_.getString(0) == kind).sortBy(_.getInt(1))
      // duplicate/holey idx values mean two overlapping writes landed in
      // the dir — the row-count requires below can't see duplicates the
      // shape row doesn't constrain (coarse nCells isn't in shape)
      require(rs.map(_.getInt(1)).toSeq == rs.indices.toSeq,
        s"model $dir: '$kind' rows are not a clean 0..${rs.length - 1} " +
          "index sequence — overlapping writes?")
      rs.map(_.getSeq[Double](2).toArray)
    }
    val shape = part("shape").head
    require(shape.length == 3, s"malformed model shape row in $dir")
    val (m, subDim, nCent) = (shape(0).toInt, shape(1).toInt, shape(2).toInt)
    val (coarse, book) = (part("coarse"), part("book"))
    // row/shape validation against the shape row: a corrupt or
    // doubly-written model dir (two overlapping mode-overwrite attempts)
    // would otherwise LOAD silently with duplicate centroid rows, and the
    // probe's cid filter would select wrong-or-no cells downstream —
    // fail here, loudly, like the shape require above
    require(coarse.nonEmpty && coarse.forall(_.length == m * subDim),
      s"model $dir: coarse centroids disagree with shape dim=${m * subDim}")
    require(book.length == m * nCent && book.forall(_.length == subDim),
      s"model $dir: ${book.length} codebook rows, expected m*nCent = ${m * nCent} of subDim=$subDim")
    IvfPqModel(coarse, book, m, subDim, nCent, assigned = null)
  }

  /** Train the IVF-PQ model: coarse quantizer (seeded Lloyd's), then one
    * narrow codegen pass assigning every vector + computing its residual
    * (native vec_sub against the literal centroid), localCheckpointed
    * ONCE — the joint residual-codebook training, the codes projection,
    * and any query-vector fetch all re-consume that relation; without
    * materializing it the scan+assign+residual pass re-executes per
    * consumer (the resolveClusters iterative-lineage rule). */
  def ivfpqFit(
      e: DataFrame, nCells: Int = 16, m: Int = 4, subDim: Int = 16,
      nCent: Int = 16): IvfPqModel = {
    GraftFunctions.register(e.sparkSession)
    val dim = m * subDim
    val coarse = graft.ops.KMeans.train(
      e, "ed", graft.ops.KMeans.seedById(e, "vec_id", "ed", nCells, dim), maxIters = 3)
    val coarseLit = typedLit(coarse.map(_.toSeq).toSeq)
    val assigned = e
      .withColumn("cid",
        element_at(call_udf("pq_encode", col("ed"), coarseLit, lit(dim), lit(nCells)), 1))
      .filter(col("cid").isNotNull)
      .withColumn("res",
        call_udf("vec_sub", col("ed"), element_at(coarseLit, col("cid") + 1)))
      .localCheckpoint()
    // ONE joint residual-codebook training over the checkpointed residuals
    val book = trainPqCodebook(
      assigned.select(col("vec_id"), col("res").as("ed")), m, subDim, nCent,
      inputCheckpointed = true)
    IvfPqModel(coarse, book, m, subDim, nCent, assigned)
  }

  /** The at-rest index relation: (vec_id, cid, codes) — 1 cell id + m
    * small codes per vector. Reads the fit's checkpoint (it cannot fuse
    * with the assignment pass — the codebook training in between consumes
    * the residuals first). */
  def ivfpqCodes(model: IvfPqModel): DataFrame = {
    require(model.assigned != null,
      "ivfpqCodes reads the fit's assignment; for vectors a loaded " +
        "serving model never saw, use ivfpqEncode")
    val bookLit = typedLit(model.book.map(_.toSeq).toSeq)
    model.assigned.select(col("vec_id"), col("cid"),
        call_udf("pq_encode", col("res"), bookLit, lit(model.subDim), lit(model.nCent)).as("codes"))
      .filter(col("codes").isNotNull)
  }

  /** IVF-PQ takedown twin of [[graft.ops.Hnsw.removeStored]]: the codes
    * relation is FLAT (no edges to repair), so a takedown is one
    * tombstone-pruned rewrite of the (vec_id, cid, codes) table,
    * published to the next version dir under the same generation
    * discipline. The filter rides the scan (no shuffle); cid
    * partitioning is preserved by the caller's partitionBy on write. */
  def ivfpqRemoveStored(codes: DataFrame, tombstones: Set[Long]): DataFrame =
    codes.filter(!col("vec_id").isin(tombstones.toSeq.map(Long.box): _*))

  /** Encode ANY (vec_id, ed) relation under a FROZEN model — nearest
    * EXISTING coarse cell (no retraining), residual via the native
    * `vec_sub` kernel, PQ codes against the frozen residual codebook.
    * The same single narrow codegen pass as the fit's assignment, but
    * over vectors the model never saw: this is how day-2 data enters an
    * existing index. A damaged row (wrong length / null slot) makes
    * `pq_encode` return NULL and is filtered out, never fatal — an
    * append job must not die on one bad vector. Agrees bit-for-bit with
    * [[ivfpqCodes]] on the fit's own corpus (same kernels, same
    * accumulation order; pinned in SimilaritySpec). */
  def ivfpqEncode(model: IvfPqModel, vecs: DataFrame): DataFrame = {
    GraftFunctions.register(vecs.sparkSession)
    val coarseLit = typedLit(model.coarse.map(_.toSeq).toSeq)
    val bookLit = typedLit(model.book.map(_.toSeq).toSeq)
    vecs
      .withColumn("cid", element_at(
        call_udf("pq_encode", col("ed"), coarseLit, lit(model.dim),
          lit(model.coarse.length)), 1))
      .filter(col("cid").isNotNull)
      .withColumn("res",
        call_udf("vec_sub", col("ed"), element_at(coarseLit, col("cid") + 1)))
      .select(col("vec_id"), col("cid"),
        call_udf("pq_encode", col("res"), bookLit, lit(model.subDim),
          lit(model.nCent)).as("codes"))
      .filter(col("codes").isNotNull)
  }

  /** Fold a day-2 vector batch into a STORED cid-partitioned index with
    * the model FROZEN: [[ivfpqEncode]] + parquet append. The new files
    * land INSIDE the existing cid= directories, so the partition layout —
    * and every probe's pruning — survives any number of appends, and no
    * already-stored file is rewritten. The IVF-PQ twin of
    * [[graft.ops.Dedup.appendToMinhashIndex]]: at 100 TB folding in a
    * day's crawl costs encode(batch) + append, not refit + rewrite of the
    * whole corpus. Centroid drift from accumulated appends is the
    * documented trade — periodic [[ivfpqFit]] rebuilds re-center, exactly
    * like the minhash index's periodic re-cap rebuild. */
  def ivfpqAppendToIndex(model: IvfPqModel, newVecs: DataFrame, dir: String): Unit =
    ivfpqEncode(model, newVecs)
      .write.mode("append").partitionBy("cid").parquet(dir)

  /** The append round trip behind the `sim_ann_ivfpq_append` driver key:
    * build + store the index from the base corpus, fold in a day-2 batch
    * (near-duplicate perturbations of every 17th base vector under fresh
    * ids — the planted twins) with the model frozen, then answer the
    * query from the stored table. Query 0's planted twin (vec_id
    * [[AppendIdOffset]]) must surface in the top-k: proof the appended
    * rows are probed through the same pruned path as the originals. */
  def ivfpqAppendTopK(
      e: DataFrame, queryId: Long, nProbe: Int, dir: String,
      nCells: Int = 16, m: Int = 4, subDim: Int = 16, nCent: Int = 16,
      k: Int = 10): DataFrame =
    ivfpqAppendTopKModel(
      ivfpqFit(e, nCells, m, subDim, nCent), e, queryId, nProbe, dir, k)

  /** [[ivfpqAppendTopK]] under an already-fitted (frozen) model */
  def ivfpqAppendTopKModel(
      model: IvfPqModel, e: DataFrame, queryId: Long, nProbe: Int,
      dir: String, k: Int = 10): DataFrame = {
    ivfpqCodes(model).write.mode("overwrite").partitionBy("cid").parquet(dir)
    ivfpqAppendToIndex(model, appendBatch(e), dir)
    ivfpqProbe(e.sparkSession.read.parquet(dir), model,
      model.vectorOf(queryId), nProbe, k)
  }

  /** fresh-id offset for the planted day-2 batch (outside every sf's
    * vec_id range) */
  val AppendIdOffset = 700000L

  /** obs_ann_recall's evaluation budget: the query sample is this many
    * rows REGARDLESS of corpus size (bottom-k by hash) — the knob an
    * operator turns per release, never a corpus fraction */
  val AnnRecallSampleK = 16

  /** the deterministic day-2 batch: every 17th base vector, nudged by
    * +0.001 per dimension (a near-duplicate — its twin stays its nearest
    * neighbor), under fresh ids. Tiny relation; the HOF lambda is fine
    * off the hot path. */
  def appendBatch(e: DataFrame): DataFrame =
    e.filter(col("vec_id") % 17 === 0)
      .select((col("vec_id") + AppendIdOffset).as("vec_id"),
        expr("transform(ed, x -> x + 0.001D)").as("ed"))

  /** ADC probe over an index relation (in-memory or read back from a
    * stored table): nProbe nearest cells by L2 from the query vector, one
    * driver-built ADC table per probed cell (the query's residual against
    * THAT cell's codebook), distances as m literal lookups behind a CASE
    * on the cell id. The `cid` filter is what partition-prunes a stored
    * cid-partitioned table down to nProbe directories. */
  def ivfpqProbe(
      codes: DataFrame, model: IvfPqModel, q: Array[Double],
      nProbe: Int, k: Int = 10): DataFrame = {
    val (m, subDim, nCent, dim) = (model.m, model.subDim, model.nCent, model.dim)
    val probes = model.coarse.zipWithIndex
      .map { case (c, i) => (VecAlg.l2DistArr(q, c), i) }
      .sortBy(identity).take(nProbe).map(_._2)
    def dtabFor(cid: Int): Array[Array[Double]] = {
      val res = Array.tabulate(dim)(i => q(i) - model.coarse(cid)(i))
      Array.tabulate(m) { j =>
        val sub = java.util.Arrays.copyOfRange(res, j * subDim, (j + 1) * subDim)
        Array.tabulate(nCent)(c => VecAlg.l2DistArr(sub, model.book(j * nCent + c)))
      }
    }
    def adistWith(dtab: Array[Array[Double]]) = (0 until m)
      .map(j => element_at(typedLit(dtab(j).toSeq), element_at(col("codes"), j + 1) + 1))
      .reduce(_ + _)
    val adist = probes.tail.foldLeft(
      when(col("cid") === probes.head, adistWith(dtabFor(probes.head)))) {
      (acc, cid) => acc.when(col("cid") === cid, adistWith(dtabFor(cid)))
    }
    codes.filter(col("cid").isin(probes.map(Int.box).toSeq: _*))
      .select(col("vec_id"), col("cid").cast("int").as("cid"),
        round(adist, 6).as("approx_dist"))
      .orderBy("approx_dist", "vec_id")
      .limit(k)
  }

  /** FILTERED IVF-PQ probe — the metadata-predicate search
    * (`sim_ann_hnsw_filtered`'s inverted-file twin): `codes` carries an
    * `allowed` boolean column (the predicate evaluated as a plain
    * Catalyst column on the vector relation — only a 1-bit flag rides
    * the cid layout), matching rows are filtered BEFORE the ranking,
    * and — the IVF analog of the filtered-HNSW frontier widening — the
    * probe visits ceil(nProbe × corpus/allowed) cells (capped at
    * nCells), so a 1%-selective predicate probes ~100× the cells and
    * recall doesn't collapse with selectivity. The widening factor is
    * an IN-PLAN broadcast 1-row aggregate (never a driver collect), and
    * the dynamic cell count rides `slice`'s length argument, so cell
    * ranking stays the batch probe's per-row expression (no shuffle on
    * the probe side). A null `allowed` is NOT matching, in both the
    * filter and the widening denominator. Under an all-true predicate
    * the widening is exactly nProbe and the result equals [[ivfpqProbe]]
    * bit-for-bit (same pq_adc accumulation order; SimilaritySpec pins
    * it). */
  def ivfpqProbeFiltered(
      codes: DataFrame, model: IvfPqModel, q: Array[Double],
      nProbe: Int, k: Int = 10): DataFrame = {
    GraftFunctions.register(codes.sparkSession)
    val nCells = model.coarse.length
    val cellsLit = typedLit(model.coarse.map(_.toSeq).toSeq)
    val bookLit = typedLit(model.book.map(_.toSeq).toSeq)
    val allowedCnt = sum(when(col("allowed"), 1L).otherwise(0L))
    val widen = codes.agg(
      least(lit(nCells).cast("long"),
        when(allowedCnt === 0L, lit(nCells).cast("long"))
          .otherwise(ceil(lit(nProbe) * count(lit(1)) / allowedCnt))).as("np"))
    val qcells = codes.sparkSession.range(1)
      .select(typedLit(q.toSeq).as("qed"))
      .crossJoin(broadcast(widen))
      .withColumn("cells", cellsLit)
      .select(col("qed"), posexplode(expr(
        s"""slice(array_sort(zip_with(
           |  transform(cells, cd -> l2_dist(qed, cd)),
           |  sequence(0, ${nCells - 1}),
           |  (d, i) -> struct(d AS cdist, i AS cid))), 1, CAST(np AS INT))""".stripMargin))
        .as(Seq("pos", "probe")))
      .select(col("probe.cid").as("cid"),
        call_udf("vec_sub", col("qed"),
          element_at(cellsLit, col("probe.cid") + 1)).as("qres"))
    codes.filter(col("allowed"))
      .join(broadcast(qcells), "cid")
      .withColumn("approx_dist", round(
        call_udf("pq_adc", col("qres"), col("codes"), bookLit, lit(model.nCent)), 6))
      .select(col("vec_id"), col("cid").cast("int").as("cid"), col("approx_dist"))
      .orderBy("approx_dist", "vec_id")
      .limit(k)
  }

  /** BATCHED IVF-PQ probe: a whole relation of query vectors answered in
    * ONE plan. [[ivfpqProbe]] serves a single query with a driver-built
    * literal ADC table (m lookups per candidate) — the right shape for
    * point lookups, but a query BATCH through it pays an
    * O(nQ·nProbe·m·nCent·subDim) driver loop plus one plan per query.
    * Here everything distributes: cell ranking is a PER-ROW expression
    * (nCells literal-centroid distances → array_sort of (cdist, cid)
    * structs → slice nProbe → explode; no shuffle, no window — the
    * corpus is never touched), residuals come from the native `vec_sub`
    * kernel, and scoring is the `pq_adc` codegen kernel computing the
    * same per-subspace l2 sum the ADC table holds, in the same
    * accumulation order (SimilaritySpec pins batch == single per query,
    * bit-for-bit). The probe relation joins the codes by BROADCAST on
    * cid, so the big side never shuffles — and against a stored
    * cid-partitioned index table ([[ivfpqIndexBatchTopK]]) that same
    * equi-join is what dynamic partition pruning keys on, so a batch
    * touching p distinct cells reads p of nCells directories
    * (SimilaritySpec pins the pruned count; keeping the build side
    * shuffle-free is what lets AQE reuse the join broadcast as the DPP
    * filter). Top-k per query is one partitioned window over candidates
    * already pruned to nProbe cells each. */
  def ivfpqBatchProbe(
      codes: DataFrame, model: IvfPqModel, queries: DataFrame,
      nProbe: Int, k: Int = 10): DataFrame = {
    GraftFunctions.register(codes.sparkSession)
    val cellsLit = typedLit(model.coarse.map(_.toSeq).toSeq)
    val bookLit = typedLit(model.book.map(_.toSeq).toSeq)
    // top-nProbe cells per query is a PER-ROW expression, not a window:
    // nCells distances into an array of (cdist, cid) structs, array_sort
    // (lexicographic — same (cdist, cid) tie-break as the single-probe
    // driver ranking), slice nProbe, explode. Zero shuffle — and the
    // broadcast build side stays shuffle-free, which is what lets AQE
    // re-use this exact broadcast as the stored table's dynamic
    // partition-pruning filter (a window here put a shuffle stage in the
    // build side and the runtime reuse match failed, silently degrading
    // the serve path to a full-index scan).
    val qcells = queries
      .withColumn("cells", cellsLit)
      .select(col("qid"), col("qed"), posexplode(expr(
        s"""slice(array_sort(zip_with(
           |  transform(cells, cd -> l2_dist(qed, cd)),
           |  sequence(0, ${model.coarse.length - 1}),
           |  (d, i) -> struct(d AS cdist, i AS cid))), 1, $nProbe)""".stripMargin))
        .as(Seq("pos", "probe")))
      .select(col("qid"), col("probe.cid").as("cid"),
        call_udf("vec_sub", col("qed"),
          element_at(cellsLit, col("probe.cid") + 1)).as("qres"))
    codes.join(broadcast(qcells), "cid")
      .withColumn("approx_dist", round(
        call_udf("pq_adc", col("qres"), col("codes"), bookLit, lit(model.nCent)), 6))
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("approx_dist"), col("vec_id"))))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id"), col("cid").cast("int").as("cid"),
        col("approx_dist"))
      .orderBy("qid", "approx_dist", "vec_id")
  }

  /** IVF-PQ probe, self-contained: fit + encode + probe in one query
    * (the index relation stays in memory). The write-once/probe-many
    * round trip lives in [[ivfpqIndexTopK]]. */
  def ivfpqTopK(
      e: DataFrame, queryId: Long, nProbe: Int,
      nCells: Int = 16, m: Int = 4, subDim: Int = 16, nCent: Int = 16,
      k: Int = 10): DataFrame =
    ivfpqTopKModel(ivfpqFit(e, nCells, m, subDim, nCent), queryId, nProbe, k)

  /** [[ivfpqTopK]] under an already-fitted model (the probe-only leg) */
  def ivfpqTopKModel(
      model: IvfPqModel, queryId: Long, nProbe: Int, k: Int = 10): DataFrame =
    ivfpqProbe(ivfpqCodes(model), model, model.vectorOf(queryId), nProbe, k)

  /** The MATERIALIZED index round trip (the actual 100 TB serving shape):
    * write the (vec_id, cid, codes) relation as a parquet table
    * PARTITIONED BY cid — at rest each vector costs 1 cell id + m small
    * codes — then answer the query from the stored table. The probe's
    * `cid IN (probes)` filter becomes a PARTITION filter on the read, so
    * a query touches nProbe of nCells directories and never scans the
    * rest; the write cost amortizes over every subsequent query
    * (precedent: join_bucketed_colocated's bucketed-fact-table shape).
    * SimilaritySpec pins both halves: stored-probe top-k == in-memory
    * top-k under the SAME model, and partitionCount <= nProbe on the
    * stored scan. */
  def ivfpqIndexTopK(
      e: DataFrame, queryId: Long, nProbe: Int, dir: String,
      nCells: Int = 16, m: Int = 4, subDim: Int = 16, nCent: Int = 16,
      k: Int = 10): DataFrame =
    ivfpqIndexTopKModel(
      ivfpqFit(e, nCells, m, subDim, nCent), queryId, nProbe, dir, k)

  /** [[ivfpqIndexTopK]] under an already-fitted model */
  def ivfpqIndexTopKModel(
      model: IvfPqModel, queryId: Long, nProbe: Int, dir: String,
      k: Int = 10): DataFrame = {
    ivfpqCodes(model)
      .write.mode("overwrite").partitionBy("cid").parquet(dir)
    val stored = model.assigned.sparkSession.read.parquet(dir)
    ivfpqProbe(stored, model, model.vectorOf(queryId), nProbe, k)
  }

  /** The full serving round trip: fit, write the (vec_id, cid, codes)
    * relation PARTITIONED BY cid, then answer a query BATCH from the
    * stored table through [[ivfpqBatchProbe]]. The probe side broadcasts
    * (nQ·nProbe rows), and the equi-join on `cid` — the partition
    * column — is exactly what DYNAMIC partition pruning keys on: Spark
    * reuses the broadcast to build a cid filter for the scan, so a batch
    * probing p distinct cells lists p of nCells directories, without the
    * driver ever collecting the probe list (the single-query path's
    * static `cid IN (...)` needs the cells known at plan time; a batch's
    * cells live in the data). At 100 TB this is the index's whole point:
    * query cost scales with nProbe/nCells of the corpus, write cost
    * amortizes over every batch. */
  def ivfpqIndexBatchTopK(
      e: DataFrame, queryIds: Seq[Long], nProbe: Int, dir: String,
      nCells: Int = 16, m: Int = 4, subDim: Int = 16, nCent: Int = 16,
      k: Int = 10): DataFrame =
    ivfpqIndexBatchTopKModel(
      ivfpqFit(e, nCells, m, subDim, nCent), queryIds, nProbe, dir, k)

  /** [[ivfpqIndexBatchTopK]] under an already-fitted model */
  def ivfpqIndexBatchTopKModel(
      model: IvfPqModel, queryIds: Seq[Long], nProbe: Int, dir: String,
      k: Int = 10): DataFrame = {
    ivfpqCodes(model)
      .write.mode("overwrite").partitionBy("cid").parquet(dir)
    val stored = model.assigned.sparkSession.read.parquet(dir)
    val queries = model.assigned
      .filter(col("vec_id").isin(queryIds.map(Long.box): _*))
      .select(col("vec_id").as("qid"), col("ed").as("qed"))
    ivfpqBatchProbe(stored, model, queries, nProbe, k)
  }

  /** per-subspace trained codebook in [[pqTopK]]'s flat layout
    * (j·nCent + c): all m codebooks train JOINTLY through the one Lloyd's
    * skeleton ([[graft.ops.KMeans.trainSubspaces]] — one pass per
    * iteration instead of m; the sequential per-subspace form cost m×
    * the scheduling latency and dominated the ivfpq bench line). Seeds
    * come from the first nCent VALID vectors (length == dim AND no null
    * slot) in id order, so a damaged row among the first nCent degrades
    * to the next valid one instead of failing the training — the same
    * policy as [[graft.ops.KMeans.seedById]] (the reserved-vector ORACLE
    * codebooks stay strict by-id on purpose). `inputCheckpointed = true`
    * skips the skeleton's own materialization when the caller already
    * localCheckpointed `e`. */
  def trainPqCodebook(
      e: DataFrame, m: Int = 4, subDim: Int = 16, nCent: Int = 16,
      maxIters: Int = 3, inputCheckpointed: Boolean = false): Array[Array[Double]] = {
    GraftFunctions.register(e.sparkSession)
    val dim = m * subDim
    val seedRows = e.filter(size(col("ed")) === dim)
      .filter(expr("!exists(ed, x -> x IS NULL)"))
      .orderBy("vec_id").limit(nCent).select("ed").collect()
    require(seedRows.length == nCent,
      s"need $nCent valid seed vectors, corpus has ${seedRows.length}")
    val seeds = new Array[Array[Double]](m * nCent)
    seedRows.zipWithIndex.foreach { case (r, cid) =>
      val v = r.getSeq[Double](0).toArray
      (0 until m).foreach(j =>
        seeds(j * nCent + cid) = java.util.Arrays.copyOfRange(v, j * subDim, (j + 1) * subDim))
    }
    graft.ops.KMeans.trainSubspaces(
      e, "ed", seeds, subDim, nCent, maxIters = maxIters,
      checkpointInput = !inputCheckpointed)
  }

  /** IVF assign + probe-`nProbe`-cells cosine top-k over embeddings
    * (reserved-vector codebook — the deterministic, DuckDB-oracled path;
    * the relational argmin shape is kept ON PURPOSE so the oracle can
    * mirror it, with the per-pair math in native kernels). */
  private def ivfTopK(embedded: DataFrame, nProbe: Int, k: Int = 10): DataFrame = {
    GraftFunctions.register(embedded.sparkSession)
    val e = embedded.select(col("vec_id"), col("ed"))
    val cents = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("ed").as("cd"))
    val sims = e.crossJoin(broadcast(cents))
      .withColumn("sim", call_udf("cosine_sim", col("ed"), col("cd")))
    val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("cid"))
    val assign = sims
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cid"))
    val qcells = sims.filter(col("vec_id") === 0)
      .orderBy(col("sim").desc, col("cid"))
      .limit(nProbe)
      .select(col("cid").as("qcid"))
    val q = e.filter(col("vec_id") === 0).select(col("ed").as("qd"))
    e.join(assign, "vec_id")
      .join(broadcast(qcells), col("cid") === col("qcid"))
      .crossJoin(broadcast(q))
      .withColumn("cos", call_udf("cosine_sim", col("ed"), col("qd")))
      .select(col("vec_id"), round(col("cos"), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** IVF probe over a trained codebook: assignment is ONE narrow
    * `pq_encode(ed, book, dim, k)` pass (no centroid join, no window); the
    * query's probe cells are picked driver-side from the k×dim codebook.
    * At 100 TB the assignment is what you materialize as a partition
    * column of the index table; the probe filter then prunes partitions. */
  def ivfTrainedTopK(
      e: DataFrame, cents: Array[Array[Double]], queryId: Long,
      nProbe: Int, k: Int = 10): DataFrame = {
    GraftFunctions.register(e.sparkSession)
    val dim = cents(0).length
    val bookLit = typedLit(cents.map(_.toSeq).toSeq)
    val q = e.filter(col("vec_id") === queryId).select("ed").head().getSeq[Double](0).toArray
    val probes = cents.zipWithIndex
      .map { case (c, i) => (VecAlg.l2DistArr(q, c), i) }
      .sortBy(identity).take(nProbe).map(_._2)
    // the query vector was just collected — ship it as a literal like the
    // codebook instead of a second scan + broadcast-join subquery
    val qd = typedLit(q.toSeq)
    // rows with NULL cid (malformed vectors) drop here too: NULL isin
    // evaluates to NULL and Filter discards it
    e.withColumn("cid",
        element_at(call_udf("pq_encode", col("ed"), bookLit, lit(dim), lit(cents.length)), 1))
      .filter(col("cid").isin(probes.map(Int.box).toSeq: _*))
      .withColumn("cos", call_udf("cosine_sim", col("ed"), qd))
      .select(col("vec_id"), col("cid"), round(col("cos"), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** PQ encode + ADC top-k over `(vec_id, ed: array<double>)`.
    *
    * Codebook per subspace = subvectors of the first `nCent` vectors by id
    * (deterministic stand-in for k-means; pass `codebook` to use trained
    * centroids — [[graft.ops.KMeans]]). The codebook and the query's ADC
    * distance table are collected ONCE on the driver (m·nCent·subDim
    * doubles — model-artifact scale) and ride the plan as literals, so the
    * whole query is: scan → `pq_encode` projection → m ADC lookups →
    * TakeOrderedAndProject. At scale the `codes` relation is what you
    * materialize as the index table: m bytes per vector instead of the
    * raw array; nothing on the scan side shuffles or joins.
    *
    * Round-3 shape (explode subspaces → broadcast-join centroids →
    * interpreted HOF distance → argmin window, with the dist subtree
    * consumed twice) is gone: the driver bench showed it 8–9× inflated
    * under CPU contention precisely because the hot loop was interpreted.
    */
  def pqTopK(
      e: DataFrame, queryId: Long,
      m: Int = 4, subDim: Int = 16, nCent: Int = 16, k: Int = 10,
      codebook: Option[Array[Array[Double]]] = None): DataFrame = {
    GraftFunctions.register(e.sparkSession)
    val book = codebook.getOrElse(reservedCodebook(e, m, subDim, nCent))
    require(book.length == m * nCent, s"codebook must hold m*nCent=${m * nCent} subvectors")
    val q = e.filter(col("vec_id") === queryId).select("ed").head().getSeq[Double](0).toArray
    // ADC table: dtab(j)(c) = l2(q's subvector j, centroid c of subspace j),
    // computed with the same accumulation order as the pq_encode kernel
    val dtab = Array.tabulate(m) { j =>
      val qSub = java.util.Arrays.copyOfRange(q, j * subDim, (j + 1) * subDim)
      Array.tabulate(nCent)(c => VecAlg.l2DistArr(qSub, book(j * nCent + c)))
    }
    val bookLit = typedLit(book.map(_.toSeq).toSeq)
    // rows that don't tile the codebook encode to NULL — drop them (an
    // ascending orderBy would otherwise surface them FIRST)
    val codes = e.select(col("vec_id"),
      call_udf("pq_encode", col("ed"), bookLit, lit(subDim), lit(nCent)).as("codes"))
      .filter(col("codes").isNotNull)
    val adist = (0 until m)
      .map(j => element_at(typedLit(dtab(j).toSeq), element_at(col("codes"), j + 1) + 1))
      .reduce(_ + _)
    codes.select(col("vec_id"), round(adist, 6).as("approx_dist"))
      .orderBy("approx_dist", "vec_id")
      .limit(k)
  }

  /** reserved-vector codebook: subvector j of vector `cid` (< nCent) at
    * flat index j*nCent + cid — tiny driver collect (nCent rows), the same
    * convention the DuckDB oracle re-derives relationally */
  private def reservedCodebook(
      e: DataFrame, m: Int, subDim: Int, nCent: Int): Array[Array[Double]] = {
    val rows = e.filter(col("vec_id") < nCent)
      .select(col("vec_id"), col("ed")).orderBy("vec_id").collect()
    require(rows.length == nCent, s"expected $nCent codebook vectors, got ${rows.length}")
    val book = new Array[Array[Double]](m * nCent)
    rows.zipWithIndex.foreach { case (r, cid) =>
      val v = r.getSeq[Double](1).toArray
      (0 until m).foreach(j =>
        book(j * nCent + cid) = java.util.Arrays.copyOfRange(v, j * subDim, (j + 1) * subDim))
    }
    book
  }

  /** deterministic pseudo-random hyperplanes (seeded; same across runs).
    * THE Gaussian plane generator — Graph.knnGraph's per-table families
    * delegate here with per-table seeds. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 20260812L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  override def oracleSql: Map[String, String] = Map(
    // same sign-bit packing into two 32-bit words, same XOR popcount
    "sim_ann_binary_quant" ->
      ("WITH b AS (SELECT vec_id, " +
        "CAST(sum(CASE WHEN i < 32 AND embedding[i + 1] > 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS h1, " +
        "CAST(sum(CASE WHEN i >= 32 AND embedding[i + 1] > 0 THEN (1::BIGINT << (i - 32)) ELSE 0 END) AS BIGINT) AS h2 " +
        "FROM embeddings, generate_series(0, 63) g(i) GROUP BY vec_id), " +
        "q AS (SELECT h1 AS q1, h2 AS q2 FROM b WHERE vec_id = 0) " +
        "SELECT vec_id, CAST(bit_count(xor(h1, q1)) + bit_count(xor(h2, q2)) AS INT) AS ham " +
        "FROM b, q ORDER BY ham, vec_id LIMIT 10"),
    "emb_normalize" ->
      ("SELECT vec_id, round(nrm, 6) AS nrm, round(embedding[1]::DOUBLE / nrm, 6) AS u0, " +
        "round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> (x / nrm) * (x / nrm)))), 6) AS unit_norm " +
        "FROM (SELECT vec_id, embedding, " +
        "sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm FROM embeddings) " +
        "ORDER BY vec_id"),
    // float→double casts are exact and min/max are order-insensitive, so
    // the quantized codes match Spark's bit-for-bit; the ,-joined string
    // keeps the hash compare shape-stable
    "emb_quantize_int8" ->
      ("WITH ex0 AS (SELECT vec_id, unnest(list_transform(embedding, (x, i) -> {'i': i, 'v': x})) AS u " +
        "FROM embeddings), " +
        "ex AS (SELECT vec_id, u.i AS i, u.v::DOUBLE AS v FROM ex0), " +
        "st AS (SELECT i, min(v) AS mn, max(v) AS mx FROM ex GROUP BY i) " +
        "SELECT vec_id, string_agg(CAST(CAST(CASE WHEN mx = mn THEN 0 " +
        "ELSE round((v - mn) * 255.0 / (mx - mn)) - 128 END AS INT) AS VARCHAR), " +
        "',' ORDER BY i) AS qvec " +
        "FROM ex JOIN st USING (i) GROUP BY vec_id ORDER BY vec_id"),
    "sim_ann_ivf_multiprobe" ->
      ("WITH cents AS (SELECT vec_id AS cid, embedding AS cd FROM embeddings WHERE vec_id < 16), " +
        "sims AS (SELECT e.vec_id, c.cid, " +
        "list_cosine_similarity(e.embedding::DOUBLE[], c.cd::DOUBLE[]) AS sim FROM embeddings e, cents c), " +
        "assign AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, " +
        "row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn FROM sims) WHERE rn = 1), " +
        "qcells AS (SELECT cid FROM sims WHERE vec_id = 0 ORDER BY sim DESC, cid LIMIT 2) " +
        "SELECT e.vec_id, round(list_cosine_similarity(e.embedding::DOUBLE[], " +
        "(SELECT embedding FROM embeddings WHERE vec_id = 0)::DOUBLE[]), 6) AS cos " +
        "FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id JOIN qcells q ON a.cid = q.cid " +
        "ORDER BY cos DESC, e.vec_id LIMIT 10"),
    "sim_ann_ivf" ->
      ("WITH cents AS (SELECT vec_id AS cid, embedding AS cd FROM embeddings WHERE vec_id < 16), " +
        "sims AS (SELECT e.vec_id, c.cid, " +
        "list_cosine_similarity(e.embedding::DOUBLE[], c.cd::DOUBLE[]) AS sim FROM embeddings e, cents c), " +
        "assign AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, " +
        "row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn FROM sims) WHERE rn = 1), " +
        "qcell AS (SELECT cid FROM assign WHERE vec_id = 0) " +
        "SELECT e.vec_id, round(list_cosine_similarity(e.embedding::DOUBLE[], " +
        "(SELECT embedding FROM embeddings WHERE vec_id = 0)::DOUBLE[]), 6) AS cos " +
        "FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id JOIN qcell q ON a.cid = q.cid " +
        "ORDER BY cos DESC, e.vec_id LIMIT 10"),
    "sim_ann_pq_rerank" ->
      ("WITH sub AS (SELECT vec_id, j, list_slice(embedding, j*16+1, j*16+16)::DOUBLE[] AS sub " +
        "FROM embeddings, (SELECT unnest(generate_series(0, 3)) AS j)), " +
        "cent AS (SELECT vec_id AS cid, j AS cj, sub AS csub FROM sub WHERE vec_id < 16), " +
        "dist AS (SELECT s.vec_id, s.j, c.cid, list_distance(s.sub, c.csub) AS dist " +
        "FROM sub s JOIN cent c ON s.j = c.cj), " +
        "codes AS (SELECT vec_id, j, cid AS code FROM (SELECT vec_id, j, cid, " +
        "row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, cid) AS rn FROM dist) WHERE rn = 1), " +
        "dtab AS (SELECT j AS dj, cid AS dcid, dist AS qdist FROM dist WHERE vec_id = 0), " +
        // rank-50 cut must compare the SAME value Spark ranks on — pqTopK
        // orders by the ROUNDED distance, so a near-tie at the boundary
        // would otherwise pick different candidates per engine
        "cand AS (SELECT vec_id FROM (SELECT vec_id, sum(qdist) AS adist " +
        "FROM codes JOIN dtab ON codes.j = dtab.dj AND codes.code = dtab.dcid " +
        "GROUP BY vec_id ORDER BY round(adist, 6), vec_id LIMIT 50)) " +
        "SELECT e.vec_id, round(list_cosine_similarity(e.embedding::DOUBLE[], " +
        "(SELECT embedding FROM embeddings WHERE vec_id = 0)::DOUBLE[]), 6) AS cos " +
        "FROM embeddings e JOIN cand USING (vec_id) " +
        "ORDER BY cos DESC, e.vec_id LIMIT 10"),
    "sim_ann_pq" ->
      ("WITH sub AS (SELECT vec_id, j, list_slice(embedding, j*16+1, j*16+16)::DOUBLE[] AS sub " +
        "FROM embeddings, (SELECT unnest(generate_series(0, 3)) AS j)), " +
        "cent AS (SELECT vec_id AS cid, j AS cj, sub AS csub FROM sub WHERE vec_id < 16), " +
        "dist AS (SELECT s.vec_id, s.j, c.cid, list_distance(s.sub, c.csub) AS dist " +
        "FROM sub s JOIN cent c ON s.j = c.cj), " +
        "codes AS (SELECT vec_id, j, cid AS code FROM (SELECT vec_id, j, cid, " +
        "row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, cid) AS rn FROM dist) WHERE rn = 1), " +
        "dtab AS (SELECT j AS dj, cid AS dcid, dist AS qdist FROM dist WHERE vec_id = 0) " +
        "SELECT vec_id, round(sum(qdist), 6) AS approx_dist " +
        "FROM codes JOIN dtab ON codes.j = dtab.dj AND codes.code = dtab.dcid " +
        "GROUP BY vec_id ORDER BY approx_dist, vec_id LIMIT 10"),
    "dedup_embedding_cos" ->
      ("SELECT a.vec_id - 1 AS vec_id, " +
        "round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos, " +
        "round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) > 0.95 AS near_dup " +
        "FROM embeddings a JOIN embeddings b ON a.vec_id = b.vec_id + 1 ORDER BY vec_id")
  )
}
