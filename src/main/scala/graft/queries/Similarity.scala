package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.10 similarity / fuzzy-dedup extensions beyond the Llm module:
  * embedding normalization, embedding-cosine near-dup, SimHash content
  * fingerprints, and LSH-bucketed approximate nearest neighbors.
  *
  * Scale notes (100 TB):
  *  - `sim_ann_lsh` prunes the candidate set to one hyperplane-sign bucket
  *    (expected N/2^bits vectors) before scoring — the scale path over
  *    `sim_cosine_topk`'s full scan; buckets are an equi-shuffle key.
  *  - `dedup_simhash` reduces each doc to 64 bits; near-dup candidates at
  *    scale pair up via band equi-joins on simhash prefixes, never a cross
  *    join (same banding idea as minhash-LSH).
  *  - All per-row math is codegen'd higher-order functions over the
  *    embedding arrays; no UDFs in the hot path.
  */
object Similarity extends QueryModule {

  private def dotD(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
  private def normD(a: String): String =
    s"sqrt(aggregate($a, 0D, (acc, v) -> acc + v * v))"

  /** embeddings with a double-cast copy of the vector */
  private def emb(s: SparkSession, d: String): DataFrame =
    Tables.t(s, d, "embeddings")
      .withColumn("ed", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))

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

    // embedding-cosine near-dup over consecutive vec_id pairs
    "dedup_embedding_cos" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id"), col("ed"))
      val a = e.select(col("vec_id"), col("ed").as("ea"))
      val b = e.select((col("vec_id") - 1).as("vec_id"), col("ed").as("eb"))
      a.join(b, "vec_id")
        .withColumn("cos", expr(
          s"${dotD("ea", "eb")} / (${normD("ea")} * ${normD("eb")})"))
        .select(col("vec_id"), round(col("cos"), 6).as("cos"),
          (col("cos") > 0.95).as("near_dup"))
        .orderBy("vec_id")
    }),

    // 64-bit SimHash over token hashes (oracle-exempt: xxhash64 is
    // engine-specific; SimilaritySpec asserts near-dups land close in
    // Hamming distance, far pairs far, and that this codegen-kernel path
    // equals the composed explode+agg reference bit-for-bit)
    "dedup_simhash" -> ((s, d) =>
      graft.ops.Dedup.simhash64Native(Tables.t(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    // banded SimHash candidate pairs over a corpus with planted near-dups
    // (oracle-exempt; SimilaritySpec asserts the planted pairs appear)
    "dedup_simhash_pairs" -> ((s, d) => {
      val nearDup = Tables.t(s, d, "documents")
        .filter(col("doc_id") % 11 === 0)
        .withColumn("doc_id", col("doc_id") + 300000L)
        .withColumn("text", expr("substring(text, instr(text, ' ') + 1)"))
      val corpus = Tables.t(s, d, "documents").unionByName(nearDup)
      graft.ops.Dedup.simhashCandidates(
          graft.ops.Dedup.simhash64Native(corpus, "doc_id", "text"), bands = 4)
        .orderBy("a", "b")
    }),

    // ANN: 8 hyperplane sign bits -> bucket; score only the query's bucket
    "sim_ann_lsh" -> ((s, d) => {
      val planes = hyperplanes(8, 64)
      val planesCol = typedLit(planes)
      val e = emb(s, d)
        .withColumn("planes", planesCol)
        .withColumn("bucket", expr(
          "aggregate(transform(planes, (p, i) -> " +
            "IF(aggregate(zip_with(ed, p, (x, y) -> x * y), 0D, (acc, v) -> acc + v) > 0, " +
            "shiftleft(1, i), 0)), 0, (acc, v) -> acc + v)"))
        .drop("planes")
      val q = e.filter(col("vec_id") === 0)
        .select(col("ed").as("qd"), col("bucket").as("qbucket"))
      e.join(broadcast(q), col("bucket") === col("qbucket"))
        .withColumn("cos", expr(
          s"${dotD("ed", "qd")} / (${normD("ed")} * ${normD("qd")})"))
        .select(col("vec_id"), col("bucket"), round(col("cos"), 6).as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10)
    }),

    // Product-quantization ANN (the classic 100-TB-scale path: vectors
    // compress to m small codes, the scan touches codes only). m=4
    // subspaces × 16 dims; codebook per subspace = subvectors of the first
    // 16 embeddings (deterministic stand-in for k-means, same convention
    // as sim_ann_ivf). Encode = argmin centroid per (vector, subspace) —
    // a 64× storage reduction (256 B float vector → 4 one-byte codes).
    // Query = ADC: the 4×16 query→centroid distance table is broadcast and
    // the approximate distance is a sum of table lookups per code — no
    // full-vector math on the scan side. Fully relational and
    // DuckDB-oracled (everything is deterministic). Shared kernel in
    // [[pqTopK]]; SimilaritySpec plants near-duplicates to pin recall.
    "sim_ann_pq" -> ((s, d) =>
      pqTopK(emb(s, d).select(col("vec_id"), col("ed")), queryId = 0L)),

    // Two-stage ANN (the production shape): PQ/ADC narrows to 50
    // candidates from codes alone, then ONLY those 50 touch their full
    // vectors for an exact cosine re-rank. At 100 TB the exact pass costs
    // candidates × dim regardless of corpus size — the re-rank join is a
    // broadcast of 50 ids into the embedding scan.
    "sim_ann_pq_rerank" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id"), col("ed"))
      val cand = pqTopK(e, queryId = 0L, k = 50).select("vec_id")
      val q = e.filter(col("vec_id") === 0).select(col("ed").as("qd"))
      e.join(broadcast(cand), "vec_id")
        .crossJoin(broadcast(q))
        .withColumn("cos", expr(
          s"${dotD("ed", "qd")} / (${normD("ed")} * ${normD("qd")})"))
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
    "sim_ann_ivf_multiprobe" -> ((s, d) => ivfTopK(emb(s, d), nProbe = 2))
  )

  /** IVF assign + probe-`nProbe`-cells cosine top-k over embeddings. */
  private def ivfTopK(embedded: DataFrame, nProbe: Int, k: Int = 10): DataFrame = {
    val e = embedded.select(col("vec_id"), col("ed"))
    val cents = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("ed").as("cd"))
    val sims = e.crossJoin(broadcast(cents))
      .withColumn("sim", expr(
        s"${dotD("ed", "cd")} / (${normD("ed")} * ${normD("cd")})"))
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
      .withColumn("cos", expr(
        s"${dotD("ed", "qd")} / (${normD("ed")} * ${normD("qd")})"))
      .select(col("vec_id"), round(col("cos"), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** PQ encode + ADC top-k over `(vec_id, ed: array<double>)`. Codebook
    * per subspace = subvectors of the first `nCent` vectors by id (a
    * deterministic stand-in for k-means — swap in trained centroids by
    * prepending them with reserved ids). At scale the `codes` relation is
    * what you materialize as the index table: m bytes per vector instead
    * of the raw array; the centroid join and the query's ADC distance
    * table both broadcast (tiny), so the scan side never shuffles. */
  def pqTopK(
      e: DataFrame, queryId: Long,
      m: Int = 4, subDim: Int = 16, nCent: Int = 16, k: Int = 10): DataFrame = {
    val sub = e
      .select(col("vec_id"), explode(sequence(lit(0), lit(m - 1))).as("j"), col("ed"))
      .withColumn("sub", expr(s"slice(ed, j * $subDim + 1, $subDim)"))
      .select("vec_id", "j", "sub")
    val cent = sub.filter(col("vec_id") < nCent)
      .select(col("vec_id").as("cid"), col("j").as("cj"), col("sub").as("csub"))
    val dist = sub.join(broadcast(cent), col("j") === col("cj"))
      .withColumn("dist", expr(
        "sqrt(aggregate(zip_with(sub, csub, (x, y) -> (x - y) * (x - y)), 0D, (acc, v) -> acc + v))"))
      .select("vec_id", "j", "cid", "dist")
    val wmin = Window.partitionBy("vec_id", "j").orderBy(col("dist").asc, col("cid").asc)
    val codes = dist
      .withColumn("rn", row_number().over(wmin)).filter(col("rn") === 1)
      .select(col("vec_id"), col("j"), col("cid").as("code"))
    val dtab = dist.filter(col("vec_id") === queryId) // the query's distance table
      .select(col("j").as("dj"), col("cid").as("dcid"), col("dist").as("qdist"))
    codes.join(broadcast(dtab), col("j") === col("dj") && col("code") === col("dcid"))
      .groupBy("vec_id").agg(sum("qdist").as("adist"))
      .select(col("vec_id"), round(col("adist"), 6).as("approx_dist"))
      .orderBy("approx_dist", "vec_id")
      .limit(k)
  }

  /** deterministic pseudo-random hyperplanes (seeded; same across runs) */
  def hyperplanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(20260812L)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  override def oracleSql: Map[String, String] = Map(
    "emb_normalize" ->
      ("SELECT vec_id, round(nrm, 6) AS nrm, round(embedding[1]::DOUBLE / nrm, 6) AS u0, " +
        "round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> (x / nrm) * (x / nrm)))), 6) AS unit_norm " +
        "FROM (SELECT vec_id, embedding, " +
        "sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm FROM embeddings) " +
        "ORDER BY vec_id"),
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
        "list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0.95 AS near_dup " +
        "FROM embeddings a JOIN embeddings b ON a.vec_id = b.vec_id + 1 ORDER BY vec_id")
  )
}
