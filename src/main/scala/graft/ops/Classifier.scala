package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-feature text quality classifier — the fasttext/CCNet-style
  * linear model every production training-data pipeline runs to score
  * documents against a curated reference (quality filtering is rule
  * heuristics + a LEARNED classifier, not heuristics alone). Features
  * are the hashing trick over word unigrams: bucket = md5(token) mod D
  * (the engine-portable md5 idiom, NOT Murmur3 `hash()`, so DuckDB can
  * replay the featurization exactly); x_b = raw count_b ([[train]]/
  * [[infer]]) or count_b/n normalized once at the end ([[inferLiteral]]).
  *
  * Two entry points with two verification routes:
  *  - [[inferLiteral]] — scoring under a FIXED rational weight vector
  *    (w_b = k_b/10, k integer): the logit is an exact INTEGER sum
  *    divided once, so it is order-free and DuckDB-oracle-able to the
  *    last bit. This pins the featurize+score plumbing.
  *  - [[train]] — distributed batch-gradient logistic regression: per
  *    iteration ONE pass over the cached feature table (two bounded
  *    shuffles: per-doc margin agg, per-bucket gradient agg); the model
  *    is a D-element driver array (the KMeans artifact precedent, D=128)
  *    broadcast back as a plan literal. Verified by property: the
  *    learned model recovers a planted linear labeling rule on held-out
  *    docs (ClassifierSpec).
  *
  * Scale: training cost is iters × corpus passes — at 100 TB you train
  * on a SAMPLE (fasttext trains on GBs, not the corpus; compose with
  * sample_fraction) and [[infer]]/[[inferLiteral]] score the full corpus
  * map-side + one per-doc agg. Nothing driver-sized except the D-array.
  */
object Classifier {

  /** feature dimensionality (buckets) */
  val D = 128

  /** engine-portable hashed bucket in [0, D): first 4 md5 hex chars. */
  def bucket(tok: Column): Column =
    (conv(substring(md5(tok), 1, 4), 16, 10).cast("long") % D).cast("int")

  /** `(doc_id, bucket, cnt)` hashed unigram counts. */
  def features(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(Dedup.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), bucket(col("tok")).as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** the fixed literal weight NUMERATORS k_b (w_b = k_b / 10): integers
    * in [-10, 10], deterministic in b — exactly representable in both
    * engines. */
  def literalK(b: Int): Int = ((b * 37 + 11) % 21) - 10

  /** Oracled scoring under the literal model: logit_i =
    * Σ_b k_b·cnt_ib / (10·n_i). The numerator is a pure integer sum
    * (exact, accumulation-order-free); ONE double division at the end;
    * pred = logit >= 0. No exp() anywhere — libm ULP differences between
    * engines cannot flip a rounding boundary. */
  def inferLiteral(docs: DataFrame): DataFrame = {
    val ks = array((0 until D).map(b => lit(literalK(b))): _*)
    features(docs)
      .groupBy("doc_id")
      .agg(
        sum(element_at(ks, col("bucket") + 1).cast("long") * col("cnt")).as("num"),
        sum(col("cnt")).as("n"))
      .select(col("doc_id"),
        round(col("num").cast("double") / (col("n") * 10).cast("double"), 6).as("logit"),
        (col("num") >= 0).as("pred"))
  }

  /** Batch-GD logistic regression over `(doc_id, bucket, cnt)` features
    * and `(doc_id, y)` labels (y ∈ {0,1}); returns the D-element weight
    * array. Feature values are RAW counts (linear rules over counts —
    * the usual weak-supervision form — then converge in tens of
    * iterations; a /n normalization shrinks every gradient by ~|doc|
    * and stalls batch GD at this iteration budget). */
  def train(feats: DataFrame, labels: DataFrame, iters: Int = 100, lr: Double = 0.7)
      : Array[Double] = {
    val spark = feats.sparkSession
    // cache the joined feature/label table once; every iteration reuses it
    val f = feats.join(labels, "doc_id")
      .select(col("doc_id"), col("bucket"),
        col("cnt").cast("double").as("x"), col("y").cast("double"))
      .localCheckpoint() // truncate lineage; iterations build on literals
    val nDocs = labels.count().toDouble
    val w = new Array[Double](D)
    var it = 0
    while (it < iters) {
      val wlit = array(w.map(lit): _*)
      // per-doc margin -> residual (sigmoid(z) - y), weighted back onto
      // each doc's features, per-bucket mean gradient
      val resid = f.groupBy("doc_id")
        .agg(sum(element_at(wlit, col("bucket") + 1) * col("x")).as("z"),
          first("y").as("y"))
        .select(col("doc_id"),
          (lit(1.0) / (lit(1.0) + exp(-col("z"))) - col("y")).as("r"))
      val grad = f.join(resid, "doc_id")
        .groupBy("bucket").agg(sum(col("r") * col("x")).as("g"))
        .collect() // D rows — the model artifact, never data-sized
      grad.foreach { row =>
        w(row.getInt(0)) -= lr * row.getDouble(1) / nDocs
      }
      it += 1
    }
    w
  }

  /** Score `docs` under a trained weight array: (doc_id, score, pred).
    * Same raw-count feature convention as [[train]]. */
  def infer(docs: DataFrame, w: Array[Double]): DataFrame = {
    val wlit = array(w.map(lit): _*)
    features(docs)
      .groupBy("doc_id")
      .agg(sum(element_at(wlit, col("bucket") + 1) * col("cnt")).as("score"))
      .select(col("doc_id"), col("score"), (col("score") >= 0).as("pred"))
  }
}
