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
  *  - [[train]] — distributed batch-gradient logistic regression with
  *    RMS feature scaling and heavy-ball momentum: the feature table is
  *    co-partitioned/sorted by doc once, then every iteration is ONE
  *    single-stage mapPartitions + reduce (the MLlib GradientDescent
  *    shape — no shuffle, no plan rebuild); the model is a D-element
  *    driver array (the KMeans artifact precedent, D=128). Verified by
  *    property: the learned model recovers a planted linear labeling
  *    rule on held-out docs (ClassifierSpec).
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
    * Σ_b k_b·cnt_ib / (10·n_i), emitted as the INTEGER `logit_ppm` =
    * round(logit·10⁶). The numerator is a pure integer sum (exact,
    * accumulation-order-free) and the ppm rounding happens on an exact
    * double product — a fractional-decimal round(x, 6) is NOT safe here:
    * num/(10n) has terminating decimal expansions whenever n is a power
    * of two (e.g. 41/640 = 0.0640625), and on those exact half-boundaries
    * Spark's BigDecimal HALF_UP and DuckDB's multiply-then-round disagree
    * (bitten at sf0.1). round() to an integer on the SAME exact double is
    * half-away-from-zero in both engines. No exp() anywhere. */
  def inferLiteral(docs: DataFrame): DataFrame = {
    val ks = array((0 until D).map(b => lit(literalK(b))): _*)
    features(docs)
      .groupBy("doc_id")
      .agg(
        sum(element_at(ks, col("bucket") + 1).cast("long") * col("cnt")).as("num"),
        sum(col("cnt")).as("n"))
      .select(col("doc_id"),
        round(col("num").cast("double") * lit(100000.0) / col("n").cast("double"))
          .cast("long").as("logit_ppm"),
        (col("num") >= 0).as("pred"))
  }

  /** Batch-GD logistic regression over `(doc_id, bucket, cnt)` features
    * and `(doc_id, y)` labels (y ∈ {0,1}); returns the D-element weight
    * array. Feature values are RAW counts (linear rules over counts —
    * the usual weak-supervision form — then converge in tens of
    * iterations; a /n normalization shrinks every gradient by ~|doc|
    * and stalls batch GD at this iteration budget). */
  def train(feats: DataFrame, labels: DataFrame, iters: Int = 40, lr: Double = 0.7)
      : Array[Double] = {
    val spark = feats.sparkSession
    import spark.implicits._
    // ONE materialization: the feature/label join, hash-partitioned on
    // doc_id (co-locates every doc's rows) and sorted (makes them
    // contiguous for the partition passes below), persisted as a typed
    // RDD. Everything downstream — the scaling pass and every GD
    // iteration — is a single-stage mapPartitions + reduce over it (the
    // MLlib GradientDescent shape: no shuffle, no plan rebuild, no
    // leaked checkpoint blocks; per-iteration cost is pure compute).
    val data = feats.join(labels, "doc_id")
      .select(col("doc_id"), col("bucket"),
        col("cnt").cast("double").as("x"), col("y").cast("double"))
      .repartition(col("doc_id"))
      .sortWithinPartitions("doc_id")
      .as[(Long, Int, Double, Double)].rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    require(data.count() > 0, // materialize once
      "Classifier.train: empty training set (no doc_ids overlap the features?)")
    val nDocs = labels.count().toDouble
    // per-bucket RMS scaling (computed ONCE, D doubles to the driver):
    // column scales differ by orders of magnitude between hot and rare
    // buckets, and unconditioned batch GD crawls on that ellipse
    val s = {
      val (sq, n) = data.mapPartitions { rows =>
        val sq = new Array[Double](D)
        val n = new Array[Long](D)
        rows.foreach { case (_, b, x, _) => sq(b) += x * x; n(b) += 1 }
        Iterator.single((sq, n))
      }.reduce { (a, b) =>
        var i = 0
        while (i < D) { a._1(i) += b._1(i); a._2(i) += b._2(i); i += 1 }
        a
      }
      Array.tabulate(D)(b => if (n(b) > 0 && sq(b) > 0) math.sqrt(sq(b) / n(b)) else 1.0)
    }
    val w = new Array[Double](D)
    val v = new Array[Double](D) // heavy-ball momentum state
    var it = 0
    while (it < iters) {
      val wl = w.clone() // ~1 KB closure per job
      val sl = s
      val grad = data.mapPartitions { rows =>
        val g = new Array[Double](D)
        val bs = new scala.collection.mutable.ArrayBuffer[Int](64)
        val xs = new scala.collection.mutable.ArrayBuffer[Double](64)
        var curDoc = Long.MinValue
        var y = 0.0
        var z = 0.0
        def flush(): Unit = if (bs.nonEmpty) {
          val r = 1.0 / (1.0 + math.exp(-z)) - y
          var i = 0
          while (i < bs.length) { g(bs(i)) += r * xs(i); i += 1 }
          bs.clear(); xs.clear(); z = 0.0
        }
        rows.foreach { case (doc, b, x, yy) =>
          if (doc != curDoc) { flush(); curDoc = doc; y = yy }
          val xsc = x / sl(b) // scaled feature
          z += wl(b) * xsc; bs += b; xs += xsc
        }
        flush()
        Iterator.single(g)
      }.reduce { (a, b) => var i = 0; while (i < D) { a(i) += b(i); i += 1 }; a }
      var b = 0
      while (b < D) {
        v(b) = 0.9 * v(b) + grad(b) / nDocs
        w(b) -= lr * v(b)
        b += 1
      }
      it += 1
    }
    data.unpersist(blocking = false)
    // fold the scaling back so the returned weights apply to RAW counts
    (0 until D).foreach(b => w(b) /= s(b))
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
