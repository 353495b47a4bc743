package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained language identification — char-n-gram Naive Bayes over hashed
  * buckets (the CLD/fasttext-langid family's model shape: character
  * n-grams are THE language signal, robust to domain and tokenization,
  * and hashing keeps the feature space fixed). Complements the
  * `text_lang_id` stopword heuristic with the learned path a production
  * pipeline actually ships.
  *
  * Train ([[train]]): explode char trigrams over a LABELED corpus,
  * bucket = xxhash64 mod D, one (lang, bucket) count aggregation —
  * a single shuffle whose key space is nLangs×D regardless of corpus
  * size — plus a per-lang doc-count prior. The model is a driver-side
  * artifact (nLangs×D doubles, the KMeans/Classifier precedent) of
  * add-one-smoothed log-likelihoods log((c+1)/(tot+D)).
  *
  * Score ([[infer]]): fully MAP-SIDE — the model rides the plan as
  * per-language literal arrays; each doc folds its trigrams through one
  * `aggregate` HOF per language (bucket lookup + running sum), and the
  * argmax is an `array_max` over (score, lang) structs. No join, no
  * explode, no shuffle except the caller's output sort: the 100 TB
  * scoring pass costs one scan.
  *
  * Oracle-exempt by the established classifier convention (trained
  * model; libm `log` + float accumulation): ClassifierSpec pins
  * planted-language recovery on held-out docs.
  */
object LangId {

  /** hashed char-trigram buckets */
  val D = 256

  /** trained model: language names (sorted), per-language log-prior, and
    * per-language D-array of smoothed log-likelihoods */
  final case class Model(langs: Array[String], logPrior: Array[Double],
      logLik: Array[Array[Double]])

  /** char trigrams of the lowercased text, as an array column */
  private[graft] def trigrams(t: Column): Column =
    when(length(t) >= 3,
      transform(sequence(lit(1), length(t) - 2), i => t.substr(i, lit(3))))
      .otherwise(array().cast("array<string>"))

  private def bucketOf(tri: Column): Column =
    pmod(xxhash64(tri), lit(D.toLong)).cast("int")

  /** Train on (lang, text): one nLangs×D-key count aggregation + one
    * per-lang doc count. Collects only the model (driver artifact). */
  def train(docs: DataFrame, langCol: String = "lang", textCol: String = "text"): Model = {
    // an unlabeled row is excluded, not fatal: a null label would reach
    // priors.keys and NPE in Array[String].sorted, killing the job
    val labeled = docs.filter(col(langCol).isNotNull)
    val low = lower(col(textCol))
    val counts = labeled
      .select(col(langCol).as("lang"), explode(trigrams(low)).as("tri"))
      .groupBy(col("lang"), bucketOf(col("tri")).as("bucket"))
      .agg(count(lit(1)).as("c"))
      .collect()
    val priors = labeled.groupBy(col(langCol).as("lang")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    require(priors.nonEmpty, "LangId.train: empty corpus")
    val langs = priors.keys.toArray.sorted
    val nDocs = priors.values.sum.toDouble
    val logPrior = langs.map(l => math.log(priors(l) / nDocs))
    val byLang = counts.groupBy(_.getString(0))
    val logLik = langs.map { l =>
      val cs = new Array[Long](D)
      byLang.getOrElse(l, Array.empty).foreach(r => cs(r.getInt(1)) = r.getLong(2))
      val tot = cs.sum.toDouble
      Array.tabulate(D)(b => math.log((cs(b) + 1.0) / (tot + D)))
    }
    Model(langs, logPrior, logLik)
  }

  /** Map-side scoring: (doc_id, pred_lang, score) with the model as plan
    * literals. Empty/short texts (no trigram) fall back to the prior
    * argmax — deterministic, never null. */
  def infer(docs: DataFrame, model: Model,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val scored = docs.withColumn("_tris", trigrams(lower(col(textCol))))
    val scoreCols = model.langs.indices.map { i =>
      val lik = typedLit(model.logLik(i).toSeq)
      aggregate(col("_tris"), lit(model.logPrior(i)),
        (acc, t) => acc + element_at(lik, bucketOf(t) + 1))
    }
    // argmax via struct-ordered array_max: (score, lang) — score first,
    // lang name breaks exact ties deterministically
    val packed = array(model.langs.indices.map(i =>
      struct(scoreCols(i).as("score"), lit(model.langs(i)).as("lang"))): _*)
    scored
      .withColumn("_best", array_max(packed))
      .select(col(idCol), col("_best.lang").as("pred_lang"),
        round(col("_best.score"), 6).as("score"))
  }
}
