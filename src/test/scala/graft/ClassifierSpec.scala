package graft

import org.apache.spark.sql.functions._
import graft.ops.{Classifier, Dedup}

/** Property pins for the learned quality classifier
  * ([[graft.ops.Classifier]]): batch-GD logistic regression over
  * md5-hashed unigram buckets must RECOVER a planted linear labeling
  * rule on docs it never saw. sf0.01 (500 docs) for statistical power —
  * the held-out fifth is ~100 docs. */
class ClassifierSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.01"

  private def labeled(d: String) = {
    val docs = Tables.t(spark, d, "documents")
    docs.select(col("doc_id"), col("text"),
      (size(filter(Dedup.tokens(col("text")), t => t === "fast")) >
        size(filter(Dedup.tokens(col("text")), t => t === "slow"))).cast("int").as("y"))
  }

  test("train recovers the planted rule on held-out docs (accuracy >= 0.9)") {
    val all = labeled(sf01)
    val train = all.where(col("doc_id") % 5 =!= 0)
    val test = all.where(col("doc_id") % 5 === 0)
    val w = Classifier.train(
      Classifier.features(train.select("doc_id", "text")),
      train.select("doc_id", "y"))
    val scored = Classifier.infer(test.select("doc_id", "text"), w)
      .join(test.select("doc_id", "y"), "doc_id")
    val n = scored.count().toDouble
    val acc = scored.where(col("pred").cast("int") === col("y")).count() / n
    info(f"held-out accuracy: $acc%.3f over ${n.toInt} docs")
    assert(acc >= 0.9, f"classifier failed to learn the planted rule: acc=$acc%.3f")
    // and it should beat the always-majority-class baseline
    val maj = math.max(
      scored.where(col("y") === 1).count() / n,
      scored.where(col("y") === 0).count() / n)
    assert(acc > maj, f"no better than majority baseline $maj%.3f")
  }

  test("inferLiteral: integer-exact logit — recompute one doc by hand") {
    val docs = Tables.t(spark, sf01, "documents").limit(1).cache()
    val row = docs.select("doc_id", "text").collect()(0)
    // Locale.ROOT: Spark's lower() is locale-independent; a default-locale
    // toLowerCase would diverge under e.g. a Turkish JVM locale
    val toks = row.getString(1).toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(t: String): Int = {
      md.reset()
      val hex = md.digest(t.getBytes("UTF-8")).take(2).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16) % 128).toInt
    }
    val num = toks.map(t => Classifier.literalK(bucket(t)).toLong).sum
    val v = num.toDouble * 100000.0 / toks.length.toDouble // Spark's exact op order
    val expect = BigDecimal(v).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val got = Classifier.inferLiteral(docs).collect()(0)
    assert(got.getLong(1) == expect, s"logit_ppm ${got.getLong(1)} != hand $expect")
    assert(got.getBoolean(2) == (num >= 0))
    docs.unpersist()
  }
}
