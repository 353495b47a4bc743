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

  test("LangId.train recovers planted languages on held-out docs (accuracy >= 0.9)") {
    import spark.implicits._
    // three synthetic languages sharing filler vocabulary but each with
    // its own characteristic word stock — the char-trigram NB must
    // separate them from n-gram statistics alone
    val stock = Map(
      "aa" -> Seq("zyxwv", "qwerty", "plasma", "kraken", "fjord"),
      "bb" -> Seq("mumble", "bubble", "rumble", "humble", "nimbus"),
      "cc" -> Seq("starlight", "eststar", "strasse", "lastst", "striate"))
    val shared = Seq("the", "of", "and", "to", "in")
    def docText(lang: String, id: Long): String = {
      val r = new scala.util.Random(id * 31 + lang.hashCode)
      val own = stock(lang)
      (0 until 20).map { _ =>
        if (r.nextDouble() < 0.3) shared(r.nextInt(shared.length))
        else own(r.nextInt(own.length))
      }.mkString(" ")
    }
    val docs = (0L until 300L).map { id =>
      val lang = Seq("aa", "bb", "cc")((id % 3).toInt)
      (id, lang, docText(lang, id))
    }.toDF("doc_id", "lang", "text")
    val model = graft.ops.LangId.train(docs.where(col("doc_id") % 5 =!= 0))
    assert(model.langs.toSeq == Seq("aa", "bb", "cc"))
    val heldOut = docs.where(col("doc_id") % 5 === 0)
    val scored = graft.ops.LangId.infer(heldOut, model)
      .join(heldOut.select("doc_id", "lang"), "doc_id")
    val n = scored.count().toDouble
    val acc = scored.where(col("pred_lang") === col("lang")).count() / n
    info(f"held-out language accuracy: $acc%.3f over ${n.toInt} docs")
    assert(acc >= 0.9, f"trained lang-id failed planted recovery: acc=$acc%.3f")
    // determinism: scoring twice yields identical predictions
    val a = graft.ops.LangId.infer(heldOut, model).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    val b = graft.ops.LangId.infer(heldOut, model).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(a == b)
  }

  test("text_lang_id_trained driver key: one prediction per doc, never null, prior fallback on empty text") {
    import spark.implicits._
    val out = SparkEntry.queries("text_lang_id_trained")(spark, sfDir).collect()
    val nDocs = Tables.t(spark, sfDir, "documents").count()
    assert(out.length == nDocs)
    assert(out.forall(r => r.getString(1) != null))
    // an empty doc scores by prior alone and still predicts
    val model = graft.ops.LangId.train(
      Seq(("en", "hello world common text"), ("de", "zwei drei vier")).toDF("lang", "text"))
    val empty = graft.ops.LangId.infer(Seq((1L, "")).toDF("doc_id", "text"), model)
      .collect()
    assert(empty.length == 1 && empty.head.getString(1) != null)
  }
}
