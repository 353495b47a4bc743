package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) tokenizer training — the Sennrich
  * et al. 2016 subword-units algorithm re-expressed Spark-first, the
  * "train your own tokenizer on the corpus you just cleaned" step of a
  * training-data pipeline (north-star extension; text_bigram_counts is
  * this trainer's single counting pass, exposed standalone).
  *
  * Scale shape: the corpus is touched EXACTLY ONCE — the word-frequency
  * aggregation (one hash-agg shuffle whose output is Zipf-bounded vocab,
  * orders of magnitude smaller than the corpus). Every merge round then
  * runs on that aggregate alone: a narrow per-word pair synthesis, one
  * partial+final count agg, and a 1-row TakeOrdered argmax; the chosen
  * merge is applied as a pure map (an `aggregate` HOF left-fold =
  * classic BPE's left-to-right non-overlapping merge semantics).
  * localCheckpoint truncates the growing lineage each round, same as
  * KMeans' Lloyd iterations and the connected-components loop.
  */
object Bpe {

  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  /** the once-per-corpus aggregation all training rounds run against */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(Dedup.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** SQL string literal (tokens are [a-z0-9]+ so this is belt-and-braces) */
  private def sqlLit(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** Learn `nMerges` merges from a (word, freq) relation. Deterministic:
    * argmax ties break (freq DESC, left, right). Stops early when no
    * pair remains (every word fused to a single symbol). */
  def train(wordFreqDf: DataFrame, nMerges: Int): Seq[Merge] = {
    // localCheckpoint per round, deliberately NOT a persist chain: a
    // chained persist nests each round's InMemoryRelation inside the
    // next round's cached plan, and Spark 4's plan-string generation for
    // the SQL-execution event walks final + initial AQE plan per nesting
    // level — exponential in rounds; 24 rounds OOMed an 8 GB driver
    // (round-16 negative result). The checkpoint flattens each round to
    // a LogicalRDD, which is what keeps both the plan and its printed
    // form O(1) per round.
    var wf = wordFreqDf
      .withColumn("syms",
        expr("transform(sequence(1, length(word)), i -> substr(word, i, 1))"))
      .select("syms", "freq")
      .localCheckpoint()
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var done = false
    while (out.size < nMerges && !done) {
      val top = wf
        .select(col("freq"), explode(expr(
          "IF(size(syms) >= 2, transform(sequence(1, size(syms) - 1), " +
            "i -> struct(syms[i-1] AS l, syms[i] AS r)), array())")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("f"))
        .orderBy(col("f").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (l, r, f) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += Merge(out.size, l, r, f)
        // left-fold merge: acc ends with `l` and the next symbol is `r` →
        // replace the tail with the fused symbol (non-overlapping
        // left-to-right, so 'aaaa' under (a,a) becomes [aa, aa])
        wf = wf.withColumn("syms", expr(
          "aggregate(syms, CAST(array() AS array<string>), (acc, x) -> " +
            s"IF(size(acc) > 0 AND element_at(acc, -1) = ${sqlLit(l)} AND x = ${sqlLit(r)}, " +
            s"concat(slice(acc, 1, size(acc) - 1), array(${sqlLit(l + r)})), " +
            "concat(acc, array(x))))"))
          .localCheckpoint()
      }
    }
    out.toSeq
  }

  /** Segment one word with a learned merge list — the same fold the
    * training update applies, run per merge in rank order (Sennrich
    * encode semantics). This is the REFERENCE/ORACLE form the
    * `bpe_piece_count` native kernel must match (NativeExprSpec parity,
    * the minhashSignaturesComposed convention) — [[encode]] itself runs
    * the kernel, not this. */
  def applyMerges(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms: Seq[String] = word.map(_.toString)
    merges.foreach { case (l, r) =>
      val acc = scala.collection.mutable.ArrayBuffer.empty[String]
      syms.foreach { x =>
        if (acc.nonEmpty && acc.last == l && x == r) {
          acc.remove(acc.size - 1); acc += (l + r)
        } else acc += x
      }
      syms = acc.toSeq
    }
    syms
  }

  /** Apply a learned merge list over a corpus: the merge table rides the
    * plan as a foldable binary literal inside the `bpe_piece_count`
    * kernel (graft.functions.BpeAlg — parsed once per task, per-thread
    * word memo) and segmentation is map-side only — no shuffle at any
    * corpus size, and the projection stays inside whole-stage codegen
    * (the previous Scala-UDF closure boxed every row's Seq[String]).
    * Output: (idCol, n_words, n_chars_tok, n_pieces). */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val mergesLit = lit(graft.functions.BpeAlg.serialize(merges))
    docs.select(col(idCol), Dedup.tokens(col(textCol)).as("w"))
      .withColumn("n_pieces", call_udf("bpe_piece_count", col("w"), mergesLit))
      // sum-of-token-lengths as length(concat_ws) — equal by definition,
      // but codegen-able where the aggregate/transform HOF pair is
      // interpreted-only and would drop this whole projection out of
      // whole-stage codegen (PlanSpec pins the star)
      .select(col(idCol), size(col("w")).as("n_words"),
        length(concat_ws("", col("w"))).as("n_chars_tok"),
        col("n_pieces"))
  }
}
