package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text-analysis building blocks (SURVEY §2.10) — the
  * reusable forms behind the text_* query keys. All codegen'd built-ins;
  * every function is a pure Column so it composes into any projection. */
object Text {

  val defaultStopwords: Seq[String] =
    Seq("the", "and", "of", "to", "a", "in", "is", "for")

  /** lowercase alphanumeric token runs */
  def tokens(text: Column): Column = Dedup.tokens(text)

  def wordCount(text: Column): Column = size(tokens(text))

  def distinctWordCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** fraction of tokens that are stopwords (0 when no tokens) */
  def stopwordRatio(text: Column, stopwords: Seq[String] = defaultStopwords): Column =
    size(filter(tokens(text), t => t.isInCollection(stopwords))).cast("double") /
      greatest(size(tokens(text)), lit(1))

  /** crude language-class heuristic thresholding the stopword signal */
  def langClass(text: Column): Column = {
    val r = stopwordRatio(text)
    when(r >= 0.15, "en_like").when(r >= 0.05, "latin_like").otherwise("other")
  }

  /** length-saturation + stopword composite quality score in [0, 1] */
  def qualityScore(text: Column, saturateAt: Int = 500): Column =
    round(least(length(text) / lit(saturateAt.toDouble), lit(1.0)) * 0.5 +
      stopwordRatio(text) * 0.5, 6)

  /** BPE-style token estimate: chars / 4 */
  def bpeEstimate(text: Column): Column =
    ceil(length(text) / lit(4.0)).cast("bigint")

  /** content fingerprint: 64-bit prefix of sha256 over normalized text */
  def fingerprint(text: Column): Column =
    substring(sha2(regexp_replace(lower(text), "\\s+", " "), 256), 1, 16)
}
