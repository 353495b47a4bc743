package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators: selecting what goes INTO a training mix.
  * No reference analog (the reference indexes archives; choosing data is
  * the LLM-pipeline north star, SURVEY §2.10). */
object Corpus {

  /** Per-group token-budget fill: keep each group's highest-quality
    * documents until the group's token budget is spent — the core
    * corpus-mixing primitive ("N billion tokens per language/source").
    *
    * Precondition: `tokensCol` values must be >= 0 (token counts are).
    * The level-pruning step below drops a whole quality level once the
    * PRECEDING levels' token sum exceeds the budget; with a negative
    * token value the naive running sum could dip back under budget and
    * admit later documents this pruned form never sees, breaking the
    * hash-equality to the naive window. All in-repo producers
    * ([[graft.ops.Text.wordCount]] / [[graft.ops.Text.bpeEstimate]])
    * satisfy this; an
    * external caller feeding signed "token deltas" does not.
    *
    * Semantics are EXACTLY the naive form — one window per group ordered
    * by (quality DESC, id), keep rows whose running token sum stays
    * within budget — which is also the DuckDB oracle. But the naive
    * window is a scale-killer at 100 TB: `PARTITION BY lang` is a
    * handful of partitions, so the whole corpus funnels through a
    * handful of tasks. This implementation is hash-equal yet scale-safe:
    *
    *   1. aggregate token sums per (group, quality LEVEL). Quality
    *      scores arrive 6-dp-rounded ([[Text.qualityScore]]), so levels
    *      are a bounded domain (≤ 1e6 + 1 values) regardless of corpus
    *      size, and the shuffle key (group, level) is uniformly spread;
    *   2. one window over the AGGREGATED relation — rows are levels,
    *      not documents, so the per-group partition is ≤ 1e6 rows at
    *      ANY corpus size — gives each level its tokens-before prefix;
    *   3. levels with budget remaining (`cum_before <= budget`; `<=` so
    *      a zero-token document landing exactly on the budget survives,
    *      as it does in the naive order) join their documents back on
    *      the same well-spread key, and the per-document running sum
    *      windows by (group, level) — far finer than group alone. Only
    *      the boundary level actually needs it; interior levels pass the
    *      filter wholesale. A degenerate corpus where most documents
    *      share one quality value re-concentrates that window; the
    *      level aggregation makes per-level volume visible first, so a
    *      caller can pre-salt or widen the quality precision.
    */
  def budgetFill(
      docs: DataFrame, groupCol: String, qualityCol: String,
      tokensCol: String, idCol: String, budget: Long): DataFrame = {
    val levels = docs.groupBy(groupCol, qualityCol)
      .agg(sum(tokensCol).as("level_tokens"))
    val wLevel = Window.partitionBy(groupCol).orderBy(col(qualityCol).desc)
    val open = levels
      .withColumn("cum_before", coalesce(
        sum("level_tokens").over(
          wLevel.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("cum_before") <= budget)
      .select(col(groupCol), col(qualityCol), col("cum_before"))
    val wDoc = Window.partitionBy(groupCol, qualityCol).orderBy(idCol)
    docs.join(open, Seq(groupCol, qualityCol))
      .withColumn("cum_tokens", col("cum_before") + sum(tokensCol).over(wDoc))
      .filter(col("cum_tokens") <= budget)
      .drop("cum_before")
  }
}
