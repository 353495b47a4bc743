package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan invariants (the 100 TB contract): filters and projections
  * reach the parquet scan, small dims broadcast, aggregations run
  * partial+final, top-k compiles to TakeOrderedAndProject, global sorts
  * use a single range exchange, and hot paths stay in whole-stage codegen.
  * A plan regression here is a performance bug even while results stay
  * correct, so it fails the build. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("filter_pushdown: predicates and projection reach the parquet scan") {
    val p = plan("filter_pushdown")
    assert(p.contains("PushedFilters:"), p)
    assert(p.contains("GreaterThan(l_quantity,45.0)"), "quantity filter must push down")
    assert(p.contains("LessThanOrEqual(l_discount,0.05)"), "discount filter must push down")
    // projection pruning: ReadSchema carries only the 4 selected columns
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema:")).mkString
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_discount"))
    assert(!readSchema.contains("l_extendedprice"), "unused columns must be pruned")
  }

  test("scan_parquet: column pruning") {
    val p = plan("scan_parquet")
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema:")).mkString
    assert(!readSchema.contains("l_extendedprice") && !readSchema.contains("l_shipdate"),
      s"pruned scan expected, got $readSchema")
  }

  test("join_broadcast_dim: dims broadcast, no shuffle of the fact side for the join") {
    val p = plan("join_broadcast_dim")
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(30).mkString("\n"))
    assert(!p.contains("SortMergeJoin"), "small dims must not sort-merge")
  }

  test("topk_closest: compiles to TakeOrderedAndProject (no global sort)") {
    val p = plan("topk_closest")
    assert(p.contains("TakeOrderedAndProject"), p.linesIterator.take(20).mkString("\n"))
  }

  test("agg_count_by_key: two-phase hash aggregation (map-side partial)") {
    val p = plan("agg_count_by_key")
    val aggLines = p.linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(aggLines.size >= 2, s"partial+final expected:\n$p")
  }

  test("sort_global: exactly one range exchange, local sorts only") {
    val p = plan("sort_global")
    assert(p.contains("rangepartitioning"), p)
    // exactly one exchange in the details section: the range partition
    val exchangeOps = p.linesIterator.count(_.trim.matches("""\(\d+\) Exchange"""))
    assert(exchangeOps == 1, s"single exchange expected, got $exchangeOps:\n$p")
  }

  test("whole-stage codegen covers the projection/filter hot path") {
    // AQE resolves the final plan at execution; stars appear after a run
    val df = SparkEntry.queries("mime_norm")(spark, sfDir)
    df.collect() // finalize the AQE plan for THIS query execution
    val p = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(p.contains("*("), s"codegen stars expected in final plan:\n$p")
  }

  test("surt_key_native stays inside whole-stage codegen") {
    val df = SparkEntry.queries("surt_key_native")(spark, sfDir)
    df.collect() // finalize the AQE plan for THIS query execution
    val p = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(p.contains("surt_key_native"), "native expression must appear in the plan")
    assert(p.linesIterator.exists(l => l.contains("surt_key_native") && l.contains("*(")),
      s"native expression must sit inside a codegen'd (starred) operator:\n$p")
  }

  test("join_semi: planned as a semi join, not inner+distinct") {
    val p = plan("join_semi")
    assert(p.contains("LeftSemi"), p.linesIterator.take(25).mkString("\n"))
  }

  test("join_range_block: idx side broadcasts (nested loop over the tiny index)") {
    val p = plan("join_range_block")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("join_range_block: idx built distributed — no unpartitioned WindowExec") {
    val df = SparkEntry.queries("join_range_block")(spark, sfDir)
    val wins = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty, "expected the per-partition two-phase rank window")
    wins.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"data-sized single-partition WindowExec found:\n$w"))
  }

  test("join_bucketed_colocated: no exchange under the join (bucketed co-location)") {
    val df = SparkEntry.queries("join_bucketed_colocated")(spark, sfDir)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    val plan = df.queryExecution.sparkPlan
    val joins = plan.collect {
      case j: SortMergeJoinExec => j: SparkPlan
      case j: ShuffledHashJoinExec => j: SparkPlan
    }
    assert(joins.nonEmpty, s"expected a co-located join:\n$plan")
    joins.foreach { j =>
      val shuffles = j.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty, s"bucketed join must not shuffle its inputs:\n$j")
    }
  }

  test("join_skew_salted: shuffled join on the salted key, never broadcast") {
    val df = SparkEntry.queries("join_skew_salted")(spark, sfDir)
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    val plan = df.queryExecution.sparkPlan
    // broadcast would sidestep the hot-key shuffle this query exists to
    // demonstrate; the salt must be in the join keys
    assert(plan.collect { case j: BroadcastHashJoinExec => j }.isEmpty,
      s"salted join must take the shuffle path:\n$plan")
    val shuffled = plan.collect {
      case j: SortMergeJoinExec => j.leftKeys
      case j: ShuffledHashJoinExec => j.leftKeys
    }
    assert(shuffled.nonEmpty, s"expected a shuffled join:\n$plan")
    assert(shuffled.head.exists(_.toString.toLowerCase.contains("salt")),
      s"join keys must include the salt, got ${shuffled.head}")
  }

  test("split_points: 1-in-SplitSampleMod sample filter sits below every global window") {
    val df = SparkEntry.queries("split_points")(spark, sfDir)
    val wins = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty, "expected the boundary-picking window")
    wins.foreach { w =>
      val sampled = w.child.collectFirst {
        case f: org.apache.spark.sql.execution.FilterExec
          if f.condition.toString.contains(s"% ${graft.queries.Relational.SplitSampleMod}") => f
      }
      assert(sampled.nonEmpty, s"sample filter must precede the window:\n$w")
    }
  }
}
