package graft.queries

import graft.{Cdx, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.1 parquet scan + §2.7 sorts / limits / top-k / set ops /
  * sampling / range partitioning.
  *
  * `sort_global` is the reference pipeline's raison d'être: jobs 2+3
  * (samplecdxjob.py + zipnumclusterjob.py TotalOrderPartitioner, recon) are
  * subsumed by a single `repartitionByRange + sortWithinPartitions`
  * (Catalyst RangePartitioning reservoir-samples internally).
  */
object Relational extends QueryModule {

  private def o(sql: String): String = Cdx.duckCte + sql

  override def queries: Map[String, QFn] = Map(
    "scan_parquet" -> ((s, d) =>
      Tables.t(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")),

    // Global total-order sort — identical plan shape to orderBy, written as
    // the explicit range-exchange + local sort used by the ZipNum sink path.
    "sort_global" -> ((s, d) =>
      Cdx.df(s, d)
        .repartitionByRange(col("urlkey"), col("ts"), col("id"))
        .sortWithinPartitions("urlkey", "ts", "id")
        .select("urlkey", "ts", "id")),

    // predicate + projection pushdown into the parquet scan — PlanSpec
    // asserts PushedFilters/ReadSchema on this exact plan
    "filter_pushdown" -> ((s, d) =>
      Tables.t(s, d, "lineitem")
        .filter(col("l_quantity") > 45 && col("l_discount") <= 0.05)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber")),

    "sort_within_partitions" -> ((s, d) =>
      Cdx.df(s, d)
        .repartitionByRange(8, col("urlkey"), col("ts"), col("id"))
        .sortWithinPartitions("urlkey", "ts", "id")
        .select("urlkey", "ts", "id")),

    // k captures closest to a target instant (cdx-server sort=closest&limit=k)
    "topk_closest" -> ((s, d) =>
      Cdx.df(s, d)
        .withColumn("diff_us", abs(col("epoch_us") - expr("unix_micros(TIMESTAMP '1998-06-01 00:00:00')")))
        .orderBy(col("diff_us"), col("id"))
        .limit(50)
        .select("id", "urlkey", "ts", "diff_us")),

    // key-range pagination over the sorted key space (limit=N)
    "limit_page" -> ((s, d) =>
      Cdx.df(s, d)
        .filter(col("urlkey") >= "org,example,medium)")
        .orderBy("urlkey", "ts", "id")
        .limit(200)
        .select("urlkey", "ts", "id")),

    "union_segments" -> ((s, d) => {
      val c = Cdx.df(s, d)
      val a = c.filter(col("id") % 2 === 0).select(col("id"), col("urlkey"), lit("segA").as("seg"))
      val b = c.filter(col("id") % 3 === 0).select(col("id"), col("urlkey"), lit("segB").as("seg"))
      a.unionByName(b).orderBy("id", "seg")
    }),

    "except_new_urls" -> ((s, d) => {
      val c = Cdx.df(s, d)
      c.filter(col("id") % 2 === 1).select("urlkey")
        .except(c.filter(col("id") % 2 === 0).select("urlkey"))
        .orderBy("urlkey")
    }),

    "intersect_stable" -> ((s, d) => {
      val c = Cdx.df(s, d)
      c.filter(col("id") % 2 === 1).select("hostword")
        .intersect(c.filter(col("id") % 2 === 0).select("hostword"))
        .orderBy("hostword")
    }),

    // Bernoulli sample (samplecdxjob.py §mapper, recon ~L20–40).
    // Oracle-exempt: sampling RNG is engine-specific.
    "sample_fraction" -> ((s, d) =>
      Cdx.df(s, d).sample(withReplacement = false, 0.1, 42).select("id").orderBy("id")),

    // N−1 sorted split points (samplecdxjob.py §mapper+§reducer, recon
    // ~L20–70): SAMPLE FIRST (deterministic 1-in-sampleMod, so DuckDB can
    // oracle it — the reference's Bernoulli mapper emit), THEN pick
    // every-k-th sampled row as a boundary. The single-partition WindowExec
    // only ever sees the sample — sample-sized in code, not by assumption —
    // exactly the reference's "only the sample reaches the single reducer".
    // The production path doesn't use this at all (repartitionByRange
    // reservoir-samples internally, SURVEY §2.7).
    "split_points" -> ((s, d) => splitPoints(s, d)),

    // mrjob-counter parity (SURVEY §4 observability row): pipeline metrics
    // via the Observation API — accumulator-backed, harvested from the
    // SAME single pass that writes the output (noop sink stands in for the
    // real one), never a second scan. At 100 TB this is the difference
    // between free counters and doubling the job.
    "obs_pipeline_counters" -> ((s, d) => {
      val obs = org.apache.spark.sql.Observation()
      // dfFan: the counters are exact global aggregates (counts/sum and
      // min/max over exact strings — partition-layout-independent), and
      // the single-split scan otherwise derives + counts on one core
      Cdx.dfFan(s, d)
        .observe(obs,
          count(lit(1)).as("n_rows"),
          count(when(col("status") >= 400, 1)).as("n_err"),
          count(col("redirect")).as("n_redirects"),
          sum("length").as("total_bytes"),
          min("ts").as("min_ts"),
          max("ts").as("max_ts"))
        .write.format("noop").mode("overwrite").save()
      val m = obs.get
      import s.implicits._
      Seq((m("n_rows").asInstanceOf[Long], m("n_err").asInstanceOf[Long],
        m("n_redirects").asInstanceOf[Long], m("total_bytes").asInstanceOf[Long],
        m("min_ts").asInstanceOf[String], m("max_ts").asInstanceOf[String]))
        .toDF("n_rows", "n_err", "n_redirects", "total_bytes", "min_ts", "max_ts")
    }),

    // Range partitioning visibility: per-partition key stats. Oracle-exempt
    // (partition ids are engine-specific); ScalaTest asserts monotonicity.
    "repartition_range" -> ((s, d) =>
      Cdx.df(s, d)
        .repartitionByRange(8, col("urlkey"), col("ts"), col("id"))
        .select(spark_partition_id().as("pid"), col("urlkey"))
        .groupBy("pid")
        .agg(min("urlkey").as("min_key"), max("urlkey").as("max_key"), count(lit(1)).as("cnt"))
        .orderBy("pid"))
  )

  /** scale knob for [[splitPoints]]: 1-in-SplitSampleMod rows reach the
    * single global window. 500 keeps the sample nonempty at sf0.001 (ids
    * are contiguous, so ~3 rows) while staying 25× sparser than round 1's
    * 1-in-20; a production caller sizes sampleMod so rows/sampleMod ≈
    * splits × O(100) — the sample flowing through the one-partition
    * window is the ONLY non-scalable term, and the caller controls it. */
  val SplitSampleMod = 500

  /** default split-point count — shared with the oracle interpolation */
  val DefaultSplits = 8

  /** TWO-PHASE distributed exact ranking (round 14 — replaces the
    * one-partition global window): the sample range-partitions on the
    * full sort key, each partition ranks LOCALLY (window partitioned by
    * pid — parallel), and the per-partition counts — P longs, a
    * driver-side merge in the classic zipWithIndex shape — broadcast
    * back as rank offsets. global rank = local rank + offset, exactly
    * the old window's row_number, so the oracle is unchanged; the only
    * single-point term left is the P-row count collect. */
  def splitPoints(
      s: SparkSession, d: String,
      sampleMod: Int = SplitSampleMod, splits: Int = DefaultSplits): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    // range partitioning on the full key = partition boundaries in key
    // order, so pid order IS rank order; localCheckpoint pins the
    // partitioning for the two consumers (counts pass + rank pass)
    val sample = Cdx.df(s, d)
      .filter(col("id") % sampleMod === 0)
      .select(col("urlkey"), col("ts"), col("id"))
      .repartitionByRange(col("urlkey"), col("ts"), col("id"))
      .sortWithinPartitions("urlkey", "ts", "id")
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val counts = sample.groupBy("pid").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val total = counts.map(_._2).sum
    if (total == 0)
      return sample.select(col("urlkey").as("boundary"), lit(0).as("rn")).limit(0)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, n)) =>
      (pid, acc + n)
    }.init.zip(counts).map { case ((_, off), (pid, _)) => (pid, off) }
    val offDf = offsets.toSeq.toDF("pid", "off")
    val every = math.ceil(total.toDouble / splits).toLong
    val w = Window.partitionBy("pid").orderBy("urlkey", "ts", "id")
    sample
      .withColumn("lrn", row_number().over(w))
      .join(broadcast(offDf), "pid")
      .withColumn("rn", (col("lrn") + col("off")).cast("int"))
      .filter(col("rn") % every === 0 && col("rn") < total)
      .select(col("urlkey").as("boundary"), col("rn"))
      .orderBy("rn")
  }

  override def oracleSql: Map[String, String] = Map(
    "scan_parquet" ->
      "SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "sort_global" -> o("SELECT urlkey, ts, id FROM cdx ORDER BY urlkey, ts, id"),
    "filter_pushdown" ->
      ("SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem " +
        "WHERE l_quantity > 45 AND l_discount <= 0.05 ORDER BY l_orderkey, l_linenumber"),
    "sort_within_partitions" -> o("SELECT urlkey, ts, id FROM cdx ORDER BY urlkey, ts, id"),
    "topk_closest" -> o(
      "SELECT id, urlkey, ts, abs(epoch_us - epoch_us(TIMESTAMP '1998-06-01 00:00:00')) AS diff_us " +
        "FROM cdx ORDER BY diff_us, id LIMIT 50"),
    "limit_page" -> o(
      "SELECT urlkey, ts, id FROM cdx WHERE urlkey >= 'org,example,medium)' ORDER BY urlkey, ts, id LIMIT 200"),
    "union_segments" -> o(
      "SELECT id, urlkey, 'segA' AS seg FROM cdx WHERE id % 2 = 0 " +
        "UNION ALL SELECT id, urlkey, 'segB' AS seg FROM cdx WHERE id % 3 = 0 ORDER BY id, seg"),
    "except_new_urls" -> o(
      "SELECT urlkey FROM cdx WHERE id % 2 = 1 EXCEPT SELECT urlkey FROM cdx WHERE id % 2 = 0 ORDER BY urlkey"),
    "intersect_stable" -> o(
      "SELECT hostword FROM cdx WHERE id % 2 = 1 INTERSECT SELECT hostword FROM cdx WHERE id % 2 = 0 ORDER BY hostword"),
    "obs_pipeline_counters" -> o(
      "SELECT count(*) AS n_rows, count(CASE WHEN status >= 400 THEN 1 END) AS n_err, " +
        "count(redirect) AS n_redirects, CAST(sum(length) AS BIGINT) AS total_bytes, " +
        "min(ts) AS min_ts, max(ts) AS max_ts FROM cdx"),
    // subquery, not a second WITH — the cdx CTE prefix already opens one.
    // Constants interpolated from the Scala side (SplitSampleMod / the
    // default split count) so retuning the scale knob can't silently
    // desync the oracle from the query.
    "split_points" -> o(
      "SELECT urlkey AS boundary, rn FROM " +
        s"(SELECT urlkey, row_number() OVER (ORDER BY urlkey, ts, id) AS rn, count(*) OVER () AS cnt " +
        s"FROM cdx WHERE id % $SplitSampleMod = 0) " +
        s"WHERE rn % CAST(ceil(cnt / $DefaultSplits.0) AS BIGINT) = 0 AND rn < cnt ORDER BY rn")
  )
}
