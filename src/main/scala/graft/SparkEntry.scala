package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{queries => q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every implemented operator key (SURVEY §2) from the query
  * modules under [[graft.queries]].
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    q.Relational,
    q.CdxOps,
    q.Aggregates,
    q.Joins,
    q.Windows,
    q.TimeWindows,
    q.Llm,
    q.Formats,
    q.Multimodal,
    q.Similarity,
    q.Graph,
    q.Search,
    q.Curation,
    q.UdfSurface)

  /** Flagship (SURVEY §7 minimum slice): latest 200-status capture for each
    * URL under a SURT prefix — sorted-key lookup + ranking, the core value
    * of the index the reference pipeline builds.
    */
  def entry(spark: SparkSession): DataFrame = {
    val c = Cdx.df(spark, "/root/testdata/sf0.001")
    val w = Window.partitionBy("urlkey").orderBy(col("ts").desc, col("id").desc)
    c.filter(col("urlkey").startsWith("org,example,") && col("status") === 200)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("urlkey", "ts", "url", "status")
      .orderBy("urlkey", "ts")
  }

  /** loud duplicate-key guard: toMap keeps the LAST occurrence, so a key
    * defined in two modules would silently shadow one implementation —
    * it would never be benched or verified while every gate stayed green
    * (the silent-denominator-shrink failure class). */
  private def merged[V](kind: String, maps: Seq[Map[String, V]]): Map[String, V] = {
    val all = maps.flatten
    val dups = all.groupBy(_._1).collect { case (k, vs) if vs.size > 1 => k }
    require(dups.isEmpty,
      s"duplicate $kind keys across query modules: ${dups.toSeq.sorted.mkString(", ")}")
    all.toMap
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    merged("query", modules.map(_.queries))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    merged("oracle", modules.map(_.oracleSql))
}
