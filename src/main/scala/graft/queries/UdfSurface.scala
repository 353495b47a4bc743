package graft.queries

import graft.{Cdx, QueryModule}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** SURVEY §2.10 `udf_surface` — the three extension surfaces Spark offers
  * user code, each demonstrated on CDX data and DuckDB-oracle-checked:
  *
  *  - scalar UDF (`udf(...)`): status -> class label. Kept OFF hot paths
  *    elsewhere (a UDF is an opaque box to Catalyst: no codegen, no
  *    pushdown through it) — the native-Expression path (SurtKeyExpr) is
  *    the engine's answer where performance matters; this key exists to
  *    cover the API surface.
  *  - typed UDAF (`Aggregator` via `functions.udaf`): per-host capture
  *    digest = (count, min/max length, sum) in one buffer — the typed
  *    equivalent of the reference's per-reducer accounting
  *    (zipnumclusterjob.py §reducer block stats, recon ~L120–140).
  *  - UDTF shape (`Generator` via explode of an array expression):
  *    one CDX line -> one row per query parameter.
  */
object UdfSurface extends QueryModule {

  private def o(sql: String): String = Cdx.duckCte + sql

  final case class LenStats(cnt: Long, minLen: Long, maxLen: Long, sumLen: Long)

  /** typed Aggregator: buffer merges associatively (map-side partials) */
  object LenStatsAgg extends Aggregator[Long, LenStats, LenStats] {
    override def zero: LenStats = LenStats(0L, Long.MaxValue, Long.MinValue, 0L)
    override def reduce(b: LenStats, a: Long): LenStats =
      LenStats(b.cnt + 1, math.min(b.minLen, a), math.max(b.maxLen, a), b.sumLen + a)
    override def merge(x: LenStats, y: LenStats): LenStats =
      LenStats(x.cnt + y.cnt, math.min(x.minLen, y.minLen),
        math.max(x.maxLen, y.maxLen), x.sumLen + y.sumLen)
    override def finish(r: LenStats): LenStats = r
    override def bufferEncoder: Encoder[LenStats] = Encoders.product[LenStats]
    override def outputEncoder: Encoder[LenStats] = Encoders.product[LenStats]
  }

  override def queries: Map[String, QFn] = Map(
    "udf_surface" -> ((s, d) => {
      val statusLabel = udf((status: Int) => s"${status / 100}xx")
      val lenStats = udaf(LenStatsAgg)
      Cdx.df(s, d)
        .groupBy(col("hostword"), statusLabel(col("status")).as("cls"))
        .agg(lenStats(col("length")).as("st"))
        .select(
          col("hostword"), col("cls"),
          col("st.cnt").as("cnt"), col("st.minLen").as("min_len"),
          col("st.maxLen").as("max_len"), col("st.sumLen").as("sum_len"))
        .orderBy("hostword", "cls")
    }),

    // Generator/UDTF shape: explode each capture's query params
    "udtf_explode_params" -> ((s, d) =>
      Cdx.df(s, d)
        .select(col("id"), posexplode(split(col("qs"), "&")))
        .toDF("id", "pos", "param")
        .orderBy("id", "pos"))
  )

  override def oracleSql: Map[String, String] = Map(
    "udf_surface" -> o(
      "SELECT hostword, (status // 100) || 'xx' AS cls, count(*) AS cnt, " +
        "min(length) AS min_len, max(length) AS max_len, CAST(sum(length) AS BIGINT) AS sum_len " +
        "FROM cdx GROUP BY hostword, cls ORDER BY hostword, cls"),
    "udtf_explode_params" -> o(
      "SELECT id, CAST(i - 1 AS INT) AS pos, str_split(qs, '&')[i] AS param " +
        "FROM cdx, (SELECT unnest([1, 2]) AS i) ORDER BY id, pos")
  )
}
