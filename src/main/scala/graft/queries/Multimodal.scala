package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** North-star multimodal columns (builder brief + SURVEY §2.10): media
  * payloads are opaque BINARY columns with typed metadata; decode /
  * feature-extract / frame-sample run as partition-level batch functions
  * over typed Datasets — the Spark-side plumbing (schema, encoders,
  * partition batching, function signature) is real; only the codec call
  * itself is STUBBED (no image/audio libs in this container) with a
  * deterministic fake keyed on payload size, so every op stays
  * DuckDB-oracle-able.
  *
  * Scale notes: all three ops are narrow (mapPartitions, no shuffle);
  * real decoders amortize model/codec init per partition exactly where
  * the `it.map` sits. Binary payloads stay columnar at rest (parquet
  * BINARY) and are pruned away unless selected.
  */
object Multimodal extends QueryModule {

  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  final case class MediaMeta(
      doc_id: Long, media_type: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int)
  final case class MediaFeature(doc_id: Long, norm: Double, f0: Double)
  final case class FrameSample(doc_id: Long, frame_no: Int)

  /** media table = documents with the text bytes standing in for an
    * encoded payload; media_type assigned deterministically */
  private def media(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.t(s, d, "documents")
      .selectExpr(
        "doc_id",
        "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type",
        "CAST(text AS BINARY) AS payload")
      .as[MediaRow]
  }

  /** STUB decode: a real implementation hands `payload` to a codec; the
    * fake derives metadata from the byte length so the oracle can verify
    * the distributed plumbing end-to-end. */
  private def decodeStub(r: MediaRow): MediaMeta = {
    val n = r.payload.length.toLong
    MediaMeta(
      r.doc_id, r.media_type, n,
      width = (16 + n % 640).toInt,
      height = (16 + (n * 7) % 480).toInt,
      n_frames = if (r.media_type == "video") (1 + n % 24).toInt else 1)
  }

  override def queries: Map[String, QFn] = Map(
    // decode → typed metadata, batched per partition
    "mm_decode_meta" -> ((s, d) => {
      import s.implicits._
      media(s, d)
        .mapPartitions(it => it.map(decodeStub)) // codec init would sit here
        .toDF()
        .orderBy("doc_id")
    }),

    // feature extraction: fixed-width vector per payload + L2 norm.
    // STUB features are (n*(k+1) % 97)/97; a real extractor would run an
    // encoder over the decoded frames.
    "mm_feature_extract" -> ((s, d) => {
      import s.implicits._
      media(s, d)
        .mapPartitions { it =>
          it.map { r =>
            val n = r.payload.length.toLong
            val feats = Array.tabulate(8)(k => ((n * (k + 1)) % 97).toDouble / 97.0)
            val norm = math.sqrt(feats.map(x => x * x).sum)
            MediaFeature(r.doc_id, norm, feats(0))
          }
        }
        .toDF()
        .select(col("doc_id"), round(col("norm"), 6).as("norm"), round(col("f0"), 6).as("f0"))
        .orderBy("doc_id")
    }),

    // batched "inference": partition iterator chunked into fixed batches,
    // the shape a GPU-backed encoder needs (amortized model call per
    // batch). Scores are the per-row deterministic stub so the oracle can
    // check the chunked path returns exactly the per-row answers.
    "mm_batch_infer" -> ((s, d) => {
      import s.implicits._
      media(s, d)
        .mapPartitions { it =>
          it.grouped(32).flatMap { batch =>
            // a real impl would run ONE model call on the whole batch here
            batch.map { r =>
              val n = r.payload.length.toLong
              (r.doc_id, (n % 89).toDouble / 89.0)
            }
          }
        }
        .toDF("doc_id", "score_raw")
        .select(col("doc_id"), round(col("score_raw"), 6).as("score"))
        .orderBy("doc_id")
    }),

    // frame sampling: every 4th frame of each video payload (Generator
    // shape: one input row -> n output rows)
    "mm_frame_sample" -> ((s, d) => {
      import s.implicits._
      media(s, d)
        .filter(_.media_type == "video")
        .flatMap { r =>
          val frames = decodeStub(r).n_frames
          (0 until frames by 4).map(f => FrameSample(r.doc_id, f))
        }
        .toDF()
        .orderBy("doc_id", "frame_no")
    })
  )

  /** the Spark stub counts payload BYTES (CAST(text AS BINARY) = UTF-8);
    * length(text) counts characters and would silently diverge on any
    * non-ASCII corpus — count octets on the DuckDB side too */
  private val nBytes = "octet_length(encode(text))"

  override def oracleSql: Map[String, String] = Map(
    "mm_decode_meta" ->
      (s"SELECT doc_id, CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type, " +
        s"CAST($nBytes AS BIGINT) AS n_bytes, " +
        s"CAST(16 + $nBytes % 640 AS INT) AS width, " +
        s"CAST(16 + ($nBytes * 7) % 480 AS INT) AS height, " +
        s"CAST(CASE WHEN doc_id % 3 = 2 THEN 1 + $nBytes % 24 ELSE 1 END AS INT) AS n_frames " +
        "FROM documents ORDER BY doc_id"),
    "mm_feature_extract" ->
      (s"SELECT doc_id, round(sqrt(list_sum(list_transform([1, 2, 3, 4, 5, 6, 7, 8], " +
        s"k -> (($nBytes * k % 97) / 97.0) * (($nBytes * k % 97) / 97.0)))), 6) AS norm, " +
        s"round(($nBytes % 97) / 97.0, 6) AS f0 " +
        "FROM documents ORDER BY doc_id"),
    "mm_batch_infer" ->
      (s"SELECT doc_id, round(($nBytes % 89) / 89.0, 6) AS score " +
        "FROM documents ORDER BY doc_id"),
    "mm_frame_sample" ->
      ("SELECT doc_id, CAST(frame_no AS INT) AS frame_no FROM (" +
        s"SELECT doc_id, unnest(generate_series(0, CAST($nBytes % 24 AS INT), 4)) AS frame_no " +
        "FROM documents WHERE doc_id % 3 = 2) ORDER BY doc_id, frame_no")
  )
}
