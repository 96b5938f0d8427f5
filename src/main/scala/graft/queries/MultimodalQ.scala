package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Multimodal

/** Multimodal plumbing exercised as a query: documents' text bytes stand in
  * for media payloads; the batched typed mapPartitions decoder (stubbed
  * codec, real schema/batching/partitioning) produces per-asset features.
  * The oracle replays the deterministic stub arithmetic over the same bytes.
  */
object MultimodalQ {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "m1_multimodal_decode" -> { (s, d) =>
      implicit val spark: SparkSession = s
      val assets = Multimodal.assetsFromDocuments(Tables.documents(s, d))
      Multimodal.decodeFeatures(assets)
        .toDF()
        .select("asset_id", "kind", "n_bytes", "width", "height", "channels")
    },
    // ----- M2-shape: frame sampling of video-kind payloads — one row per
    // kept frame (every 4th 16-byte chunk), the explode-shaped batch UDF
    "m2_frame_sample" -> { (s, d) =>
      implicit val spark: SparkSession = s
      import s.implicits._
      val assets = Multimodal.assetsFromDocuments(Tables.documents(s, d))
        .filter(col("kind") === "video").as[graft.operators.MediaAsset]
      Multimodal.sampleFrames(assets)
        .toDF()
        .select(col("asset_id"), col("frame_idx"), col("n_bytes"),
          md5(col("payload")).as("frame_md5"))
    }
  )

  val oracles: Map[String, String] = Map(
    "m1_multimodal_decode" ->
      """WITH h AS (SELECT doc_id, length(text) AS nb,
           list_reduce(list_concat([CAST(0 AS BIGINT)],
             list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
             (a, b) -> (a*31 + b) % 1000000007) AS hh
           FROM documents)
         SELECT doc_id AS asset_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
           nb AS n_bytes,
           CAST(hh % 640 AS INT) + 1 AS width,
           CAST((hh // 640) % 480 AS INT) + 1 AS height,
           3 AS channels
         FROM h""",
    "m2_frame_sample" ->
      """WITH v AS (SELECT doc_id AS asset_id, text FROM documents WHERE doc_id % 3 = 2),
         f AS (SELECT asset_id, CAST(i AS INT) AS frame_idx,
                 substr(text, CAST(i AS INT) * 16 + 1, 16) AS frame
               FROM v, UNNEST(range(CAST(ceil(length(text) / 16.0) AS BIGINT))) AS t(i)
               WHERE i % 4 = 0)
         SELECT asset_id, frame_idx, CAST(length(frame) AS INT) AS n_bytes,
                md5(frame) AS frame_md5
         FROM f"""
  )
}
