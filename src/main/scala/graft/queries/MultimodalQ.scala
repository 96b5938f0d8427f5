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
         FROM h"""
  )
}
