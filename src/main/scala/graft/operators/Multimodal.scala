package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A multimodal asset: opaque media bytes + typed metadata travelling as
  * first-class columns. At 100 TB the `payload` column is the dominant
  * weight; keeping it `binary` (never string) avoids copies, and all
  * metadata predicates prune without touching payload bytes (parquet column
  * pruning drops the heavy column from scans that don't select it). */
case class MediaAsset(asset_id: Long, kind: String, payload: Array[Byte],
                      meta_lang: String, meta_source: String)

/** Output of the (stubbed) decoder. */
case class MediaFeatures(asset_id: Long, kind: String, n_bytes: Int,
                        width: Int, height: Int, channels: Int,
                        feature: Seq[Float])

/** One sampled frame of a video-kind asset. */
case class MediaFrame(asset_id: Long, frame_idx: Int, n_bytes: Int,
                      payload: Array[Byte])

/** Multimodal-column plumbing: decode / feature-extract for opaque binary
  * payloads (images/audio/video as `binary` + metadata).
  *
  * The decode step itself is a STUB — media codecs aren't in this
  * container — but the Spark-side shape is real and tested: a typed
  * `mapPartitions` that processes payloads in batches (the JVM analogue of
  * a `mapInPandas` batch UDF: one iterator in, one iterator out, amortized
  * per-batch setup), schema carried by case-class Encoders, partition
  * parallelism = input file splits.
  */
object Multimodal {

  /** Deterministic fake decode so tests/oracles are stable: "dimensions"
    * and a tiny "feature vector" derived from the payload bytes only. */
  def stubDecode(payload: Array[Byte]): (Int, Int, Int, Seq[Float]) = {
    val n = payload.length
    var h = 0L
    payload.foreach(b => h = (h * 31 + (b & 0xff)) % 1000000007L)
    val width = (h % 640).toInt + 1
    val height = ((h / 640) % 480).toInt + 1
    val feature = (0 until 4).map(i => ((h >> (i * 8)) & 0xff).toFloat / 255.0f)
    (width, height, 3, feature)
  }

  /** Batched decode over a Dataset of assets. Batch size bounds peak memory
    * per task regardless of payload sizes — the same contract a vectorized
    * Python UDF gives `mapInPandas`. */
  def decodeFeatures(ds: Dataset[MediaAsset], batchSize: Int = 64)
                    (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    ds.mapPartitions { iter =>
      iter.grouped(batchSize).flatMap { batch =>
        // per-batch decoder setup would go here (codec contexts, model handles)
        batch.iterator.map { a =>
          val (w, h, c, f) = stubDecode(a.payload)
          MediaFeatures(a.asset_id, a.kind, a.payload.length, w, h, c, f)
        }
      }
    }
  }

  /** Deterministic "resize": downsample the payload to exactly
    * `targetBytes` by striding (index floor(i*len/target)) — the codec
    * math is a stub, the batch/binary plumbing is the real contract. */
  def resizeStub(payload: Array[Byte], targetBytes: Int): Array[Byte] = {
    val n = payload.length
    if (n <= targetBytes) payload
    else Array.tabulate(targetBytes)(i => payload((i.toLong * n / targetBytes).toInt))
  }

  /** Batched resize — same mapPartitions shape as [[decodeFeatures]]. */
  def resizeAssets(ds: Dataset[MediaAsset], targetBytes: Int = 256)
                  (implicit spark: SparkSession): Dataset[MediaAsset] = {
    import spark.implicits._
    ds.mapPartitions(_.map(a => a.copy(payload = resizeStub(a.payload, targetBytes))))
  }

  /** Frame sampling for "video" payloads: chunk the byte stream into
    * fixed-size frames and keep every k-th — one row per sampled frame,
    * the explode-shaped batch UDF of a real frame extractor. Output rows
    * carry (frame_idx, bytes); downstream feature extraction reuses
    * [[decodeFeatures]]'s batch shape. */
  def sampleFrames(ds: Dataset[MediaAsset], frameBytes: Int = 16,
                   everyKth: Int = 4)
                  (implicit spark: SparkSession): Dataset[MediaFrame] = {
    import spark.implicits._
    ds.mapPartitions(_.flatMap { a =>
      a.payload.grouped(frameBytes).zipWithIndex.collect {
        case (b, i) if i % everyKth == 0 => MediaFrame(a.asset_id, i, b.length, b)
      }
    })
  }

  /** Synthesize a MediaAsset table from `documents` (text bytes standing in
    * for media payloads) — exercises the binary column path end-to-end. */
  def assetsFromDocuments(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaAsset] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("asset_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
      col("text").cast("binary").as("payload"),
      col("lang").as("meta_lang"),
      col("source").as("meta_source")).as[MediaAsset]
  }
}
