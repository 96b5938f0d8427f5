package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("stubDecode is deterministic and in range") {
    val (w1, h1, c1, f1) = Multimodal.stubDecode("hello world".getBytes)
    val (w2, h2, _, f2) = Multimodal.stubDecode("hello world".getBytes)
    assert((w1, h1, f1) == ((w2, h2, f2)))
    assert(w1 >= 1 && w1 <= 640 && h1 >= 1 && h1 <= 480 && c1 == 3)
    assert(f1.size == 4 && f1.forall(v => v >= 0f && v <= 1f))
  }

  test("decodeFeatures preserves cardinality and ids through batched mapPartitions") {
    val assets = (1L to 200L).map(i =>
      MediaAsset(i, "image", s"payload-$i".getBytes, "en", "src")).toDS()
    val out = Multimodal.decodeFeatures(assets, batchSize = 16).collect()
    assert(out.length == 200)
    assert(out.map(_.asset_id).sorted.toSeq == (1L to 200L))
    assert(out.forall(f => f.n_bytes == s"payload-${f.asset_id}".length))
  }

  test("sampleFrames keeps every k-th fixed-size chunk with its index") {
    // 40 bytes -> frames of 8 at indices 0..4; every 2nd -> 0, 2, 4
    val payload = (0 until 40).map(i => ('a' + i % 26).toByte).toArray
    val assets = Seq(MediaAsset(7L, "video", payload, "en", "src")).toDS()
    val frames = Multimodal.sampleFrames(assets, frameBytes = 8, everyKth = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2, 4))
    assert(frames.forall(_.n_bytes == 8))
    assert(frames(1).payload.toSeq == payload.slice(16, 24).toSeq)
  }

  test("resizeStub strides down to the target size; small payloads pass through") {
    val p = (0 until 100).map(_.toByte).toArray
    val r = Multimodal.resizeStub(p, 10)
    assert(r.length == 10)
    assert(r.toSeq == (0 until 10).map(i => (i * 10).toByte))
    assert(Multimodal.resizeStub(p, 200).toSeq == p.toSeq)
    val resized = Multimodal.resizeAssets(
      Seq(MediaAsset(1L, "image", p, "en", "s")).toDS(), targetBytes = 10).head()
    assert(resized.payload.length == 10)
  }
}
