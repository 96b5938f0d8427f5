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
}
