package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The session memos (signature frame, shingle sets) must hold a BOUNDED
  * number of persisted frames under many-dataset access — and evict one
  * LRU entry at a time, never a concurrent reader's frame wholesale (the
  * ADVICE r10 thrash pattern). This spec drives the memos through their
  * public query surface across 11 tiny dataset dirs and asserts the
  * persisted-RDD population stays bounded while results remain correct
  * (an evicted dir recomputes — cold, not wrong). */
class MemoLruSpec extends SparkSpec {
  import spark.implicits._

  private def mkDataset(i: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_memo_$i")
    (1L to 30L).map(j => (j, s"dataset $i doc $j " +
        (1 to 10).map(k => s"w${(j + k) % 7}").mkString(" ")))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(dir.resolve("documents.parquet").toString)
    dir.toString
  }

  test("signature/shingle memos stay bounded across >cap datasets, one-at-a-time eviction") {
    val dirs = (0 until 11).map(mkDataset)
    val before = spark.sparkContext.getPersistentRDDs.size
    def d2(d: String) =
      TextDedup.queries("d2_minhash")(spark, d).collect()
    def d8(d: String) =
      Curation.queries("d8_ngram_hotspots")(spark, d).collect()

    val first2 = d2(dirs.head)
    val first8 = d8(dirs.head)
    dirs.tail.foreach { d => d2(d); d8(d) }
    val after = spark.sparkContext.getPersistentRDDs.size
    // 11 datasets x 2 memos at cap 8 each: the persisted population must
    // be bounded by the caps, not grow with dataset count
    assert(after - before <= 16,
      s"persisted frames grew unbounded: $before -> $after")
    // the first (evicted) dataset still answers correctly — recompute,
    // not corruption
    assert(d2(dirs.head).toSeq == first2.toSeq)
    assert(d8(dirs.head).toSeq == first8.toSeq)
  }
}
