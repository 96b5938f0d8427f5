package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000L)

  test("sessionAgg on a batch frame: gap splits sessions (unified semantics)") {
    val df = Seq(
      (1L, ts(0), 1.0), (1L, ts(5), 2.0),   // session 1
      (1L, ts(30), 3.0),                    // gap 25 min > 10 → session 2
      (2L, ts(0), 4.0)
    ).toDF("user_id", "ts", "value")
    val out = Streams.sessionAgg(df).orderBy("user_id", "session_start").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("n_events") == 2 && out(0).getAs[Double]("sum_value") == 3.0)
    assert(out(1).getAs[Long]("n_events") == 1)
    assert(out(2).getAs[Long]("user_id") == 2L)
  }

  test("sessionAgg over a MemoryStream emits closed sessions after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val query = Streams.sessionAgg(mem.toDF().toDF("user_id", "ts", "value"))
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      mem.addData((1L, ts(0), 1.0), (1L, ts(5), 2.0))
      query.processAllAvailable()
      // advance event time far past watermark to close the session
      mem.addData((9L, ts(600), 0.0))
      query.processAllAvailable()
      mem.addData((9L, ts(1200), 0.0))
      query.processAllAvailable()
      val rows = spark.table("sessions").collect()
      assert(rows.exists(r => r.getAs[Long]("user_id") == 1L &&
        r.getAs[Long]("n_events") == 2))
    } finally query.stop()
  }

  test("incrementalDedup flags later arrivals across micro-batches (streaming d1)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[KeyedDoc]
    val query = Streams.incrementalDedup(mem.toDS())
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      mem.addData(KeyedDoc(100L, 1L), KeyedDoc(100L, 2L), KeyedDoc(200L, 3L))
      query.processAllAvailable()
      // a duplicate arriving in a LATER batch must still resolve to the
      // canonical held in state
      mem.addData(KeyedDoc(100L, 9L), KeyedDoc(300L, 4L))
      query.processAllAvailable()
      val rows = spark.table("dedup").collect()
        .map(r => r.getAs[Long]("docId") ->
          (r.getAs[Long]("canonical"), r.getAs[Boolean]("isDuplicate"))).toMap
      assert(rows(1L) == ((1L, false)))
      assert(rows(2L) == ((1L, true)))
      assert(rows(3L) == ((3L, false)))
      assert(rows(9L) == ((1L, true)))   // cross-batch duplicate
      assert(rows(4L) == ((4L, false)))
    } finally query.stop()
  }

  test("incremental LSH: a near-dup arriving in a later batch pairs with its original") {
    implicit val sqlCtx = spark.sqlContext
    val text =
      "the quick brown fox jumps over the lazy dog and runs far away home today"
    val mem = MemoryStream[(Long, String)]
    val keyed = graft.queries.TextDedup.bandKeyedDocs(
      mem.toDF().toDF("doc_id", "text")).as[KeyedDoc]
    val query = Streams.incrementalDedup(keyed)
      .writeStream.format("memory").queryName("lsh_inc").outputMode("append").start()
    try {
      mem.addData((1L, text),
        (2L, "completely unrelated words about ships sailing across the wide open sea"))
      query.processAllAvailable()
      mem.addData((3L, text)) // identical doc, later micro-batch
      query.processAllAvailable()
      val dups = spark.table("lsh_inc").collect()
        .filter(_.getAs[Boolean]("isDuplicate"))
        .map(r => (r.getAs[Long]("canonical"), r.getAs[Long]("docId"))).distinct
      assert(dups.toSeq == Seq((1L, 3L))) // paired with first-seen, not doc 2
    } finally query.stop()
  }

  test("incrementalDedup on a batch Dataset (unified semantics)") {
    val out = Streams.incrementalDedup(Seq(
      KeyedDoc(7L, 10L), KeyedDoc(7L, 11L), KeyedDoc(8L, 12L)).toDS())
      .collect().map(v => v.docId -> (v.canonical, v.isDuplicate)).toMap
    assert(out(10L) == ((10L, false)) && out(11L) == ((10L, true)))
    assert(out(12L) == ((12L, false)))
  }

  test("windowedHistogram buckets counts per window (streaming A2)") {
    val df = Seq(
      (ts(0), 3.2), (ts(10), 3.9), (ts(20), 7.0),  // hour 0: bucket 3 ×2, 7 ×1
      (ts(70), 3.0)                                 // hour 1: bucket 3 ×1
    ).toDF("ts", "value")
    val out = Streams.windowedHistogram(df).collect()
      .map(r => (r.getTimestamp(0).getTime / 3600000, r.getInt(1)) -> r.getLong(2)).toMap
    assert(out((0L, 3)) == 2L && out((0L, 7)) == 1L && out((1L, 3)) == 1L)
  }
}
