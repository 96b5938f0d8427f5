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

  test("decontaminateStream over a MemoryStream equals batch decontamination") {
    implicit val sqlCtx = spark.sqlContext
    val evalText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (0L, evalText),                                        // eval (0 % 17 == 0)
      (1L, evalText),                                        // full copy
      (2L, "alpha beta gamma delta epsilon nope nada zip x y"), // partial
      (3L, "one two three four five six seven eight nine ten"))
    val batchDf = docs.toDF("doc_id", "text")
    val pool = graft.queries.Curation.evalPool(batchDf).collect().map(_.getLong(0)).toSeq
    val expected = graft.queries.Curation.decontaminate(batchDf, minShared = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val mem = MemoryStream[(Long, String)]
    val query = Streams.decontaminateStream(
        mem.toDF().toDF("doc_id", "text"), pool, minShared = 3)
      .writeStream.format("memory").queryName("decontam").outputMode("append").start()
    try {
      // corpus docs arrive over two micro-batches
      mem.addData((1L, docs(1)._2), (2L, docs(2)._2))
      query.processAllAvailable()
      mem.addData((3L, docs(3)._2))
      query.processAllAvailable()
      val got = spark.table("decontam").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"stream $got vs batch $expected")
      assert(got.contains(1L) && got.contains(2L) && !got.contains(3L))
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

  test("streamingBlockCompress equals the batch automaton, with in-window reorder") {
    import graft.operators.{BlockCompress, GvcfRecord}
    implicit val sqlCtx = spark.sqlContext
    def trec(min: Long, chrom: String, pos: Long, gq: Int,
             pass: Boolean = false): TimedGvcfRecord =
      TimedGvcfRecord(ts(min), chrom, pos, pos + 1, gq, 30, Seq(0, 10, 100), pass)
    // chrom 1: two mergeable bands split by a PASS; the pos=3 record
    // arrives a BATCH LATE but inside the 10-minute watermark window, so
    // the buffer must reorder it before the automaton sees it
    val batch1 = Seq(trec(0, "1", 1, 20), trec(1, "1", 2, 22),
      trec(3, "1", 10, 50, pass = true), trec(2, "2", 1, 30))
    val batch2 = Seq(trec(2, "1", 3, 21), trec(4, "1", 11, 40),
      trec(5, "1", 12, 41), trec(6, "1", 20, 60, pass = true),
      trec(5, "2", 2, 31), trec(7, "2", 9, 70, pass = true))
    // sentinel PASS records with far-future timestamps push the watermark
    // past every real record so each group flushes (two rounds: one to
    // raise the watermark, one to process under it)
    val sent1 = Seq(trec(1000, "1", 900, 50, pass = true),
      trec(1000, "2", 900, 50, pass = true))
    val sent2 = Seq(trec(2000, "1", 901, 50, pass = true),
      trec(2000, "2", 901, 50, pass = true))

    val mem = MemoryStream[TimedGvcfRecord]
    val query = Streams.streamingBlockCompress(mem.toDS(), mergeGqThreshold = 8)
      .writeStream.format("memory").queryName("w2stream").outputMode("append").start()
    try {
      Seq(batch1, batch2, sent1, sent2).foreach { b =>
        mem.addData(b: _*)
        query.processAllAvailable()
      }
      val streamed = spark.table("w2stream")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getInt(3), r.getLong(6)))
        .filter(_._2 < 900).sorted.toSeq
      val real = (batch1 ++ batch2).map(t =>
        GvcfRecord(t.chrom, t.pos, t.end, t.gq, t.dp, t.pl, t.pass, t.isRefCall))
      val batch = BlockCompress.compress(real.toDS(), 8).collect()
        .map(b => (b.chrom, b.pos, b.end, b.minGq, b.nRecords)).sorted.toSeq
      assert(streamed == batch)
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

  test("incrementalDedupTtl evicts idle keys; late twins become fresh canonicals") {
    implicit val sqlCtx = spark.sqlContext
    def t(min: Long) = new Timestamp(min * 60000L)
    val mem = MemoryStream[TimedKeyedDoc]
    // ttl 30 min, watermark 0 (no reorder slack needed here)
    val query = Streams.incrementalDedupTtl(mem.toDS(), ttlMillis = 30 * 60000L,
        watermark = "0 minutes")
      .writeStream.format("memory").queryName("dedupttl").outputMode("append").start()
    try {
      // start past minute 0: a row at the initial watermark (0) would be
      // dropped by the pre-state late filter
      mem.addData(TimedKeyedDoc(t(5), 100L, 1L))
      query.processAllAvailable()
      // within TTL: still the same canonical
      mem.addData(TimedKeyedDoc(t(10), 100L, 2L))
      query.processAllAvailable()
      // advance the watermark far past t(10)+30min: key 100 expires.
      // (needs a row on ANOTHER key — watermark is global)
      mem.addData(TimedKeyedDoc(t(120), 200L, 3L))
      query.processAllAvailable()
      // after expiry: doc 9 under key 100 must start a NEW cluster
      mem.addData(TimedKeyedDoc(t(125), 100L, 9L))
      query.processAllAvailable()
      val rows = spark.table("dedupttl").collect()
        .map(r => r.getAs[Long]("docId") ->
          (r.getAs[Long]("canonical"), r.getAs[Boolean]("isDuplicate"))).toMap
      assert(rows(1L) == ((1L, false)))
      assert(rows(2L) == ((1L, true)), "arrival inside TTL joins the cluster")
      assert(rows(9L) == ((9L, false)), "arrival after eviction starts fresh")
    } finally query.stop()
  }

  test("streamingHeavyHitters keeps a frequent token across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TokenEvent]
    val query = Streams.streamingHeavyHitters(mem.toDS(), k = 8)
      .writeStream.format("memory").queryName("hh").outputMode("update").start()
    try {
      // batch 1: "hot" 5 times + unique junk
      mem.addData(Seq.fill(5)(TokenEvent("en", "hot")) ++
        (1 to 20).map(i => TokenEvent("en", s"j1_$i")): _*)
      query.processAllAvailable()
      // batch 2: more junk — hot must survive in state across batches
      mem.addData(Seq.fill(5)(TokenEvent("en", "hot")) ++
        (1 to 20).map(i => TokenEvent("en", s"j2_$i")): _*)
      query.processAllAvailable()
      val snap = spark.sql(
        "SELECT token, minCount FROM hh WHERE lang = 'en'").collect()
      // last Update-mode emission for the group: hot present, k respected
      val latest = snap.map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(latest.contains("hot"), "frequent token must survive both batches")
      assert(latest("hot") >= 2L, "hot's counter reflects both batches (minus MG decrements)")
    } finally query.stop()
  }

  test("Vcf.readStream ingests files incrementally through the batch parse pipeline") {
    val d = java.nio.file.Files.createTempDirectory("graftvcfstream")
    def vcf(chrom: String, n: Int): String =
      (Seq("##fileformat=VCFv4.2",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1") ++
        (1 to n).map(i =>
          s"$chrom\t${i * 10}\t.\tA\tT\t50\tPASS\tDP=$i\tGT:DP\t0/1:$i"))
        .mkString("\n")
    java.nio.file.Files.writeString(d.resolve("part1.vcf"), vcf("chr1", 5))
    val stream = graft.sources.Vcf.readStream(spark, d.toString + "/*.vcf")
      .select("chrom", "pos", "dp")
    val query = stream.writeStream.format("memory").queryName("vcfstream")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM vcfstream").head.getLong(0) == 5L)
      // a newly-landed file parses in the next micro-batch only
      java.nio.file.Files.writeString(d.resolve("part2.vcf"), vcf("chr2", 3))
      query.processAllAvailable()
      val rows = spark.sql(
        "SELECT chrom, count(*) AS n, sum(dp) AS dp FROM vcfstream GROUP BY chrom")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(rows("chr1") == ((5L, 15L)) && rows("chr2") == ((3L, 6L)))
    } finally query.stop()
  }
}
