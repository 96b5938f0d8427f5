package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.{BlockCompress, GvcfBlock, GvcfRecord}

/** A document keyed for dedup (key = content fingerprint / prefix hash). */
case class KeyedDoc(key: Long, docId: Long)

/** A keyed document with the event time driving TTL state eviction. */
case class TimedKeyedDoc(ts: java.sql.Timestamp, key: Long, docId: Long)

/** A gVCF record with the ingestion timestamp that drives the stream's
  * watermark. Within a chromosome, `pos` order must agree with `ts` order
  * up to the watermark delay (the sequencer-append assumption): records
  * are buffered until the watermark passes their ts, then fed to the
  * automaton in pos order. */
case class TimedGvcfRecord(ts: java.sql.Timestamp, chrom: String, pos: Long,
                           end: Long, gq: Int, dp: Int, pl: Seq[Int],
                           pass: Boolean, isRefCall: Boolean = false)

/** Per-chromosome streaming W2 state: the open block plus the not-yet-safe
  * record buffer (ts at or past the watermark). */
case class W2State(open: Option[BlockCompress.OpenState],
                   buffer: Seq[TimedGvcfRecord])

/** Per-document dedup verdict against the streaming state. */
case class DedupVerdict(key: Long, docId: Long, canonical: Long,
                        isDuplicate: Boolean)

/** One token occurrence in a language-keyed stream. */
case class TokenEvent(lang: String, token: String)

/** A surviving Misra-Gries counter for (lang, token) after a micro-batch;
  * `minCount` is the sketch's conservative estimate (true count is within
  * +N/(k+1) of it). */
case class HhSnapshot(lang: String, token: String, minCount: Long)

/** Structured Streaming surface.
  *
  * The reference is pure batch (SURVEY.md §2.10) — nothing here is needed
  * for parity — but its ordered stateful scans have exact streaming
  * analogues, and a 100 TB deployment would ingest depth/variant records
  * continuously. This module provides the two shapes:
  *
  *  - W2 (GQ-band merge) == session windows with a gap condition →
  *    `session_window` + watermark;
  *  - A1/A2 histograms == windowed streaming aggregation.
  *
  * Both run identically on a batch DataFrame (Spark's unified semantics),
  * which is how the spec exercises them plus a MemoryStream run.
  */
object Streams {

  /** Watermarked session aggregation over an event stream — the streaming
    * form of Ordered.sessionize. Appends one row per closed session. */
  def sessionAgg(events: DataFrame, gap: String = "10 minutes",
                 watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("session"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("user_id"), col("session.start").as("session_start"),
        col("session.end").as("session_end"), col("n_events"), col("sum_value"))

  /** Streaming eval-set decontamination — the continuous-ingest form of
    * x6_decontaminate: the eval pool (small by construction — it is a
    * held-out benchmark) ships into every task as an array literal, and
    * each arriving document is flagged by a scalar distinct-shingle
    * intersection. NO state, NO shuffle, append-mode — the streaming
    * shape a contamination firewall in front of a training-data ingest
    * actually wants. Batch-equivalent to `Curation.decontaminate` on the
    * same pool (spec-proven). */
  def decontaminateStream(docs: DataFrame, pool: Seq[Long],
                          minShared: Int): DataFrame = {
    import graft.functions.Text
    docs
      .withColumn("_th", Text.tokenHashesFromText(col("text")))
      // sortedShingleSet is set-identical to the old array_distinct form
      // and the only consumer is size(array_intersect(...)) — order-free
      .withColumn("_sh", Text.sortedShingleSet(col("_th")))
      .select(col("doc_id"),
        size(array_intersect(col("_sh"), typedLit(pool))).cast("long").as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Streaming exact dedup — the continuous-ingest form of d1_exact_dedup:
    * `flatMapGroupsWithState` keyed on the content fingerprint; the first
    * document to arrive under a key becomes the canonical id (held in
    * O(1) state per distinct key, forever — the deployable
    * bounded-state form is [[incrementalDedupTtl]]), every later arrival
    * in ANY micro-batch is emitted
    * flagged as its duplicate. Runs identically on a batch Dataset
    * (unified semantics; state starts empty per group). */
  def incrementalDedup(docs: Dataset[KeyedDoc]): Dataset[DedupVerdict] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: Long, rows: Iterator[KeyedDoc], state: GroupState[Long]) => {
          var canon = state.getOption.getOrElse(Long.MinValue)
          // materialize before returning: state must be final when the
          // function exits, and the within-batch order must be stable
          val verdicts = rows.toSeq.sortBy(_.docId).map { d =>
            if (canon == Long.MinValue) canon = d.docId
            DedupVerdict(key, d.docId, canon, d.docId != canon)
          }
          state.update(canon)
          verdicts.iterator
        })
  }

  /** [[incrementalDedup]] with BOUNDED state: each dedup key's canonical
    * id expires `ttl` after the key's latest arrival (event time, so
    * eviction is deterministic and replay-safe — a processing-time TTL
    * would depend on wall clock). This is the piece that makes infinite-
    * corpus streaming dedup deployable: state size tracks the ACTIVE key
    * set, not the all-time key universe. Semantics after expiry are the
    * honest consequence: a duplicate arriving later than `ttl` after its
    * original's last sighting is treated as a fresh canonical (exactly
    * the window-bounded dedup guarantee, stated rather than hidden). */
  def incrementalDedupTtl(docs: Dataset[TimedKeyedDoc],
                          ttlMillis: Long = 3600000L,
                          watermark: String = "10 minutes"): Dataset[DedupVerdict] = {
    import docs.sparkSession.implicits._
    docs.withWatermark("ts", watermark)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: Long, rows: Iterator[TimedKeyedDoc], state: GroupState[(Long, Long)]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var (canon, maxTs) = state.getOption.getOrElse((Long.MinValue, Long.MinValue))
            val batch = rows.toSeq.sortBy(d => (d.ts.getTime, d.docId))
            val verdicts = batch.map { d =>
              if (canon == Long.MinValue) canon = d.docId
              DedupVerdict(key, d.docId, canon, d.docId != canon)
            }
            // expire `ttl` past the key's ALL-TIME latest event time, not
            // this batch's max: an out-of-order (within-watermark) older
            // event must never move the expiry backwards
            maxTs = math.max(maxTs, batch.map(_.ts.getTime).max)
            state.update((canon, maxTs))
            state.setTimeoutTimestamp(maxTs + ttlMillis)
            verdicts.iterator
          }
        })
  }

  /** Streaming W2 — the strict gVCF block-compression automaton run
    * CONTINUOUSLY: `flatMapGroupsWithState` keyed by chromosome, each
    * group holding the open block plus a small reorder buffer. On every
    * micro-batch the records whose event time the watermark has passed
    * are sorted by pos and folded through [[BlockCompress.step]] — the
    * exact batch transition function — and closed blocks are appended
    * downstream. Blocks therefore emit with bounded latency (watermark
    * delay) instead of at end-of-file, which is how a 100 TB gVCF firehose
    * compresses without ever landing raw.
    *
    * Caveats (inherent to the shape, documented not hidden): records later
    * than the watermark are dropped by Spark's pre-state filter, and each
    * chromosome's final open block stays in state until a later record
    * closes it (the batch reference never flushes it either,
    * compress_gvcf.py:135-213). */
  def streamingBlockCompress(records: Dataset[TimedGvcfRecord],
                             mergeGqThreshold: Int,
                             refcallGqThreshold: Int = 22,
                             watermark: String = "10 minutes"): Dataset[GvcfBlock] = {
    import records.sparkSession.implicits._
    records
      .withWatermark("ts", watermark)
      .groupByKey(_.chrom)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[TimedGvcfRecord], state: GroupState[W2State]) => {
          val st = state.getOption.getOrElse(W2State(None, Seq.empty))
          val wm = state.getCurrentWatermarkMs()
          // safe = strictly older than the watermark: nothing arriving later
          // can sort before these records
          val (ready, hold) = (st.buffer ++ rows).partition(_.ts.getTime < wm)
          var open = st.open
          val out = Seq.newBuilder[GvcfBlock]
          ready.sortBy(_.pos).foreach { t =>
            val (closed, next) = BlockCompress.step(
              open, GvcfRecord(t.chrom, t.pos, t.end, t.gq, t.dp, t.pl,
                t.pass, t.isRefCall),
              mergeGqThreshold, refcallGqThreshold)
            out ++= closed
            open = next
          }
          state.update(W2State(open, hold))
          out.result().iterator
        })
  }

  /** Streaming Misra-Gries heavy hitters — the continuous-ingest form of
    * x11: per-language counters bounded at `k` across ALL micro-batches
    * (`flatMapGroupsWithState`, Update mode), reusing the batch sketch's
    * transition function so the cross-batch guarantee is the same one
    * proven in HeavyHittersSpec: any token above 1/(k+1) of the stream so
    * far is always among the emitted candidates. Each batch re-emits the
    * group's refreshed candidate set; a downstream exact recount over the
    * candidates (the batch phase 2) turns a snapshot into exact counts. */
  def streamingHeavyHitters(toks: Dataset[TokenEvent],
                            k: Int = 256): Dataset[HhSnapshot] = {
    import toks.sparkSession.implicits._
    val mg = new graft.functions.MisraGries(k)
    toks.groupByKey(_.lang)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (lang: String, rows: Iterator[TokenEvent],
         state: GroupState[Map[String, Long]]) => {
          val buf = scala.collection.mutable.HashMap.empty[String, Long]
          state.getOption.foreach(m => buf ++= m)
          rows.foreach(r => mg.reduce(buf, r.token))
          state.update(buf.toMap)
          buf.toSeq.map { case (t, c) => HhSnapshot(lang, t, c) }.iterator
        })
  }

  /** Tumbling-window value histogram — the streaming form of the coverage
    * histogram (A2): per window, per integer-bucketed value, a count. */
  def windowedHistogram(events: DataFrame, window: String = "1 hour",
                        watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window).as("w"),
        col("value").cast("int").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"), col("bucket"), col("cnt"))
}
