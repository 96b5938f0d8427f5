package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Fingerprint-keyed parquet store of the corpus-derived artifacts every
  * curation consumer shares at a real lake: MinHash signatures, the
  * (doc_id, term, tf) term-frequency table, the corpus row count recorded
  * at ingest, and the previous resolve's duplicate-cluster labels.
  *
  * This is the round-13 AtRestProbe economics promoted to first-class,
  * oracle-gated queries (VERDICT r13 #1/#2): an ingest job pays the
  * corpus tokenize/hash pass ONCE (`x19_atrest_build`, `x22_labels_build`
  * — both price the build honestly by overwriting unconditionally), and
  * every consumer (`x20_atrest_tfidf`, `x21_atrest_pairs`,
  * `x23_atrest_resolve`) scans the compact columnar tables instead of
  * re-deriving from raw text. The consumers' outputs are identical by
  * construction to their self-contained siblings (x12, d3, x18), so those
  * queries' DuckDB oracles gate them VERBATIM — the x18 oracle-reuse
  * trick, now covering the whole at-rest family.
  *
  * Freshness without a catalog: the store directory is keyed by a
  * fingerprint of the backing `documents.parquet` (every file's name,
  * length, and mtime). A rebuilt corpus gets a fresh store; stores for a
  * superseded fingerprint of the same input path are swept best-effort.
  * At a real lake this role is played by the table catalog's snapshot id;
  * the fingerprint is the standalone equivalent, and it makes a stale
  * read structurally impossible rather than procedurally avoided.
  *
  * Consumers ENSURE (build-if-absent, `_SUCCESS`-gated) so every
  * registered query stays self-contained for the correctness gate; in the
  * bench's sorted order the build steps (x19 < x20/x21, x22 < x23) run
  * first, so consumer timings price exactly the scan-side cost — the
  * steady state the at-rest design exists for.
  */
object AtRest {

  /** Store root — override with GRAFT_ATREST_DIR (e.g. a per-CI scratch). */
  private def root: String =
    sys.env.getOrElse("GRAFT_ATREST_DIR",
      s"${sys.props("java.io.tmpdir")}/graft_atrest_store")

  /** (input-path id, content fingerprint) of `d`'s documents table: the id
    * keys "same input path" (so stale fingerprints of the same corpus can
    * be swept), the fingerprint keys "same bytes" (name+len+mtime of every
    * file under the table — Hadoop FS, so object stores work the same). */
  private def fingerprint(s: SparkSession, d: String): (String, String) = {
    val conf = s.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(s"$d/documents.parquet")
    val fs = p.getFileSystem(conf)
    def hex(md: java.security.MessageDigest) =
      md.digest().map("%02x".format(_)).mkString
    val md = java.security.MessageDigest.getInstance("MD5")
    def walk(path: org.apache.hadoop.fs.Path): Unit = {
      val st = fs.getFileStatus(path)
      if (st.isDirectory)
        fs.listStatus(path).sortBy(_.getPath.getName).foreach(c => walk(c.getPath))
      else md.update(
        s"${path.getName}:${st.getLen}:${st.getModificationTime};".getBytes("UTF-8"))
    }
    walk(p)
    val idMd = java.security.MessageDigest.getInstance("MD5")
    idMd.update(fs.makeQualified(p).toString.getBytes("UTF-8"))
    (hex(idMd).take(12), hex(md).take(16))
  }

  /** The store dir for `d`, sweeping superseded-fingerprint siblings of the
    * same input path (best-effort — a concurrent JVM's in-flight build of a
    * CURRENT store is never touched: the sweep only removes dirs whose
    * fingerprint differs from the live one). */
  def storeDir(s: SparkSession, d: String): String = {
    val (id, fp) = fingerprint(s, d)
    val dir = new java.io.File(root)
    val live = s"${id}_$fp"
    Option(dir.listFiles()).foreach(_.foreach { f =>
      if (f.getName.startsWith(s"${id}_") && f.getName != live)
        try deleteRecursively(f) catch { case _: Throwable => () }
    })
    s"$root/$live"
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  private def present(path: String): Boolean =
    new java.io.File(s"$path/_SUCCESS").isFile

  // one lock per JVM: Verify/Bench are sequential, but a racing ensure from
  // a parallel test suite must not double-write the same table
  private val buildLock = new Object

  def sigPath(s: SparkSession, d: String): String = s"${storeDir(s, d)}/signatures"
  def tfPath(s: SparkSession, d: String): String = s"${storeDir(s, d)}/tf"
  def metaPath(s: SparkSession, d: String): String = s"${storeDir(s, d)}/meta"
  /** Labels of the OLD batch (doc_id % 5 != 0 — the registered queries'
    * stand-in for "yesterday's corpus"); the suffix names the batch
    * predicate so a changed definition can never silently reuse labels
    * computed under the previous one. */
  def labelsPath(s: SparkSession, d: String): String =
    s"${storeDir(s, d)}/labels_notmod5"

  /** Signature build: derives from the session token-hash memo, so a
    * session that already hashed the corpus (any d-family query) pays only
    * the signature fold + write here — the ONE-md5-pass-per-session
    * contract extends to the ingest write. */
  private def buildSignatures(s: SparkSession, d: String, path: String): Unit =
    TextDedup.signatureFrameFromTh(Curation.cachedTokenHashes(s, d))
      .write.mode("overwrite").parquet(path)

  private def buildTf(s: SparkSession, d: String, path: String): Unit =
    TextDedup.termFrequenciesToParquet(Tables.documents(s, d), path)

  /** n_docs recorded at ingest: the idf denominator counts EVERY corpus row
    * (null/too-short texts produce no tf rows but still count — the x12
    * caveat), so it must be captured here, not re-derived from tf. */
  private def buildMeta(s: SparkSession, d: String, path: String): Unit = {
    val n = Tables.documents(s, d).count()
    s.range(1).select(lit(n).as("n_docs")).write.mode("overwrite").parquet(path)
  }

  private def buildLabels(s: SparkSession, d: String, path: String): Unit = {
    val mh = s.read.parquet(ensureSignatures(s, d))
    graft.operators.Dedup.connectedComponents(
      TextDedup.bandStarEdges(mh.filter(pmod(col("doc_id"), lit(5)) =!= 0)))
      .write.mode("overwrite").parquet(path)
  }

  private def ensure(path: String)(build: => Unit): String =
    buildLock.synchronized {
      if (!present(path)) build
      path
    }

  def ensureSignatures(s: SparkSession, d: String): String =
    ensure(sigPath(s, d))(buildSignatures(s, d, sigPath(s, d)))
  def ensureTf(s: SparkSession, d: String): String =
    ensure(tfPath(s, d))(buildTf(s, d, tfPath(s, d)))
  def ensureMeta(s: SparkSession, d: String): String =
    ensure(metaPath(s, d))(buildMeta(s, d, metaPath(s, d)))
  def ensureLabels(s: SparkSession, d: String): String =
    ensure(labelsPath(s, d))(buildLabels(s, d, labelsPath(s, d)))

  private def readNDocs(s: SparkSession, d: String): Long =
    s.read.parquet(ensureMeta(s, d)).head().getLong(0)

  /** One-row-per-table summary of the WRITTEN store — read back from the
    * parquet files, so the checksums verify what is actually at rest, not
    * the frame that was handed to the writer. */
  private def storeSummary(s: SparkSession, d: String): DataFrame = {
    val mhSum = (1 to TextDedup.K).map(i => col(s"mh$i")).reduce(_ + _)
    val sig = s.read.parquet(sigPath(s, d))
      .agg(count(lit(1)).as("n_rows"), sum(mhSum).as("checksum"))
      .select(lit("signatures").as("tbl"), col("n_rows"), col("checksum"))
    val tf = s.read.parquet(tfPath(s, d))
      .agg(count(lit(1)).as("n_rows"), sum(col("tf")).as("checksum"))
      .select(lit("tf").as("tbl"), col("n_rows"), col("checksum"))
    val meta = s.read.parquet(metaPath(s, d))
      .select(lit("meta").as("tbl"), lit(1L).as("n_rows"),
        col("n_docs").as("checksum"))
    sig.unionByName(tf).unionByName(meta)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ----- X19: the ingest build step — write signatures + tf + n_docs,
    // UNCONDITIONALLY (mode overwrite), so the bench prices the one-time
    // build honestly every run; consumers then scan. The result is a
    // checksummed inventory of the written store, re-read from disk —
    // rows and sums the oracle recomputes from raw text, so a corrupted
    // or partial write cannot pass.
    "x19_atrest_build" -> { (s, d) =>
      buildSignatures(s, d, sigPath(s, d))
      buildTf(s, d, tfPath(s, d))
      buildMeta(s, d, metaPath(s, d))
      storeSummary(s, d)
    },
    // ----- X20: TF-IDF top-k from the at-rest tf table + recorded n_docs.
    // Output == x12 by construction (same downstream over the same tf
    // rows); x12's oracle gates it verbatim. Cost = two scans of the
    // 3-column tf table — the explode + first groupBy never rerun.
    "x20_atrest_tfidf" -> { (s, d) =>
      val tf = ensureTf(s, d)
      TextDedup.tfidfTopKFromParquet(s, tf, readNDocs(s, d))
    },
    // ----- X21: LSH candidate pairs + est-sim from the at-rest signature
    // table — the pair pass every re-run/backfill executes at a lake
    // (AtRestProbe r13: −47% vs from-raw). Same band automaton as d3,
    // same oracle.
    "x21_atrest_pairs" -> { (s, d) =>
      TextDedup.estSimPairsGrouped(s, s.read.parquet(ensureSignatures(s, d)))
        .select(col("doc_a"), col("doc_b"), roundSim(col("est_sim")).as("est_sim"))
    },
    // ----- X22: the labels build step — "yesterday's" resolve (CC over
    // the old batch's star edges, signatures read from the store) written
    // at rest, unconditionally. Gated by the from-scratch recursive SQL
    // over the old batch — a full-strength oracle for the stored labels
    // themselves.
    "x22_labels_build" -> { (s, d) =>
      buildLabels(s, d, labelsPath(s, d))
      s.read.parquet(labelsPath(s, d))
        .select(col("id").as("doc_id"), col("comp").as("canonical"))
    },
    // ----- X23: the incremental resolve the x18 scaffolding exists for
    // (VERDICT r13 #2): read yesterday's labels from the store, pay only
    // the batch-proportional x17 band pass + ONE star-seeded CC. Output
    // == x18 == from-scratch d7 (the component-equivalence proof at the
    // x18 registration), so d7's oracle gates the stored-label path
    // verbatim.
    "x23_atrest_resolve" -> { (s, d) =>
      val labels = s.read.parquet(ensureLabels(s, d))
      val sig = s.read.parquet(ensureSignatures(s, d))
      val newEdges = TextDedup.incrementalEstSimPairs(s, sig,
        pmod(col("doc_id"), lit(5)) === 0)
        .select("doc_a", "doc_b")
      graft.operators.Dedup.incrementalComponents(labels, newEdges)
        .select(col("id").as("doc_id"), col("comp").as("canonical"))
    }
  )

  private val tfCte =
    """tfq AS (SELECT doc_id, term, count(*) AS tf
         FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
               FROM documents)
         GROUP BY 1, 2)"""

  val oracles: Map[String, String] = Map(
    // the oracle recomputes every table's row count and content sum from
    // raw text — mh columns via the same md5 recipe d2 pins
    "x19_atrest_build" ->
      s"""${TextDedup.mhCte}, $tfCte
          SELECT 'meta' AS tbl, CAST(1 AS BIGINT) AS n_rows,
                 (SELECT count(*) FROM documents) AS checksum
          UNION ALL
          SELECT 'signatures', (SELECT count(*) FROM mh),
                 CAST((SELECT sum(${(1 to TextDedup.K).map(i => s"mh$i").mkString(" + ")}) FROM mh) AS BIGINT)
          UNION ALL
          SELECT 'tf', (SELECT count(*) FROM tfq),
                 CAST((SELECT sum(tf) FROM tfq) AS BIGINT)""",
    "x20_atrest_tfidf" -> TextDedup.x12Sql,
    "x21_atrest_pairs" -> TextDedup.d3Sql,
    "x22_labels_build" -> TextDedup.d7SqlOver(
      TextDedup.mhCte.replace("FROM documents",
        "FROM documents WHERE doc_id % 5 <> 0")),
    "x23_atrest_resolve" -> TextDedup.d7Sql
  )
}
