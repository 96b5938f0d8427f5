package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Totality of the whole text-query family over adversarial documents:
  * empty strings, whitespace runs (split(" ") produces empty tokens),
  * single tokens, unicode, a null text, and one pathologically long
  * token. Nothing here asserts specific statistics — the DuckDB oracle
  * owns values — only that every query COMPLETES under ANSI with sane
  * row counts and the documented null/short-doc contracts (the class of
  * crash NOTES sharp edges #2/#15 came from). */
class TextEdgeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_textedge")
    Seq(
      (1L, "", "en", "src0"),
      (2L, " ", "en", "src0"),
      (3L, "   ", "zh", "src1"),
      (4L, "one", "en", "src0"),
      (5L, "one two", "fr", "src1"),
      (6L, "a  b   c", "en", "src0"), // empty tokens between runs
      (7L, "düsseldorf 北京 naïve こんにちは emoji🙂 mixed", "de", "src2"),
      (8L, ("x" * 5000) + " tail", "en", "src0"), // one 5k-char token
      (9L, null.asInstanceOf[String], "en", "src0"),
      (10L, "the quick brown fox jumps over the lazy dog again and again", "en", "src0"),
      (11L, "the quick brown fox jumps over the lazy dog again and again", "en", "src1")
    ).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", coalesce(length(col("text")), lit(0L)))
      .write.mode("overwrite").parquet(d.resolve("documents.parquet").toString)
    d.toString
  }

  private val names = Seq(
    "x1_token_stats", "x2_quality_score", "x3_langid", "x4_fingerprint",
    "x14_repetition", "d1_exact_dedup", "d2_minhash", "d3_lsh_pairs",
    "d4_jaccard_verify", "d5_simhash", "d7_dedup_resolve",
    "d8_ngram_hotspots", "x6_decontaminate", "x15_bloom_decontaminate",
    "x16_dup_spans", "x8_boiler_fraction", "x9_chunk_pack", "x13_shuffle_shard")

  test("every text query is total over adversarial documents (ANSI on)") {
    val all = TextDedup.queries ++ Curation.queries
    names.foreach { n =>
      val out = all(n)(spark, dir)
      val rows = out.collect() // must not throw
      assert(rows != null, n)
    }
  }

  test("adversarial docs keep the documented contracts") {
    // per-doc queries keep every NON-NULL-text doc (null text is a
    // no-document row; whether it surfaces is each query's null contract,
    // but it must never crash)
    val x1 = TextDedup.queries("x1_token_stats")(spark, dir).collect()
    assert(x1.length == 11) // row preserved even for null text
    // exact dup group: docs 10/11 collapse to one canonical
    val d1 = TextDedup.queries("d1_exact_dedup")(spark, dir)
      .filter(col("n_copies") >= 2).collect()
    assert(d1.exists(_.getAs[Long]("n_copies") == 2L))
    // short/null docs never reach LSH pairs (null-signature filter)
    val d3 = TextDedup.queries("d3_lsh_pairs")(spark, dir).collect()
    val pairDocs = d3.flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(pairDocs.subsetOf(Set(10L, 11L)),
      s"short docs leaked into LSH pairs: $pairDocs")
    // the dup pair verifies at jaccard 1.0
    val d4 = TextDedup.queries("d4_jaccard_verify")(spark, dir).collect()
    assert(d4.exists(r => r.getLong(0) == 10L && r.getLong(1) == 11L &&
      r.getDouble(2) == 1.0))
  }
}
