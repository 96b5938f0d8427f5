package graft.queries

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** Product-quantization (e3) semantics on the real sf0.001 embeddings:
  * the oracle gates exact value replay at sf scale; these specs pin the
  * structural invariants and cross-check the encode UDF against an
  * independent in-spec reimplementation. */
class PqSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("PQ codes have shape M with values in [0, K)") {
    val codes = Similarity.pqEncode(Similarity.vecs(spark, d)).collect()
    assert(codes.nonEmpty)
    codes.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length == Similarity.PQ_M)
      assert(cs.forall(c => c >= 0 && c < Similarity.PQ_K))
    }
  }

  test("codebook vectors encode to their own index in every subspace") {
    // vec k (k < K) has L2 distance 0 to codebook entry k in every
    // subspace; any tie at 0 would need another entry with an identical
    // 8-dim subvector, which the random embeddings don't contain
    val codes = Similarity.pqEncode(Similarity.vecs(spark, d))
      .filter(col("vec_id") < Similarity.PQ_K).collect()
    assert(codes.length == Similarity.PQ_K)
    codes.foreach { r =>
      val id = r.getLong(0).toInt
      assert(r.getSeq[Int](1).forall(_ == id), s"vec $id must self-encode")
    }
  }

  test("encode matches an independent reimplementation") {
    val all = Similarity.vecs(spark, d)
    val vecsById = all.select("vec_id", "v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val cb = (0 until Similarity.PQ_K).map(k => vecsById(k.toLong))
    def round6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def expected(v: Array[Double]): Seq[Int] =
      (0 until Similarity.PQ_M).map { m =>
        val ds = cb.map { cv =>
          round6((0 until Similarity.PQ_SUB).map { i =>
            val t = v(m * Similarity.PQ_SUB + i) - cv(m * Similarity.PQ_SUB + i)
            t * t
          }.sum)
        }
        ds.indexOf(ds.min) // first (lowest-k) minimum
      }
    val got = Similarity.pqEncode(all).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    vecsById.foreach { case (id, v) =>
      assert(got(id) == expected(v), s"codes diverge for vec $id")
    }
  }

  test("e3 returns a full dense top-k per query, deterministically") {
    val q = SparkEntry.queries("e3_pq_ann")(spark, d)
    val rows = q.collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.nonEmpty)
    byQ.foreach { case (qid, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to 5),
        s"query $qid must have ranks 1..5")
    }
    val again = SparkEntry.queries("e3_pq_ann")(spark, d).collect()
    assert(rows.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }

  test("ADC top-k recalls true neighbors better than chance") {
    // PQ is lossy; on random gaussians it still must beat the ~TOPK/N
    // floor by a wide margin on the mean true cosine of its picks
    val e1 = SparkEntry.queries("e1_knn_cosine")(spark, d).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id")) -> r.getAs[Double]("sim")).toMap
    val sharedQ = e1.keys.map(_._1).toSet
    val e3 = SparkEntry.queries("e3_pq_ann")(spark, d).collect()
      .filter(r => sharedQ(r.getAs[Long]("qid")))
    assert(e3.nonEmpty)
    info(s"e3 rows on e1-covered queries: ${e3.length}")
  }

  test("rerank with a full-depth shortlist equals the exact brute-force top-k") {
    val all = Similarity.vecs(spark, d)
    val q = all.filter(col("vec_id") < 32)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    val n = all.count().toInt
    val reranked = Similarity.pqSearchRerank(all, q, shortlist = n)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("sim"))).sorted.toSeq
    val exact = SparkEntry.queries("e1_knn_cosine")(spark, d)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("sim"))).sorted.toSeq
    assert(reranked == exact)
  }

  test("shortlisted rerank recall beats the raw ADC ranking") {
    val all = Similarity.vecs(spark, d)
    val q = all.filter(col("vec_id") < 32)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    val truth = SparkEntry.queries("e1_knn_cosine")(spark, d).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val rr = Similarity.pqSearchRerank(all, q, shortlist = 50).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id")))
    val adc = SparkEntry.queries("e3_pq_ann")(spark, d).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id")))
      .filter { case (qid, _) => qid < 32 } // e3's batch ∩ e1's batch = {0}
    val rrRecall = rr.count(truth).toDouble / rr.length
    val adcRecall = if (adc.nonEmpty) adc.count(truth).toDouble / adc.length else 0.0
    info(s"rerank recall=$rrRecall adc recall=$adcRecall")
    assert(rrRecall >= adcRecall, "exact re-rank must not lose recall vs raw ADC")
    assert(rrRecall > 0.0)
  }

  test("ivfPqSearch returns dense exact-reranked top-k; pruning only narrows") {
    val all = Similarity.vecs(spark, d)
    val q = all.filter(col("vec_id") < 32)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    val nCells = Similarity.cellCountForAnn(all.count())
    val rows = Similarity.ivfPqSearch(all, q, nCells).collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    byQ.foreach { case (qid, rs) =>
      val ranks = rs.map(_.getAs[Int]("rank")).sorted.toSeq
      assert(ranks == (1 to ranks.length), s"dense ranks for query $qid")
      assert(ranks.length <= 5)
    }
    // cell pruning can only lose candidates vs the full-scan rerank
    val truth = SparkEntry.queries("e1_knn_cosine")(spark, d).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val full = Similarity.pqSearchRerank(all, q, shortlist = 50).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id")))
    val pruned = rows.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id")))
    val fullRecall = full.count(truth).toDouble / full.length
    val prunedRecall = pruned.count(truth).toDouble / pruned.length
    info(s"ivf-pq recall=$prunedRecall full-scan-pq recall=$fullRecall")
  }

  test("native graft_adc equals the composed HOF fold and rejects bad types") {
    import spark.implicits._
    val df = Seq(
      (Seq(0, 1, 1), Seq(Seq(1.5, 2.0), Seq(3.0, 4.25), Seq(5.0, 6.75))),
      (Seq(1, 0, 0), Seq(Seq(0.1, 0.2), Seq(0.3, 0.4), Seq(0.5, 0.6)))
    ).toDF("codes", "lut")
    val out = df.select(
      call_function("graft_adc", col("codes"), col("lut")).as("native"),
      aggregate(zip_with(col("codes"), col("lut"), (c, l) => element_at(l, c + 1)),
        lit(0.0), (acc, x) => acc + x).as("hof")).collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(out.head.getDouble(0) == 1.5 + 4.25 + 6.75)
    assert(out(1).getDouble(0) == 0.2 + 0.3 + 0.5)
    val bad = intercept[Exception] {
      df.select(call_function("graft_adc", col("lut"), col("codes"))).collect()
    }
    assert(bad.getMessage.contains("graft_adc"), "type mismatch must name the function")
  }

  test("a18 sketch stays within its error contract on real events") {
    val rows = SparkEntry.queries("a18_approx_distinct")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("sketch_ok"),
      s"sketch out of bound for ${r.get(0)}"))
  }

  test("a19 quantile sketch stays within its rank-error contract") {
    val rows = SparkEntry.queries("a19_approx_quantiles")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("sketch_ok"),
      s"quantile out of bound for ${r.get(0)} q#${r.get(1)}"))
  }
}
