package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel
import graft.Tables

/** ANN stage profiler (round-8 verdict task 5): splits e2/e3/e4 into
  * their pipeline stages — vector scan+norm, IVF cell assignment, PQ
  * encode, candidate scan (IVF probe / ADC), exact re-rank — and times
  * each against the full as-shipped queries, so "assignment is
  * recomputed per query" stops being a guess and becomes a measured
  * fraction. Stage frames are persisted between timings so each stage
  * time is the stage's own cost, not its upstream's.
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/sf100 runMain graft.queries.AnnProfile
  */
object AnnProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val spark = graft.Spark.session("ann-profile")

    def time(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[annprofile] $label%-28s $sec%7.1f s  (rows=$n)")
      sec
    }

    // ---- full queries as shipped (every stage recomputed per query) ----
    val fullE2 = time("full:e2_ivf_ann")(Similarity.queries("e2_ivf_ann")(spark, dir).count())
    val fullE3 = time("full:e3_pq_ann")(Similarity.queries("e3_pq_ann")(spark, dir).count())
    val fullE4 = time("full:e4_ivf_pq")(Similarity.queries("e4_ivf_pq")(spark, dir).count())

    // ---- stage decomposition -------------------------------------------
    val n = Tables.embeddings(spark, dir).count()
    val nCells = Similarity.cellCountForAnn(n)
    println(s"[annprofile] N=$n ann_cells=$nCells")

    val all = Similarity.vecs(spark, dir).persist(StorageLevel.MEMORY_AND_DISK)
    val tScan = time("stage:vec-scan+norm")(all.count())

    val cents = all.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
    val assigned = Similarity.assignToCellsAuto(all, cents, nCells)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tAssign = time("stage:ivf-assign")(assigned.count())

    // e2 probe given a materialized assignment
    val TOPK = 5
    val q2 = assigned.filter(col("vec_id") % 100 === 0 && col("vec_id") < 6400)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nrm").as("qnrm"), col("cid").as("qcid"))
    val wRank = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id").asc)
    val tProbe = time("stage:e2-probe+rank") {
      assigned.join(broadcast(q2), col("cid") === col("qcid") && col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          round(Similarity.dot(col("v"), col("qv")) / (col("nrm") * col("qnrm")), 6).as("sim"))
        .withColumn("rank", row_number().over(wRank))
        .filter(col("rank") <= TOPK)
        .count()
    }

    // PQ encode given the materialized scan
    val codes = Similarity.pqEncode(all).persist(StorageLevel.MEMORY_AND_DISK)
    val tEncode = time("stage:pq-encode")(codes.count())

    // e3 ADC scan given materialized codes
    val tAdc = time("stage:e3-adc+rank") {
      val cb = Similarity.pqCodebook(all)
      val lutOf = Similarity.pqLutUdf(all, cb)
      val q3 = all.filter(col("vec_id") % 100 === 0 && col("vec_id") < 3200)
        .select(col("vec_id").as("qid"), lutOf(col("v")).as("lut"))
      val w = Window.partitionBy("qid").orderBy(col("asim").desc, col("vec_id").asc)
      codes.crossJoin(broadcast(q3))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          round(Similarity.adcSim(col("codes"), col("lut")), 6).as("asim"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= TOPK)
        .count()
    }

    // e4 cell-pruned ADC + exact rerank given materialized assignment+codes
    val tE4Tail = time("stage:e4-adc+rerank") {
      val cb = Similarity.pqCodebook(all)
      val lutOf = Similarity.pqLutUdf(all, cb)
      val codesCell = codes.join(assigned.select("vec_id", "cid"), Seq("vec_id"))
      val q4 = assigned.filter(col("vec_id") % 100 === 0 && col("vec_id") < 6400)
        .select(col("vec_id").as("qid"), col("cid").as("qcid"),
          lutOf(col("v")).as("lut"), col("v").as("qv"), col("nrm").as("qnrm"))
      val wAdc = Window.partitionBy("qid").orderBy(col("asim").desc, col("vec_id").asc)
      val cand = codesCell.join(broadcast(q4.select("qid", "qcid", "lut")),
          col("cid") === col("qcid") && col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          round(Similarity.adcSim(col("codes"), col("lut")), 6).as("asim"))
        .withColumn("_r", row_number().over(wAdc))
        .filter(col("_r") <= 50)
        .select("qid", "vec_id")
      val wExact = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id").asc)
      cand.join(all, Seq("vec_id"))
        .join(broadcast(q4.select(col("qid"), col("qv"), col("qnrm"))), Seq("qid"))
        .select(col("qid"), col("vec_id"),
          round(Similarity.dot(col("v"), col("qv")) / (col("nrm") * col("qnrm")), 6).as("sim"))
        .withColumn("rank", row_number().over(wExact))
        .filter(col("rank") <= TOPK)
        .count()
    }

    val shared = tScan + tAssign + tEncode
    println(f"[annprofile] SUMMARY full(e2+e3+e4)=${fullE2 + fullE3 + fullE4}%.1f s; " +
      f"stages: scan=$tScan%.1f assign=$tAssign%.1f encode=$tEncode%.1f " +
      f"e2probe=$tProbe%.1f e3adc=$tAdc%.1f e4tail=$tE4Tail%.1f")
    println(f"[annprofile] shared-prep (scan+assign+encode)=$shared%.1f s vs " +
      f"sum-of-tails=${tProbe + tAdc + tE4Tail}%.1f s — shared-index residency " +
      f"saves ~${fullE2 + fullE3 + fullE4 - (shared + tProbe + tAdc + tE4Tail)}%.1f s of recompute")
    spark.stop()
  }
}
