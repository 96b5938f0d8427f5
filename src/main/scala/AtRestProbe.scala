import org.apache.spark.sql.functions._

/** Measured evidence for the at-rest artifact story (the lake-scale
  * sharing mechanism every memo scaladoc points at): what does the
  * one-time ingest write cost, and what do consumers save by scanning the
  * written table instead of re-deriving from raw text? Same-operator
  * A/Bs — the identical public downstream fed by the parquet artifact vs
  * by the raw corpus — so the delta IS the corpus hash/tokenize pass, not
  * an implementation difference. All consumer stages run cold
  * (Bench.coldReset) in one window. Usage: runMain AtRestProbe /tmp/sf100 [reps]
  */
object AtRestProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf100")
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = graft.Spark.session("atrest-probe")
    val td = graft.queries.TextDedup

    def docs = graft.Tables.documents(spark, d)
    def timed(name: String)(f: => Unit): Double = {
      graft.Bench.coldReset(spark)
      val t0 = System.nanoTime()
      f
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[atrest] $name%-30s $t%7.2f s")
      t
    }
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val tmp = java.nio.file.Files.createTempDirectory("graft_atrest").toString
    val sigDir = s"$tmp/signatures"
    val tfDir = s"$tmp/tf"
    val nDocs = docs.count() // also warms the parquet reader path

    for (rep <- 1 to reps) {
      println(s"[atrest] --- rep $rep ---")
      timed("ingest:signatures-write") { td.signaturesToParquet(docs, sigDir) }
      timed("ingest:tf-write") { td.termFrequenciesToParquet(docs, tfDir) }
      // full scored pair set (isNew = every doc) — identical downstream,
      // only the signature source differs
      timed("pairs:from-at-rest") {
        sink(td.incrementalEstSimPairs(spark,
          spark.read.parquet(sigDir), lit(true)))
      }
      timed("pairs:from-raw") {
        sink(td.incrementalEstSimPairs(spark,
          td.signatureFrame(docs), lit(true)))
      }
      // the x17 batch shape over both sources
      timed("x17:from-at-rest") {
        sink(td.incrementalEstSimPairs(spark,
          spark.read.parquet(sigDir), pmod(col("doc_id"), lit(5)) === 0))
      }
      timed("x17:from-raw(registered)") {
        sink(graft.SparkEntry.queries("x17_incremental_dedup")(spark, d))
      }
      // TF-IDF over both sources
      timed("x12:from-at-rest") {
        sink(td.tfidfTopKFromParquet(spark, tfDir, nDocs))
      }
      timed("x12:from-raw(registered)") {
        sink(graft.SparkEntry.queries("x12_tfidf_topk")(spark, d))
      }
    }
    spark.stop()
  }
}
