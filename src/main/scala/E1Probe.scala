import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** e1 (brute-force cosine top-k) shape A/B at the 100x replica: the
  * shipped row_number window partitions by qid — 32 partitions for a
  * fixed 32-query batch, so EVERY scored candidate (N×32 rows) rides one
  * exchange into 32 sort tasks. The TopKBySim aggregate keeps a 5-slot
  * heap per (partition, qid) map-side, so the exchange carries
  * partitions×32 tiny buffers instead. Checks bit-equality of the two
  * forms first, then times both cold. Usage: runMain E1Probe /tmp/sf100 [reps]
  */
object E1Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf100")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.Spark.session("e1-probe")

    def vecs = graft.Tables.embeddings(spark, d).select(
      col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm",
        sqrt(aggregate(transform(col("v"), x => x * x), lit(0.0), (acc, v) => acc + v)))
      .filter(col("nrm") > 0)
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      call_function("graft_dot", a, b)
    def sims = {
      val all = vecs
      val q = all.filter(col("vec_id") < 32)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
      all.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          // r6 inline (private[queries]): floor(x*1e6 + 0.5)/1e6
          (floor((dot(col("v"), col("qv")) / (col("nrm") * col("qnrm")))
            * 1000000.0 + 0.5) / 1000000.0).as("sim"))
    }
    def windowForm = {
      val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id").asc)
      sims.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select("qid", "rank", "vec_id", "sim")
    }
    def aggForm = {
      val topk = udaf(new graft.functions.TopKBySim(5))
      sims.groupBy("qid").agg(topk(col("sim"), col("vec_id")).as("tk"))
        .select(col("qid"), posexplode(col("tk")))
        .select(col("qid"), (col("pos") + 1).as("rank"),
          col("col._2").as("vec_id"), col("col._1").as("sim"))
    }

    def timed(name: String)(f: => Unit): Double = {
      graft.Bench.coldReset(spark)
      val t0 = System.nanoTime()
      f
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[e1probe] $name%-14s $t%7.2f s")
      t
    }
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // equality first (exact rows, incl. tie resolution)
    val a = windowForm.collect().map(_.toSeq).toSet
    val b = aggForm.collect().map(_.toSeq).toSet
    println(s"[e1probe] equal=${a == b} rows=${a.size}")
    require(a == b, "agg form diverged from window form")

    for (rep <- 1 to reps) {
      println(s"[e1probe] --- rep $rep ---")
      timed("window") { sink(windowForm) }
      timed("topk_agg") { sink(aggForm) }
    }
    spark.stop()
  }
}
