import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** x5 shape A/B at the 100x replica: the shipped groupBy(pkey)+join
  * survivorship recomputes the scored frame (tokenize + 4 derived
  * columns) on BOTH branches of the self-join — two full tokenize passes
  * over the corpus. A min-over-pkey window computes survivorship in ONE
  * tokenize pass + one narrow shuffle (no text column rides it); window
  * partitions are bounded by the duplicate-group size.
  * Usage: runMain X5Probe /tmp/sf100 [reps]
  */
object X5Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf100")
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = graft.Spark.session("x5-probe")

    def scored = {
      val toks = graft.functions.Text.tokens(col("text"))
      graft.Tables.documents(spark, d)
        .withColumn("n_tokens", size(toks))
        .withColumn("distinct_ratio",
          size(array_distinct(toks)).cast("double") / size(toks))
        .withColumn("en_score",
          graft.functions.Text.vocabRatio(toks, Seq("the", "a", "of", "and", "to")))
        .withColumn("pkey", graft.functions.Text.hash32(concat_ws(" ", slice(toks, 1, 10))))
    }
    def r6(c: org.apache.spark.sql.Column) = floor(c * 1000000.0 + 0.5) / 1000000.0
    def out(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("doc_id") === col("canonical") &&
        col("en_score") > 0.05 && col("distinct_ratio") > 0.5 &&
        col("n_tokens") >= 20)
      .select(col("doc_id"), col("n_tokens"),
        r6(col("distinct_ratio")).as("distinct_ratio"),
        r6(col("en_score")).as("en_score"))

    def joinForm = {
      val s0 = scored
      out(s0.join(s0.groupBy("pkey").agg(min("doc_id").as("canonical")), Seq("pkey")))
    }
    def windowForm = out(scored.withColumn("canonical",
      min("doc_id").over(Window.partitionBy("pkey"))))

    def timed(name: String)(f: => Unit): Double = {
      graft.Bench.coldReset(spark)
      val t0 = System.nanoTime()
      f
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[x5probe] $name%-12s $t%7.2f s")
      t
    }
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    graft.Tables.documents(spark, d).agg(count(lit(1))).collect() // warm-up

    val a = joinForm.collect().map(_.toSeq).toSet
    val b = windowForm.collect().map(_.toSeq).toSet
    println(s"[x5probe] equal=${a == b} rows=${a.size}")
    require(a == b)

    for (rep <- 1 to reps) {
      println(s"[x5probe] --- rep $rep ---")
      timed("join_form") { sink(joinForm) }
      timed("window_form") { sink(windowForm) }
    }
    spark.stop()
  }
}
