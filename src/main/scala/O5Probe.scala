import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** o5 (stratified sample) shape A/B at the 100x replica: the shipped
  * rank<=5 window DOES get WindowGroupLimit's map-side pruning, but the
  * Partial mode still SORTS every input partition (60M rows, n log n)
  * before keeping 5 per (partition, stratum). The TopKBySim aggregate
  * keeps a 5-slot heap instead (n log k). The composite order
  * (rnd ASC, okey ASC, linenum ASC) packs losslessly into the
  * aggregate's (sim DESC, id ASC): sim = -rnd, id = okey*8+linenum
  * (l_linenumber in 1..7 < 8; both < 2^53 so doubles are exact).
  * Usage: runMain O5Probe /tmp/sf100 [reps]
  */
object O5Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf100")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.Spark.session("o5-probe")

    def li = graft.Tables.lineitem(spark, d)
    def rnd = (col("l_orderkey") * lit(2654435761L) + col("l_linenumber") * lit(97L)) % lit(999999937L)

    def windowForm = {
      val w = Window.partitionBy("l_returnflag")
        .orderBy(rnd.asc, col("l_orderkey").asc, col("l_linenumber").asc)
      li.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select("l_returnflag", "l_orderkey", "l_linenumber", "rk")
    }
    def aggForm = {
      val topk = udaf(new graft.functions.TopKBySim(5))
      li.select(col("l_returnflag").as("qid"),
          (-rnd).cast("double").as("sim"),
          (col("l_orderkey") * 8 + col("l_linenumber")).as("vec_id"))
        .groupBy("qid").agg(topk(col("sim"), col("vec_id")).as("tk"))
        .select(col("qid"), posexplode(col("tk")))
        .select(col("qid").as("l_returnflag"),
          (col("col._2") / 8).cast("long").as("l_orderkey"),
          (col("col._2") % 8).cast("int").as("l_linenumber"),
          (col("pos") + 1).as("rk"))
        .select("l_returnflag", "l_orderkey", "l_linenumber", "rk")
    }

    def timed(name: String)(f: => Unit): Double = {
      graft.Bench.coldReset(spark)
      val t0 = System.nanoTime()
      f
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[o5probe] $name%-12s $t%7.2f s")
      t
    }
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    li.agg(count(lit(1))).collect() // warm-up

    val a = windowForm.collect().map(_.toSeq).toSet
    val b = aggForm.collect().map(_.toSeq).toSet
    println(s"[o5probe] equal=${a == b} rows=${a.size}")
    require(a == b)

    for (rep <- 1 to reps) {
      println(s"[o5probe] --- rep $rep ---")
      timed("window_wgl") { sink(windowForm) }
      timed("topk_agg") { sink(aggForm) }
    }
    spark.stop()
  }
}
