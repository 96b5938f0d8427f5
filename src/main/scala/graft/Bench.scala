package graft
import scala.collection.immutable.ListMap

/** Driver-run benchmark: one JSON line with per-query wall seconds.
  *
  * Queries are fully materialized through the `noop` sink (not `count()`)
  * so ordering/window stages aren't optimizer-eliminated, and a warm-up
  * job absorbs JVM/codegen startup so the first measured query isn't
  * penalized. Queries run in sorted name order for stable comparisons.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Spark.session("graft-bench")
    // warm-up: shuffle + codegen + parquet reader paths
    spark.range(1000000).selectExpr("id % 97 AS k", "id AS v")
      .groupBy("k").count().write.format("noop").mode("overwrite").save()
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()

    val results = ListMap(SparkEntry.queries.toSeq.sortBy(_._1): _*).map {
      case (name, fn) =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // the stdout line is the driver contract, but tail-capture can truncate
    // it (BENCH_r03 lost half its per-query map) — persist the complete
    // artifact to a file as the re-runnable record
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/BENCH_LOCAL.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $out: ${e.getMessage}") }
    spark.stop()
  }
}
