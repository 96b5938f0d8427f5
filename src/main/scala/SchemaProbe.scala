/** Is per-call `spark.read.parquet` schema inference (footer read + file
  * index build) a material slice of the 108-query bench's fixed per-query
  * cost? Times N DataFrame CONSTRUCTIONS (analysis only, no action) with
  * inferred vs explicit schema. Usage: runMain SchemaProbe <sfDir> [n]
  */
object SchemaProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = if (args.length > 1) args(1).toInt else 100
    val spark = graft.Spark.session("schema-probe")
    val path = s"$d/lineitem.parquet"
    // warm both paths
    val sch = spark.read.parquet(path).schema
    spark.read.schema(sch).parquet(path).queryExecution.analyzed
    for (rep <- 1 to 3) {
      var t0 = System.nanoTime()
      var i = 0
      while (i < n) { spark.read.parquet(path).queryExecution.analyzed; i += 1 }
      val inferred = (System.nanoTime() - t0) / 1e6 / n
      t0 = System.nanoTime()
      i = 0
      while (i < n) { spark.read.schema(sch).parquet(path).queryExecution.analyzed; i += 1 }
      val explicit = (System.nanoTime() - t0) / 1e6 / n
      println(f"[schemaprobe] rep $rep: inferred $inferred%.1f ms/call  explicit $explicit%.1f ms/call")
    }
    spark.stop()
  }
}
