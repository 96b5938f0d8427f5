import org.apache.spark.sql.functions._

/** Wide-panel parse-cost probe: does the per-sample FORMAT map transform
  * re-derive shared row-level arrays (the `_keys` split) per sample
  * element after optimizer inlining? Prints occurrence counts of the
  * split expressions in the optimized plan (1 = computed once per row;
  * N = re-derived per reference) and times an explodeSamples aggregate
  * over a generated panel.
  * Usage: runMain PanelProbe [nSamples] [nRows]
  */
object PanelProbe {
  def main(args: Array[String]): Unit = {
    val nSamples = if (args.length > 0) args(0).toInt else 500
    val nRows = if (args.length > 1) args(1).toInt else 20000
    val spark = graft.Spark.session("panel-probe")

    val dir = java.nio.file.Files.createTempDirectory("graftpanel")
    val p = dir.resolve("panel.vcf")
    val w = java.nio.file.Files.newBufferedWriter(p)
    w.write("##fileformat=VCFv4.2\n")
    w.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t" +
      (1 to nSamples).map(i => s"S$i").mkString("\t") + "\n")
    val rnd = new scala.util.Random(7)
    for (i <- 1 to nRows) {
      w.write(s"chr1\t${i * 3}\t.\tA\tT\t50\tPASS\tDP=$i\tGT:DP:GQ")
      for (_ <- 1 to nSamples)
        w.write(s"\t0/${rnd.nextInt(2)}:${rnd.nextInt(60)}:${rnd.nextInt(99)}")
      w.write("\n")
    }
    w.close()
    println(s"[panelprobe] wrote ${java.nio.file.Files.size(p) / 1024 / 1024} MB " +
      s"($nRows rows x $nSamples samples)")

    val exploded = graft.sources.Vcf.explodeSamples(
      graft.sources.Vcf.readAllSamples(spark, p.toString))
    val plan = exploded.queryExecution.optimizedPlan.toString
    for (marker <- Seq("split(element_at", "map_from_arrays")) {
      val n = plan.sliding(marker.length).count(_ == marker)
      println(s"[panelprobe] optimized-plan occurrences of '$marker': $n")
    }
    if (args.contains("--plan")) plan.split("\n").filter(_.contains("split("))
      .foreach(l => println("[panelprobe] PLAN " + l.take(600)))

    def time(label: String): Unit = {
      val t = System.nanoTime()
      val r = exploded.agg(count(lit(1)).as("n"), sum("dp").as("sum_dp"))
        .collect().head
      println(f"[panelprobe] $label ${(System.nanoTime() - t) / 1e9}%6.1f s  " +
        s"n=${r.getLong(0)} sum_dp=${r.get(1)}")
    }
    time("explode#1"); time("explode#2")
    spark.stop()
  }
}
