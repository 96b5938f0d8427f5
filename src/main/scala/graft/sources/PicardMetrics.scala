package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Picard/htsjdk metrics-file reader — the engine side of the reference's
  * metrics-import notebook (ugvc/reports/importMetrics.ipynb,
  * `readMetricsFile`): each tool output holds
  *   - a `## htsjdk.samtools.metrics.StringHeader` section whose next line
  *     is the invoking command (token 1 = function name, `k=v` tokens =
  *     parameters),
  *   - a `## METRICS CLASS <fq.ClassName>` section followed by a
  *     tab-separated column row and ONE value row (summary metrics),
  *   - for `*WgsMetrics` classes, a `## HISTOGRAM` section with the
  *     coverage histogram, of which the reference keeps the first 201 rows.
  *
  * Output: three long-format frames matching the notebook's stores —
  *   params   (file, function, parameter, value)
  *   metrics  (file, metrics_class, parameter, value)
  *   coverage (file, coverage, cnt)
  * Values stay strings exactly like the pandas frames; [[graft.reports.QcReport]]
  * casts at use sites.
  *
  * Scale shape: one metrics file is KBs, but a fleet run imports MANY
  * (samples × tools). The wholetext read gives one task per file; each
  * task parses its own file sequentially (the sections are ordered), so
  * ingestion parallelism is file-count-bound — the right axis.
  */
object PicardMetrics {

  final case class Parsed(file: String,
                          function: String,
                          params: Seq[(String, String)],
                          metricsClass: String,
                          metrics: Seq[(String, String)],
                          coverage: Seq[(Long, Long)])

  /** Basename with the notebook's normalizations: drop `.txt`, skip
    * `.tsv`/`.h5` companions (importMetrics.ipynb main loop). */
  private def normName(path: String): Option[String] = {
    val base = path.substring(path.lastIndexOf('/') + 1)
    if (base.endsWith(".tsv") || base.endsWith(".h5")) None
    else if (base.endsWith(".txt")) Some(base.dropRight(4))
    else Some(base)
  }

  /** Single-file parse, a line-for-line replay of `readMetricsFile`. */
  private[sources] def parseFile(file: String, text: String): Option[Parsed] = {
    val it = text.linesIterator.buffered
    var function: String = null
    var params: Seq[(String, String)] = Nil
    var metricsClass: String = null
    var metrics: Seq[(String, String)] = Nil
    var coverage: Seq[(Long, Long)] = Nil
    def nextOr(default: String): String = if (it.hasNext) it.next() else default
    while (it.hasNext) {
      val line = it.next()
      if (line.startsWith("## htsjdk.samtools.metrics.StringHeader")) {
        val header = nextOr("").trim.split(" ")
        if (header.length > 1) function = header(1)
        params = header.toSeq.flatMap { h =>
          h.split("=") match {
            case Array(k, v) => Some(k -> v)
            case _ => None
          }
        }
        nextOr("") // blank separator the reference skips
      } else if (line.startsWith("## METRICS CLASS")) {
        metricsClass = line.trim.split("\t").last.split("\\.").last
        val cat = nextOr("").trim.split("\t")
        val value = nextOr("").trim.split("\t")
        metrics = cat.zip(value).toSeq
      } else if (line.startsWith("## HISTOGRAM") && metricsClass != null &&
                 metricsClass.endsWith("WgsMetrics")) {
        nextOr("") // histogram column header
        val rows = Seq.newBuilder[(Long, Long)]
        var n = 0
        var ok = true
        // reference keeps <= 201 rows (while len<=200 appends once more)
        while (ok && n <= 200 && it.hasNext) {
          val row = it.next().trim.split("\t")
          if (row.length < 2) ok = false
          else {
            try { rows += ((row(0).toLong, row(1).toLong)); n += 1 }
            catch { case _: NumberFormatException => ok = false }
          }
        }
        coverage = rows.result()
      }
    }
    if (function == null || metricsClass == null) None
    else Some(Parsed(file, function, params, metricsClass, metrics, coverage))
  }

  /** Distributed parse of a directory/glob of metrics files. */
  def parse(spark: SparkSession, glob: String): org.apache.spark.sql.Dataset[Parsed] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(glob)
      .select(input_file_name().as("file"), col("value"))
      .as[(String, String)]
      .flatMap { case (path, text) =>
        normName(path).flatMap(parseFile(_, text))
      }
  }

  /** The notebook's `params` store: (file, function, parameter, value). */
  def params(parsed: org.apache.spark.sql.Dataset[Parsed]): DataFrame = {
    import parsed.sparkSession.implicits._
    parsed.flatMap(p => p.params.map { case (k, v) => (p.file, p.function, k, v) })
      .toDF("file", "function", "parameter", "value")
  }

  /** The notebook's `metrics` store: (file, metrics_class, parameter, value). */
  def metrics(parsed: org.apache.spark.sql.Dataset[Parsed]): DataFrame = {
    import parsed.sparkSession.implicits._
    parsed.flatMap(p => p.metrics.map { case (k, v) => (p.file, p.metricsClass, k, v) })
      .toDF("file", "metrics_class", "parameter", "value")
  }

  /** The notebook's per-file `<name>_cvg` histograms as one long frame. */
  def coverage(parsed: org.apache.spark.sql.Dataset[Parsed]): DataFrame = {
    import parsed.sparkSession.implicits._
    parsed.flatMap(p => p.coverage.map { case (c, n) => (p.file, c, n) })
      .toDF("file", "coverage", "cnt")
  }

  /** Read a metrics directory into the keyed multi-table store shape the
    * rest of the report layer consumes (importMetrics.ipynb's h5 output:
    * keys `params`, `metrics`, `<file>_cvg` folded to one frame). */
  def read(spark: SparkSession, glob: String): Map[String, DataFrame] = {
    val parsed = parse(spark, glob).persist()
    Map("params" -> params(parsed), "metrics" -> metrics(parsed),
        "coverage" -> coverage(parsed))
  }
}
