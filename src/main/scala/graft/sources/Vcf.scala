package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** VCF text reader/writer (SURVEY.md §2.1 S2/S3/S10).
  *
  * The reference flattens VCF records into a frame via `get_vcf_df`
  * [absent; inferred — call sites ugvc/pipelines/run_no_gt_report.py:307-312,
  * ugvc/comparison/variant_hit_fraction_caller.py:33-40] with lower-cased
  * field names, and streams records with pysam (compress_gvcf.py:122-212).
  *
  * Spark-first: `spark.read.text` → line split → typed columns; INFO
  * becomes `map<string,string>` plus opt-in typed extraction; the
  * first-sample FORMAT fields become `gt array<int>` (nullable elements
  * for no-calls), `ad`/`pl` int arrays, `dp`/`gq` ints. Everything is
  * built-in expressions, so column pruning reaches the text scan and
  * unneeded per-sample parsing is dropped by Catalyst.
  *
  * At scale: VCFs are line-delimited, so the text source splits files by
  * range and parses in parallel; downstream genomic operators should
  * `repartitionByRange($"chrom", $"pos")` once and reuse that partitioning.
  */
object Vcf {

  /** Index sidecars (.gidx/.tbi/.csi) that sit BESIDE data files in a
    * directory written with `option("index",...)` or indexed by external
    * tools — never data, excluded from every data-file walk (a `.tbi`
    * parsed as VCF text yields garbage rows on an unfiltered scan). */
  def isIndexSidecar(name: String): Boolean =
    name.endsWith(VcfIndex.Suffix) || name.endsWith(Tabix.Suffix) ||
      name.endsWith(Tabix.CsiSuffix)

  /** The leading '#'-prefixed header block, read with a BOUNDED
    * driver-side stream that stops at the first data line — O(header),
    * not O(file): schema and sample inference on a 100 GB VCF must not
    * scan 100 GB (a distributed `read.text(...).filter(startsWith("#"))`
    * collect touches every line). Globs/directories resolve to their
    * first visible file (the V2 scan's planning-time header-compatibility
    * check guards the "headers agree across parts" assumption for foreign
    * directories); gzip/BGZF decode through the codec, of which only the
    * header's blocks are ever inflated. */
  def headerLines(spark: SparkSession, path: String): Seq[String] = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    def visible(n: String): Boolean =
      !n.startsWith("_") && !n.startsWith(".") && !isIndexSidecar(n)
    def firstFile(s: org.apache.hadoop.fs.FileStatus): Option[org.apache.hadoop.fs.Path] =
      if (!visible(s.getPath.getName)) None
      else if (s.isDirectory)
        fs.listStatus(s.getPath).sortBy(_.getPath.getName).iterator
          .flatMap(firstFile).nextOption()
      else Some(s.getPath)
    val target = (fs.globStatus(p) match {
      case null => Array.empty[org.apache.hadoop.fs.FileStatus]
      case st => st
    }).sortBy(_.getPath.getName).iterator.flatMap(firstFile).nextOption()
      .getOrElse(throw new java.io.FileNotFoundException(path))
    headerLinesOf(conf, target)
  }

  /** [[headerLines]] for one concrete file. */
  def headerLinesOf(conf: org.apache.hadoop.conf.Configuration,
                    target: org.apache.hadoop.fs.Path): Seq[String] = {
    val raw = target.getFileSystem(conf).open(target)
    val in: java.io.InputStream =
      if (target.getName.endsWith(".gz") || target.getName.endsWith(".bgz"))
        new java.util.zip.GZIPInputStream(raw, 65536)
      else raw
    val br = new java.io.BufferedReader(
      new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
    try {
      val out = Seq.newBuilder[String]
      var line = br.readLine()
      while (line != null && line.startsWith("#")) {
        out += line
        line = br.readLine()
      }
      out.result()
    } finally br.close()
  }

  /** What must AGREE across the files of one directory/glob scan for the
    * first-file schema inference to be sound: the #CHROM sample columns
    * (a different panel order silently reads the WRONG sample under
    * `sample_index`) and, when typed INFO columns are requested, each
    * requested key's declared (Number, Type). */
  final case class HeaderMeta(samples: Seq[String], infoTypes: Map[String, String])

  private val InfoDecl =
    """##INFO=<ID=([^,>]+),Number=([^,>]+),Type=([^,>]+)""".r.unanchored

  def headerMetaOf(conf: org.apache.hadoop.conf.Configuration,
                   target: org.apache.hadoop.fs.Path): HeaderMeta = {
    val lines = headerLinesOf(conf, target)
    val samples = lines.find(_.startsWith("#CHROM"))
      .map(_.split("\t").drop(9).toSeq).getOrElse(Seq.empty)
    val info = lines.collect {
      case InfoDecl(id, num, tpe) => id -> s"Number=$num,Type=$tpe"
    }.toMap
    HeaderMeta(samples, info)
  }

  // planning may see the same (unchanged) files every query: cache header
  // fingerprints by (path, len, mtime). LRU-bounded — evicting one cold
  // entry at a time, never clearing wholesale (a hot directory must not
  // re-plan every header after crossing the bound)
  private val HeaderCacheMax = 100000
  private val headerMetaCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(String, Long, Long), HeaderMeta](1024, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long, Long), HeaderMeta]): Boolean =
        size() > HeaderCacheMax
    })

  def headerMetaCached(conf: org.apache.hadoop.conf.Configuration,
                       s: org.apache.hadoop.fs.FileStatus): HeaderMeta = {
    val key = (s.getPath.toString, s.getLen, s.getModificationTime)
    val hit = headerMetaCache.get(key)
    if (hit != null) hit
    else {
      // the header read runs OUTSIDE the map lock (the planning-time
      // compat walk fans these over a thread pool — a computeIfAbsent
      // would serialize the I/O it exists to parallelize); a racing
      // duplicate read is benign and idempotent
      val m = headerMetaOf(conf, s.getPath)
      headerMetaCache.put(key, m)
      m
    }
  }

  /** Sample names from the #CHROM header line (columns 10+). */
  def sampleNames(spark: SparkSession, path: String): Seq[String] = {
    val header = headerLines(spark, path).find(_.startsWith("#CHROM"))
      .getOrElse(throw new IllegalArgumentException(s"no #CHROM header line in $path"))
    header.split("\t").drop(9).toSeq
  }

  /** Columns: chrom, pos (long), id, ref, alleles array<string>, qual double,
    * filter, info map<string,string>, sample fields gt/ad/pl/dp/gq for the
    * requested sample (0-based; the reference's get_vcf_df takes sample_id
    * the same way). For whole-panel work use [[readAllSamples]] /
    * [[explodeSamples]] — one scan for every sample. */
  def read(spark: SparkSession, path: String, sampleIndex: Int = 0): DataFrame =
    if (looksBgzf(spark, path)) readBgzf(spark, path, sampleIndex)
    else fromLines(textLines(spark, path), sampleIndex)

  /** `spark.read.text` with index sidecars excluded: a directory written
    * with `option("index","tbi"/"csi"/"gidx")` keeps its sidecars next to
    * the parts, and a naive directory text scan would parse them as data
    * (binary garbage rows on an unfiltered read). Directories expand to
    * their visible data files; single files and globs pass through. */
  private[sources] def textLines(spark: SparkSession, path: String): DataFrame = {
    val expanded: Seq[String] =
      try {
        val conf = spark.sessionState.newHadoopConf()
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(conf)
        def visible(n: String): Boolean =
          !n.startsWith("_") && !n.startsWith(".") && !isIndexSidecar(n)
        def walk(s: org.apache.hadoop.fs.FileStatus): Seq[String] =
          if (!visible(s.getPath.getName)) Seq.empty
          else if (s.isDirectory) fs.listStatus(s.getPath).toSeq.flatMap(walk)
          else Seq(s.getPath.toString)
        fs.globStatus(p) match {
          case null => Seq(path)
          case st if st.exists(s => s.isDirectory ||
              isIndexSidecar(s.getPath.getName)) => st.toSeq.flatMap(walk)
          case _ => Seq(path) // plain file(s): no expansion needed
        }
      } catch { case _: Throwable => Seq(path) }
    if (expanded == Seq(path)) spark.read.text(path)
    else if (expanded.isEmpty) // directory holding only sidecars
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("value",
            org.apache.spark.sql.types.StringType))))
    else spark.read.text(expanded: _*)
  }

  /** True for a single `.gz`/`.bgz` file with a valid BGZF chain — those
    * dispatch to the splittable reader; plain gzip (unsplittable, but
    * rare outside bgzip in this domain) and globs/directories fall back
    * to the codec text scan. */
  private def looksBgzf(spark: SparkSession, path: String): Boolean =
    (path.endsWith(".gz") || path.endsWith(".bgz")) &&
      (try Bgzf.isBgzf(spark.sessionState.newHadoopConf(), path)
       catch { case _: Throwable => false })

  /** Parse a raw line frame (column `value`) into the single-sample
    * variant frame — shared by the plain-text scan and the splittable
    * BGZF reader. */
  def fromLines(raw: DataFrame, sampleIndex: Int = 0): DataFrame = {
    val lines = raw.filter(!col("value").startsWith("#"))
    val f = split(col("value"), "\t")
    def fld(i: Int): Column = element_at(f, i)

    val fmtKeys = split(element_at(f, 9), ":")
    val fmtVals = split(element_at(f, 10 + sampleIndex), ":")
    val sample = sampleMap(fmtKeys, fmtVals)

    withSampleFields(lines.select(coreCols(fld) :+ sample.as("sample"): _*))
  }

  /** Splittable read of a bgzip-compressed VCF: [[Bgzf.readLines]] gives
    * one task per `splitBytes` of COMPRESSED data (a plain `.gz` codec
    * read is one task per file — a 100 TB single-file gVCF would
    * serialize), then the same line parse as [[read]]. */
  def readBgzf(spark: SparkSession, path: String, sampleIndex: Int = 0,
               splitBytes: Long = 16L * 1024 * 1024): DataFrame =
    fromLines(Bgzf.readLines(spark, path, splitBytes).toDF("value"), sampleIndex)

  /** Streaming VCF ingestion: new files landing under `glob` parse
    * incrementally through the SAME expression pipeline as [[read]]
    * (fromLines is source-agnostic — `readStream.text` swaps in for
    * `read.text`). The production shape for a VCF drop-zone: per-contig
    * bgzip parts arriving continuously, each micro-batch parsing only the
    * new files; compose with the [[graft.streaming.Streams]] automata
    * (e.g. streamingBlockCompress) downstream. gz parts decompress
    * whole-file per task, which matches the arrival granularity. */
  def readStream(spark: SparkSession, glob: String, sampleIndex: Int = 0,
                 maxFilesPerTrigger: Int = 1000): DataFrame =
    fromLines(
      spark.readStream.option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
        .text(glob),
      sampleIndex)

  /** Multi-sample read: ONE text scan regardless of panel width. `samples`
    * holds one FORMAT map per sample column (VCF columns 10+); pair with
    * [[sampleNames]] for the name -> index mapping and [[explodeSamples]]
    * for the long (one row per sample) shape distributed joins want. */
  def readAllSamples(spark: SparkSession, path: String): DataFrame = {
    val lines = textLines(spark, path).filter(!col("value").startsWith("#"))
    // materialize the line split and the FORMAT keys BEFORE the per-sample
    // transform: expressions referenced inside a HOF lambda re-evaluate per
    // ELEMENT, so inlining `split(value)` there re-splits the whole line
    // once per sample — O(width²) per record (a 1000-sample panel parsed
    // ~0.2 s/LINE; materialized it is ~milliseconds). The multi-reference
    // `_f` column keeps CollapseProject from re-inlining it.
    val wide = lines
      .withColumn("_f", split(col("value"), "\t"))
      .withColumn("_keys", split(element_at(col("_f"), 9), ":"))
    def fld(i: Int): Column = element_at(col("_f"), i)
    // greatest(..., 0): the slice must stay total — header lines can reach
    // this projection before the '#' filter in the same codegen stage
    val samples = transform(
      slice(col("_f"), lit(10), greatest(size(col("_f")) - 9, lit(0))),
      v => sampleMap(col("_keys"), split(v, ":")))
    wide.select(coreCols(fld) :+ samples.as("samples"): _*)
  }

  /** Long format: one row per (record, sample) with typed gt/ad/pl/dp/gq and
    * a 0-based `sample_idx` — the multi-sample shape that joins/aggregates
    * across a panel without N re-reads (denovo_refinement.py:30-35 reads one
    * frame per individual; at panel scale this replaces that loop). */
  def explodeSamples(df: DataFrame): DataFrame =
    withSampleFields(
      // outer + null-filter, NOT plain posexplode: the inferred pre-Generate
      // filter `size(samples)>0` inlines the whole per-sample transform into
      // an interpreted condition, re-splitting the line once per sample —
      // O(width²) per record again (measured 53s -> 6s on a 1000-sample
      // panel). Filtering the GENERATED index afterwards is equivalent.
      df.select(col("*"), posexplode_outer(col("samples")).as(Seq("sample_idx", "sample")))
        .filter(col("sample_idx").isNotNull)
        .drop("samples"))

  /** FORMAT-keyed sample map, total over ragged columns: the VCF spec lets
    * a sample drop trailing FORMAT fields (and pysam pads them), so both
    * arrays are sliced to their common length before map_from_arrays —
    * otherwise a `GT:AD:DP` FORMAT with a bare `0/1` sample value throws
    * at runtime. Dropped fields are simply absent from the map (typed
    * extraction then yields null, matching the reference's None). */
  private def sampleMap(fmtKeys: Column, fmtVals: Column): Column = {
    val m = least(size(fmtKeys), size(fmtVals))
    map_from_arrays(slice(fmtKeys, lit(1), m), slice(fmtVals, lit(1), m))
  }

  /** Typed extraction of the standard FORMAT fields from a `sample` map.
    * try_cast, not cast: `.` is the VCF missing-value marker inside
    * FORMAT values (same convention QUAL handles explicitly), and under
    * ANSI mode a plain cast would throw on it — a missing/malformed
    * sample value reads as null, identical to the v2 parser's
    * toIntOrNull. */
  private def withSampleFields(df: DataFrame): DataFrame =
    df.withColumn("gt",
        transform(split(regexp_replace(element_at(col("sample"), "GT"), "\\|", "/"), "/"),
          g => when(g === "." || g === "", null).otherwise(g).try_cast("int")))
      .withColumn("ad", intArray(element_at(col("sample"), "AD")))
      .withColumn("pl", intArray(element_at(col("sample"), "PL")))
      .withColumn("dp", element_at(col("sample"), "DP").try_cast("int"))
      .withColumn("gq", element_at(col("sample"), "GQ").try_cast("int"))

  private def coreCols(fld: Int => Column): Seq[Column] = Seq(
    fld(1).as("chrom"),
    fld(2).cast("long").as("pos"),
    fld(3).as("id"),
    fld(4).as("ref"),
    concat(array(fld(4)), split(fld(5), ",")).as("alleles"),
    when(fld(6) === ".", null).otherwise(fld(6)).cast("double").as("qual"),
    fld(7).as("filter"),
    str_to_map(fld(8), lit(";"), lit("=")).as("info"))

  private def intArray(c: Column): Column =
    when(c.isNull, null).otherwise(transform(split(c, ","), x => x.try_cast("int")))

  /** Typed INFO accessor: `infoField(df, "END")` as long, etc. try_cast,
    * not cast: INFO values are user data and ANSI cast would fail the
    * whole scan on one malformed or '.'-marked value (the reference's
    * frame building tolerates them as missing). */
  def infoLong(name: String): Column = element_at(col("info"), name).try_cast("long")
  def infoDouble(name: String): Column = element_at(col("info"), name).try_cast("double")
  def infoFlag(name: String): Column = map_contains_key(col("info"), name)

  /** get_vcf_df's `custom_info_fields` (sv_stats_collect.py:34-36): project
    * INFO keys to typed, LOWER-CASED columns in one pass. Supported types:
    * "long", "double", "string", "flag" (presence boolean). Values use
    * try_cast leniency — same rationale as [[infoLong]] — matching the
    * DSv2 `info_fields` columns. */
  def withInfoFields(df: DataFrame, fields: Map[String, String]): DataFrame =
    fields.foldLeft(df) { case (acc, (name, tpe)) =>
      val c = tpe match {
        case "flag" => map_contains_key(col("info"), name)
        case t      => element_at(col("info"), name).try_cast(t)
      }
      acc.withColumn(name.toLowerCase, c)
    }

  private val InfoHeader =
    """##INFO=<ID=([^,>]+),Number=([^,>]+),Type=([^,>]+).*""".r

  /** Infer the typed-INFO projection from the `##INFO=<ID=..,Type=..>`
    * header lines, the way get_vcf_df types its frame from the pysam
    * header: Integer→long, Float→double, Flag→flag, String/Character→
    * string. Number≠1 fields stay strings (comma-joined), matching the
    * reference's tuple-valued cells that callers unpack themselves. */
  def infoSchema(spark: SparkSession, path: String): Map[String, String] =
    headerLines(spark, path)
      .filter(_.startsWith("##INFO="))
      .flatMap(line => line match {
        case InfoHeader(id, number, tpe) =>
          val t = (tpe, number) match {
            case ("Flag", _)    => "flag"
            case (_, n) if n != "1" => "string"
            case ("Integer", _) => "long"
            case ("Float", _)   => "double"
            case _              => "string"
          }
          Some(id -> t)
        case _ => None
      }).toMap

  /** One-call typed read: body parse + header-driven INFO projection. */
  def readTyped(spark: SparkSession, path: String, sampleIndex: Int = 0): DataFrame =
    withInfoFields(read(spark, path, sampleIndex), infoSchema(spark, path))

  /** Write a variant frame back to VCF body text (single sample), sorted by
    * (chrom, pos) within range partitions — S10 minus the tabix step, which
    * is an external indexing concern. */
  def write(df: DataFrame, path: String, header: Seq[String] = defaultHeader): Unit = {
    val body = df
      .repartitionByRange(col("chrom"), col("pos"))
      .sortWithinPartitions("chrom", "pos")
      .select(concat_ws("\t",
        col("chrom"), col("pos"), coalesce(col("id"), lit(".")),
        element_at(col("alleles"), 1),
        array_join(slice(col("alleles"), 2, 100), ","),
        coalesce(col("qual").cast("string"), lit(".")),
        coalesce(col("filter"), lit(".")),
        coalesce(aggregate(map_entries(col("info")),
          lit(null).cast("string"),
          (acc, e) => when(acc.isNull, concat(e.getField("key"), lit("="), e.getField("value")))
            .otherwise(concat(acc, lit(";"), e.getField("key"), lit("="), e.getField("value")))),
          lit("."))).as("value"))
    val spark = df.sparkSession
    import spark.implicits._
    header.toDF("value").unionByName(body).coalesce(1)
      .write.mode("overwrite").text(path)
  }

  val defaultHeader: Seq[String] = Seq(
    "##fileformat=VCFv4.2",
    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO")
}
