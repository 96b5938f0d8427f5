package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.Text
import org.apache.hadoop.util.LineReader
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util
import scala.jdk.CollectionConverters._

/** VCF DataSourceV2: `spark.read.format("vcf").load(path)` with real
  * scan-time (chrom, pos) predicate pushdown and column pruning — the
  * reference's manual `bcftools view -r/-i` region restriction BEFORE
  * parsing (correct_genotypes_by_imputation.py:141-148,
  * train_lib_prep_recalibration_model.py:57), expressed as a Spark
  * `TableProvider` so Catalyst routes the filters down automatically.
  *
  * Why it matters at scale: the expression path ([[Vcf.read]]) always
  * splits all 10+N tab fields and builds the INFO map and FORMAT sample
  * map for EVERY line before the region filter runs. Here a pushed region
  * predicate is evaluated on a cheap two-field partial parse (chrom, pos)
  * and non-matching lines skip the full parse entirely; pruned columns
  * (`SupportsPushDownRequiredColumns`) skip whole parse stages (no INFO
  * map for a (chrom,pos) projection, no FORMAT parse unless a sample
  * field is required). On a whole-genome scan restricted to one locus
  * that is ~100% of parse work avoided.
  *
  * Splits: BGZF files get one task per `split_bytes` of compressed data
  * via [[Bgzf.splitLines]]'s single-owner rule; plain text files get byte
  * ranges with the standard skip-first-partial-line / read-through-end
  * convention (a line belongs to the split containing its first byte,
  * inclusive of the end boundary). Both are embarrassingly parallel —
  * no driver-side line handling.
  *
  * Pushed filters are ALSO returned as post-scan filters (Spark
  * re-applies them), so the source only ever prunes, never decides —
  * results are row-identical to `Vcf.read(...).filter(...)` (spec-gated
  * in VcfBedSpec).
  *
  * Options: `sample_index` (default 0), `split_bytes` (default 16 MiB).
  */
class VcfDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "vcf"

  // writes hand the incoming frame's schema to getTable (the writer
  // formats whatever projection of the read schema it is given)
  override def supportsExternalMetadata(): Boolean = true

  private def allSamples(opts: java.util.Map[String, String]): Boolean =
    Option(opts.get("samples")).exists(_.equalsIgnoreCase("all"))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    VcfV2.schemaFor(allSamples(options),
      VcfV2.parseInfoFields(Option(options.get("info_fields"))))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("vcf source requires a path"))
    val sampleIndex = Option(properties.get("sample_index")).map(_.toInt).getOrElse(0)
    val splitBytes = Option(properties.get("split_bytes")).map(_.toLong)
      .getOrElse(16L * 1024 * 1024)
    // the write path supplies the incoming frame's schema (any projection
    // of the read shapes); reads pass inferSchema's result back unchanged
    new VcfTable(path, sampleIndex, splitBytes, allSamples(properties),
      Option(schema).filter(_.fields.nonEmpty),
      VcfV2.parseInfoFields(Option(properties.get("info_fields"))),
      !Option(properties.get("header_check")).exists(v =>
        v.equalsIgnoreCase("off") || v.equalsIgnoreCase("false")))
  }
}

object VcfV2 {
  private val core = Seq(
    StructField("chrom", StringType),
    StructField("pos", LongType),
    StructField("id", StringType),
    StructField("ref", StringType),
    StructField("alleles", ArrayType(StringType)),
    StructField("qual", DoubleType),
    StructField("filter", StringType),
    StructField("info", MapType(StringType, StringType)))

  /** Same columns, order, and types as [[Vcf.read]]'s output frame. */
  val schema: StructType = StructType(core ++ Seq(
    StructField("sample", MapType(StringType, StringType, valueContainsNull = false)),
    StructField("gt", ArrayType(IntegerType)),
    StructField("ad", ArrayType(IntegerType)),
    StructField("pl", ArrayType(IntegerType)),
    StructField("dp", IntegerType),
    StructField("gq", IntegerType)))

  /** `option("samples","all")`: [[Vcf.readAllSamples]]'s wide panel shape
    * — one FORMAT map per sample column, single scan for any panel width;
    * compose with [[Vcf.explodeSamples]] for the long form. */
  val allSamplesSchema: StructType = StructType(core :+
    StructField("samples",
      ArrayType(MapType(StringType, StringType, valueContainsNull = false))))

  /** `option("info_fields","AN:long,VARIANT_TYPE,DB:flag")`: INFO keys as
    * first-class typed columns named `info_<key lowercased>` — the DSv2
    * form of [[Vcf.withInfoFields]] (get_vcf_df's custom_info_fields,
    * sv_stats_collect.py:34-36). Making them COLUMNS is what lets
    * Catalyst push `INFO/AN>4`-style predicates (run_somatic_comparison_
    * and_graphs.py:164, run_no_gt_report.py:348) into the scan, where
    * they are evaluated on a bounded 8-field prefix parse BEFORE sample
    * parse and row assembly. Types: long, double, string (default), flag
    * (key presence). Values are lenient (try_cast semantics: '.' or
    * malformed → null) — pushdown only ever prunes, Spark re-applies the
    * predicate. */
  def parseInfoFields(spec: Option[String]): Seq[(String, String, String)] =
    spec.toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty).map { e =>
      val (key, tpe) = e.indexOf(':') match {
        case -1 => (e, "string")
        case i => (e.substring(0, i).trim, e.substring(i + 1).trim.toLowerCase)
      }
      require(Set("string", "long", "double", "flag")(tpe),
        s"vcf info_fields: unsupported type '$tpe' for $key " +
          "(supported: string, long, double, flag)")
      ("info_" + key.toLowerCase, key, tpe)
    }

  private def infoStructField(tpe: String): DataType = tpe match {
    case "long" => LongType
    case "double" => DoubleType
    case "flag" => BooleanType
    case _ => StringType
  }

  /** Read schema for the option combination. */
  def schemaFor(allSamples: Boolean,
                infoFields: Seq[(String, String, String)]): StructType = {
    val base = if (allSamples) allSamplesSchema else schema
    StructType(base ++ infoFields.map { case (col, _, tpe) =>
      StructField(col, infoStructField(tpe))
    })
  }
}

class VcfTable(path: String, sampleIndex: Int, splitBytes: Long,
               allSamples: Boolean = false,
               external: Option[StructType] = None,
               infoFields: Seq[(String, String, String)] = Nil,
               headerCheck: Boolean = true)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"vcf $path"
  override def schema(): StructType = external.getOrElse(
    VcfV2.schemaFor(allSamples, infoFields))
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new VcfScanBuilder(path, sampleIndex, splitBytes, schema(), infoFields,
      headerCheck)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    // any projection of the read shapes writes cleanly; unknown columns or
    // wrong types fail here with guidance, not as executor ClassCastErrors.
    // info_* projections (the typed INFO read shape) are accepted and
    // ignored — their content is the info map, which IS written
    val known = (VcfV2.schema ++ VcfV2.allSamplesSchema.filter(_.name == "samples"))
      .map(f => f.name -> f.dataType).toMap
    info.schema().fields.foreach { f =>
      known.get(f.name) match {
        case None if f.name.startsWith("info_") => ()
        case None => throw new IllegalArgumentException(
          s"vcf write: unknown column '${f.name}' (writable columns: " +
            known.keys.toSeq.sorted.mkString(", ") + ")")
        case Some(dt) if dt != f.dataType => throw new IllegalArgumentException(
          s"vcf write: column '${f.name}' must be $dt, got ${f.dataType}")
        case _ => ()
      }
    }
    new VcfWriteBuilder(path, info)
  }
}

class VcfScanBuilder(path: String, sampleIndex: Int, splitBytes: Long,
                     full: StructType,
                     infoFields: Seq[(String, String, String)] = Nil,
                     headerCheck: Boolean = true)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = full
  private val infoCols = infoFields.map(_._1).toSet

  /** Accept (chrom, pos) predicates the partial parse can evaluate; every
    * filter is ALSO kept post-scan (returned unchanged), so pushdown can
    * only skip lines the engine would drop anyway. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(VcfFilterEval.supported(_, infoCols))
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new VcfScan(path, sampleIndex, splitBytes,
    pushed, required, infoFields, headerCheck)
}

class VcfScan(path: String, sampleIndex: Int, splitBytes: Long,
              pushed: Array[Filter], required: StructType,
              infoFields: Seq[(String, String, String)] = Nil,
              headerCheck: Boolean = true)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  // surfaced in the plan text (BatchScan ... PushedFilters/ReadSchema) so
  // pushdown is assertable the same way parquet scans are
  override def description(): String =
    s"vcf $path PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()
    val base = new Path(path)
    val fs = base.getFileSystem(conf)
    // recursive walk: nested layouts (dir/chrom=1/part.vcf) are read, not
    // silently skipped; hidden names and index sidecars (.gidx/.tbi/.csi —
    // binary, not data) excluded at every level
    def visible(n: String): Boolean =
      !n.startsWith("_") && !n.startsWith(".") && !Vcf.isIndexSidecar(n)
    def walk(s: org.apache.hadoop.fs.FileStatus): Seq[org.apache.hadoop.fs.FileStatus] =
      if (!visible(s.getPath.getName)) Seq.empty
      else if (s.isDirectory) fs.listStatus(s.getPath).toSeq.flatMap(walk)
      else Seq(s)
    val files = fs.globStatus(base) match {
      case null => Seq.empty[org.apache.hadoop.fs.FileStatus]
      case st => st.toSeq.flatMap(walk)
    }
    // Header-compatibility gate for multi-file scans: the read schema and
    // sample panel were inferred from the FIRST file (Vcf.headerLines);
    // the reference never mixes headers silently — pysam reads each
    // file's own header (ugvc/joint/denovo_refinement.py:30-35 one frame
    // per parent file). A foreign directory mixing panels or INFO
    // declarations must fail HERE with the offending file, not yield the
    // wrong sample or silent nulls. O(header) per file, driver-side at
    // planning, cached by (path, len, mtime); `option("header_check",
    // "off")` opts out for known-homogeneous huge directories.
    if (headerCheck && files.length > 1) {
      val ref = Vcf.headerMetaCached(conf, files.head)
      // each check is one bounded header read (O(header), not O(file)),
      // but a 100k-part foreign directory would serialize 100k FS opens
      // inside planning — fan the reads over a bounded pool and surface
      // the FIRST mismatch in file order (deterministic messages).
      // Measured under the ObjStoreProbe latency shim (25 ms/open, 2000
      // files): sequential walk 51.8 s, this pool 3.6 s (OBJSTORE.json) —
      // the object-store pricing is no longer an argument. The
      // worker only builds the message; require stays on the driver
      // thread so the error type/text matches the sequential walk.
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(16, Runtime.getRuntime.availableProcessors()))
      try {
        val checks = files.tail.map { s =>
          pool.submit(new java.util.concurrent.Callable[Option[String]] {
            override def call(): Option[String] = {
              val m = Vcf.headerMetaCached(conf, s)
              if (m.samples != ref.samples)
                Some(s"vcf scan: sample columns of ${s.getPath} (${m.samples.mkString(",")}) " +
                  s"differ from ${files.head.getPath} (${ref.samples.mkString(",")}); " +
                  "a directory scan needs one header — split the load or reorder " +
                  "columns upstream (header_check=off overrides)")
              else infoFields.collectFirst {
                case (_, key, _) if m.infoTypes.get(key) != ref.infoTypes.get(key) =>
                  s"vcf scan: INFO $key declared as " +
                    s"${m.infoTypes.getOrElse(key, "<absent>")} in ${s.getPath} but " +
                    s"${ref.infoTypes.getOrElse(key, "<absent>")} in ${files.head.getPath}; " +
                    "typed info_fields need one declaration (header_check=off overrides)"
              }
            }
          })
        }
        checks.foreach { f =>
          val mismatch =
            try f.get()
            catch { // keep a failed header read's own exception type
              case e: java.util.concurrent.ExecutionException => throw e.getCause
            }
          require(mismatch.isEmpty, mismatch.get)
        }
        // cancels the queued remainder when a mismatch threw mid-walk; a
        // completed walk has nothing left to cancel
      } finally pool.shutdownNow()
    }
    // region-index split pruning: with (chrom,pos) predicates pushed and a
    // fresh sidecar present, drop splits whose stats cannot match — the
    // tabix-style "read only the region" access path
    val usePrune = VcfIndex.prunable(pushed)
    files.flatMap { s =>
      val p = s.getPath.toString
      val len = s.getLen
      val gz = p.endsWith(".gz") || p.endsWith(".bgz")
      val bgzf = gz && (try Bgzf.isBgzf(conf, p) catch { case _: Throwable => false })
      val splits =
        if (gz && !bgzf)
          // plain gzip is not splittable: one whole-file partition through the
          // codec (same caveat as Vcf.read — feed many files at scale)
          Seq(VcfPartition(p, 0, len, VcfPartition.Gzip))
        else {
          val kind = if (bgzf) VcfPartition.Bgzf else VcfPartition.Text
          val n = math.max(1L, (len + splitBytes - 1) / splitBytes).toInt
          (0 until n).map { i =>
            VcfPartition(p, i.toLong * splitBytes,
              math.min((i + 1).toLong * splitBytes, len), kind)
          }
        }
      val index = if (usePrune) VcfIndex.read(conf, p, len, s.getModificationTime) else None
      index match {
        case Some(stats) =>
          splits.filter(sp => VcfIndex.mayMatch(stats, sp.start, sp.end, pushed))
        case None if usePrune && bgzf =>
          // no (fresh) .gidx: a foreign bgzf file usually ships a tabix
          // .tbi instead — same prune, driven by the interop sidecar
          Tabix.pruneSplits(conf, p, s.getModificationTime, pushed, splits)
            .getOrElse(splits)
        case None => splits
      }
    }.toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // Configuration is not serializable: ship entries, rebuild per task
    val conf = org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()
    val entries = {
      val it = conf.iterator()
      val b = Seq.newBuilder[(String, String)]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
      b.result()
    }
    VcfReaderFactory(entries, sampleIndex, pushed, required.fieldNames,
      infoFields)
  }
}

case class VcfPartition(path: String, start: Long, end: Long, kind: Int)
    extends InputPartition

object VcfPartition {
  val Text = 0; val Bgzf = 1; val Gzip = 2
}

case class VcfReaderFactory(confEntries: Seq[(String, String)],
                            sampleIndex: Int, pushed: Array[Filter],
                            fields: Array[String],
                            infoFields: Seq[(String, String, String)] = Nil)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[VcfPartition]
    val conf = new Configuration(false)
    confEntries.foreach { case (k, v) => conf.set(k, v) }
    val lines = p.kind match {
      case VcfPartition.Bgzf => Bgzf.splitLines(conf, p.path, p.start, p.end)
      case VcfPartition.Gzip => VcfLineParser.gzipLines(conf, p.path)
      case _ => VcfLineParser.textSplitLines(conf, p.path, p.start, p.end)
    }
    new VcfPartitionReader(lines, sampleIndex, pushed, fields, infoFields)
  }
}

/** Iterates lines, applies the pushed predicates in staged order — prefix
  * predicates (chrom/pos/qual/filter, and typed INFO fields on field 8)
  * on a bounded partial parse, then sample-field predicates (gq/dp) right
  * after the FORMAT split — and only then parses the required columns
  * (sample maps and row assembly are skipped for every non-matching
  * line). */
class VcfPartitionReader(lines: Iterator[String], sampleIndex: Int,
                         pushed: Array[Filter], fields: Array[String],
                         infoFields: Seq[(String, String, String)] = Nil)
    extends PartitionReader[InternalRow] {
  private var row: InternalRow = _

  private val infoByCol: Map[String, (String, String)] =
    infoFields.map { case (c, k, t) => c -> (k, t) }.toMap

  // stage split: a predicate referencing any FORMAT-derived column is
  // evaluated after the FORMAT parse; everything else (chrom/pos/qual/
  // filter/info_*) on the line prefix
  private val (sampleFilters, prefixFilters) =
    pushed.partition(VcfFilterEval.referencesSample)

  // which leading fields the prefix predicates need: 2 = (chrom,pos),
  // 7 = through FILTER, 8 = through INFO — no further than required
  private val needFields = VcfFilterEval.fieldsNeeded(prefixFilters, infoByCol.keySet)
  private val anyInfoFilter = pushed.exists(_.references.exists(infoByCol.contains))

  private def ictxOf(f: Array[String]): VcfFilterEval.InfoCtx =
    if (!anyInfoFilter) null
    else new VcfFilterEval.InfoCtx(if (f.length > 7) f(7) else null, infoByCol)

  override def next(): Boolean = {
    row = null
    while (row == null && lines.hasNext) {
      val line = lines.next()
      if (!line.startsWith("#")) {
        val head = VcfLineParser.headFields(line, needFields)
        val chrom = if (head.length > 0) head(0) else null
        val pos = VcfLineParser.toLongOrNull(if (head.length > 1) head(1) else null)
        val ictx = ictxOf(head)
        if (prefixFilters.forall(VcfFilterEval.eval(_, chrom, pos, head, null, ictx))) {
          if (sampleFilters.isEmpty)
            row = VcfLineParser.parse(line, chrom, pos, sampleIndex, fields, infoByCol)
          else {
            // FORMAT stage: full tab split (needed by the parse anyway),
            // sample predicates on the typed GQ/DP extraction — row
            // assembly only happens for matching lines
            val f = line.split("\t", -1)
            val ctx = new VcfFilterEval.SampleCtx(f, sampleIndex)
            if (sampleFilters.forall(VcfFilterEval.eval(_, chrom, pos, f, ctx, ictxOf(f))))
              row = VcfLineParser.parseFields(f, chrom, pos, sampleIndex, fields, infoByCol)
          }
        }
      }
    }
    row != null
  }

  override def get(): InternalRow = row

  /** Releases the underlying FS stream on early termination (LIMIT
    * queries stop the reader before the iterator exhausts). */
  override def close(): Unit = lines match {
    case c: AutoCloseable => c.close()
    case _ => ()
  }
}

/** Scan-side evaluation of the pushable filter shapes: region predicates
  * on (chrom, pos) — `bcftools view -r` — plus `filter` equality/inclusion
  * (`-f PASS`) and `qual` comparisons (`-i 'QUAL>x'`), all evaluable on a
  * bounded prefix parse of the line; and the sample-field predicates
  * (`gq`/`dp` — the reference's `FORMAT/GQ[0]>20` pre-filter,
  * correct_genotypes_by_imputation.py:141-148) evaluated right after the
  * FORMAT split, before INFO parse / row assembly. */
object VcfFilterEval {
  private val strCols = Set("chrom", "filter")
  private val numCmp = Set("pos", "qual")
  // typed int columns derived from the FORMAT sample map (schema names →
  // FORMAT keys); evaluable only after the full tab split
  private val sampleCols = Map("gq" -> "GQ", "dp" -> "DP")

  def supported(f: Filter, infoCols: Set[String] = Set.empty): Boolean = {
    def col(a: String) = strCols(a) || numCmp(a) || sampleCols.contains(a) ||
      infoCols(a)
    f match {
      case EqualTo(a, _) => col(a)
      case In(a, _) => col(a)
      case IsNotNull(a) => col(a)
      case GreaterThan(a, _) => numCmp(a) || sampleCols.contains(a) || infoCols(a)
      case GreaterThanOrEqual(a, _) => numCmp(a) || sampleCols.contains(a) || infoCols(a)
      case LessThan(a, _) => numCmp(a) || sampleCols.contains(a) || infoCols(a)
      case LessThanOrEqual(a, _) => numCmp(a) || sampleCols.contains(a) || infoCols(a)
      case And(l, r) => supported(l, infoCols) && supported(r, infoCols)
      case Or(l, r) => supported(l, infoCols) && supported(r, infoCols)
      case _ => false
    }
  }

  /** Does this filter reference any FORMAT-derived column? Such filters
    * are staged after the FORMAT split (they may also reference prefix
    * columns — the full split covers those too). */
  def referencesSample(f: Filter): Boolean =
    f.references.exists(sampleCols.contains)

  /** Lazily-split FORMAT key/value context for one line: the keys are
    * dup-checked exactly like the full parse (so a malformed line throws
    * here, not silently mismatching the expression path), and GQ/DP
    * extract with the same toIntOrNull semantics as the `gq`/`dp`
    * columns. */
  final class SampleCtx(f: Array[String], sampleIndex: Int) {
    private var computed = false
    private var keys: Array[String] = _
    private var vals: Array[String] = _
    private def ensure(): Unit = if (!computed) {
      computed = true
      val k = if (f.length >= 9) f(8) else null
      val v = if (f.length >= 10 + sampleIndex) f(9 + sampleIndex) else null
      if (k != null && v != null) {
        val ks = k.split(":", -1)
        val vs = v.split(":", -1)
        val m = math.min(ks.length, vs.length)
        val kk = ks.take(m)
        VcfLineParser.requireDistinct(kk, "FORMAT")
        keys = kk
        vals = vs
      }
    }
    /** Typed int FORMAT field by schema column name; null when the key is
      * absent, the sample column is missing, or the value unparseable. */
    def int(col: String): java.lang.Integer = {
      ensure()
      if (keys == null) return null
      val key = sampleCols(col)
      var i = 0
      while (i < keys.length) {
        if (keys(i) == key) return VcfLineParser.toIntOrNull(vals(i))
        i += 1
      }
      null
    }
  }

  /** Lazily-parsed INFO key/value context for one line: duplicate keys
    * throw exactly like the full parse (str_to_map under mapKeyDedupPolicy
    * =EXCEPTION — path parity on the malformed files where it matters),
    * and typed access follows try_cast semantics ('.'/malformed → null).
    * `byCol` maps schema column name → (INFO key, declared type). */
  final class InfoCtx(raw: String, byCol: Map[String, (String, String)]) {
    private var computed = false
    private var m: java.util.HashMap[String, String] = _
    private def ensure(): Unit = if (!computed) {
      computed = true
      if (raw != null) {
        val parts = raw.split(";", -1)
        m = new java.util.HashMap[String, String](parts.length * 2)
        parts.foreach { part =>
          val e = part.indexOf('=')
          val (k, v) =
            if (e < 0) (part, null)
            else (part.substring(0, e), part.substring(e + 1))
          if (m.containsKey(k))
            throw new IllegalStateException(
              s"Duplicate map key $k was found in INFO; the vcf v2 parse " +
                "matches str_to_map under spark.sql.mapKeyDedupPolicy=EXCEPTION")
          m.put(k, v)
        }
      }
    }
    def handles(col: String): Boolean = byCol.contains(col)
    def kind(col: String): String = byCol(col)._2

    /** Present at all (null when the line has no INFO field — matching
      * map_contains_key over a null map). */
    def has(col: String): java.lang.Boolean = {
      ensure()
      if (m == null) null else java.lang.Boolean.valueOf(m.containsKey(byCol(col)._1))
    }
    /** Typed value for the column, null when absent/malformed/flag. */
    def value(col: String): Any = {
      ensure()
      if (m == null) return null
      val (key, tpe) = byCol(col)
      val v = m.get(key)
      if (v == null) null
      else tpe match {
        case "long" => VcfLineParser.toLongOrNull(v)
        case "double" =>
          if (v == null) null
          else try java.lang.Double.valueOf(v.trim)
          catch { case _: NumberFormatException => null }
        case "flag" => null // flag columns compare via has()
        case _ => v
      }
    }
  }

  /** How many leading tab fields the scan must split for these filters:
    * 2 covers (chrom,pos); qual is field 6, filter field 7, INFO field 8. */
  def fieldsNeeded(fs: Array[Filter], infoCols: Set[String] = Set.empty): Int = {
    def refs(f: Filter): Set[String] = f match {
      case And(l, r) => refs(l) ++ refs(r)
      case Or(l, r) => refs(l) ++ refs(r)
      case other => other.references.toSet
    }
    val all = fs.iterator.flatMap(refs).toSet
    if (all.exists(infoCols)) 8
    else if (all("filter")) 7 else if (all("qual")) 6 else 2
  }

  // Null-safe extraction: Spark can push an In/EqualTo whose value array
  // contains null (e.g. `col("pos").isin(100L, null)`); a null comparand
  // never matches under SQL three-valued logic, so it must read as
  // "non-match", not NPE in the executor.
  private def num(v: Any): java.lang.Long = v match {
    case n: Number => n.longValue()
    case _ => null
  }
  private def dbl(v: Any): java.lang.Double = v match {
    case n: Number => n.doubleValue()
    case _ => null
  }

  private def qualOf(head: Array[String]): java.lang.Double =
    if (head.length < 6 || head(5) == "." || head(5) == null) null
    else try java.lang.Double.valueOf(head(5).trim)
    catch { case _: NumberFormatException => null }
  private def filterOf(head: Array[String]): String =
    if (head.length < 7) null else head(6)

  /** Three-way comparison of a typed INFO value against a predicate
    * comparand; null = no decision (absent/malformed value — exact
    * non-match under SQL three-valued logic, since the re-applied engine
    * filter sees the same leniently-parsed null). */
  private def infoCmp(ictx: InfoCtx, c: String, v: Any): java.lang.Integer = {
    val g = ictx.value(c)
    (g, v) match {
      case (a: Number, b: Number) =>
        java.lang.Integer.valueOf(java.lang.Double.compare(a.doubleValue(), b.doubleValue()))
      case (a: String, b: String) => java.lang.Integer.valueOf(a.compareTo(b))
      case _ => null
    }
  }

  /** SQL three-valued logic collapsed to "keep?": null comparisons are
    * not-keep, matching the engine-side filter the row would hit anyway.
    * `ctx` supplies FORMAT-derived fields; sample-column predicates with
    * no ctx (prefix stage) read as non-match, but staging guarantees they
    * are only evaluated with one. `ictx` supplies typed INFO fields the
    * same way. */
  def eval(f: Filter, chrom: String, pos: java.lang.Long,
           head: Array[String], ctx: SampleCtx = null,
           ictx: InfoCtx = null): Boolean = f match {
    case EqualTo(c, v) if ictx != null && ictx.handles(c) =>
      v match {
        case b: java.lang.Boolean =>
          val h = ictx.has(c); h != null && h.booleanValue() == b.booleanValue()
        case _ =>
          val r = infoCmp(ictx, c, v); r != null && r.intValue() == 0
      }
    case In(c, vs) if ictx != null && ictx.handles(c) =>
      vs.exists {
        case b: java.lang.Boolean =>
          val h = ictx.has(c); h != null && h.booleanValue() == b.booleanValue()
        case v =>
          val r = infoCmp(ictx, c, v); r != null && r.intValue() == 0
      }
    case IsNotNull(c) if ictx != null && ictx.handles(c) =>
      if (ictx.kind(c) == "flag") ictx.has(c) != null else ictx.value(c) != null
    case GreaterThan(c, v) if ictx != null && ictx.handles(c) =>
      val r = infoCmp(ictx, c, v); r != null && r.intValue() > 0
    case GreaterThanOrEqual(c, v) if ictx != null && ictx.handles(c) =>
      val r = infoCmp(ictx, c, v); r != null && r.intValue() >= 0
    case LessThan(c, v) if ictx != null && ictx.handles(c) =>
      val r = infoCmp(ictx, c, v); r != null && r.intValue() < 0
    case LessThanOrEqual(c, v) if ictx != null && ictx.handles(c) =>
      val r = infoCmp(ictx, c, v); r != null && r.intValue() <= 0
    case EqualTo("chrom", v) => chrom != null && chrom == v
    case EqualTo("pos", v) =>
      val n = num(v); pos != null && n != null && pos.longValue() == n.longValue()
    case EqualTo("filter", v) => filterOf(head) == v && v != null
    case EqualTo("qual", v) =>
      val q = qualOf(head); val d = dbl(v)
      q != null && d != null && q.doubleValue() == d.doubleValue()
    case In("chrom", vs) => chrom != null && vs.contains(chrom)
    case In("pos", vs) =>
      pos != null && vs.exists { v =>
        val n = num(v); n != null && n.longValue() == pos.longValue()
      }
    case In("filter", vs) =>
      val fl = filterOf(head); fl != null && vs.contains(fl)
    case In("qual", vs) =>
      val q = qualOf(head)
      q != null && vs.exists { v =>
        val d = dbl(v); d != null && d.doubleValue() == q.doubleValue()
      }
    case IsNotNull("chrom") => chrom != null
    case IsNotNull("pos") => pos != null
    case IsNotNull("filter") => filterOf(head) != null
    case IsNotNull("qual") => qualOf(head) != null
    case GreaterThan("pos", v) =>
      val n = num(v); pos != null && n != null && pos.longValue() > n.longValue()
    case GreaterThanOrEqual("pos", v) =>
      val n = num(v); pos != null && n != null && pos.longValue() >= n.longValue()
    case LessThan("pos", v) =>
      val n = num(v); pos != null && n != null && pos.longValue() < n.longValue()
    case LessThanOrEqual("pos", v) =>
      val n = num(v); pos != null && n != null && pos.longValue() <= n.longValue()
    case GreaterThan("qual", v) =>
      val q = qualOf(head); val d = dbl(v)
      q != null && d != null && q.doubleValue() > d.doubleValue()
    case GreaterThanOrEqual("qual", v) =>
      val q = qualOf(head); val d = dbl(v)
      q != null && d != null && q.doubleValue() >= d.doubleValue()
    case LessThan("qual", v) =>
      val q = qualOf(head); val d = dbl(v)
      q != null && d != null && q.doubleValue() < d.doubleValue()
    case LessThanOrEqual("qual", v) =>
      val q = qualOf(head); val d = dbl(v)
      q != null && d != null && q.doubleValue() <= d.doubleValue()
    case EqualTo(c, v) if sampleCols.contains(c) =>
      val g = if (ctx == null) null else ctx.int(c); val n = num(v)
      g != null && n != null && g.longValue() == n.longValue()
    case In(c, vs) if sampleCols.contains(c) =>
      val g = if (ctx == null) null else ctx.int(c)
      g != null && vs.exists { v =>
        val n = num(v); n != null && n.longValue() == g.longValue()
      }
    case IsNotNull(c) if sampleCols.contains(c) =>
      ctx != null && ctx.int(c) != null
    case GreaterThan(c, v) if sampleCols.contains(c) =>
      val g = if (ctx == null) null else ctx.int(c); val n = num(v)
      g != null && n != null && g.longValue() > n.longValue()
    case GreaterThanOrEqual(c, v) if sampleCols.contains(c) =>
      val g = if (ctx == null) null else ctx.int(c); val n = num(v)
      g != null && n != null && g.longValue() >= n.longValue()
    case LessThan(c, v) if sampleCols.contains(c) =>
      val g = if (ctx == null) null else ctx.int(c); val n = num(v)
      g != null && n != null && g.longValue() < n.longValue()
    case LessThanOrEqual(c, v) if sampleCols.contains(c) =>
      val g = if (ctx == null) null else ctx.int(c); val n = num(v)
      g != null && n != null && g.longValue() <= n.longValue()
    case And(l, r) =>
      eval(l, chrom, pos, head, ctx, ictx) && eval(r, chrom, pos, head, ctx, ictx)
    case Or(l, r) =>
      eval(l, chrom, pos, head, ctx, ictx) || eval(r, chrom, pos, head, ctx, ictx)
    case _ => true
  }
}

/** Line → InternalRow parse, replaying [[Vcf.fromLines]]'s expression
  * semantics field-for-field (split with -1 limit, out-of-range
  * element_at → null, "."/"" handling, FORMAT raggedness slice) so the
  * two paths are row-identical — gated by VcfBedSpec on every fixture. */
object VcfLineParser {

  /** First `n` tab-separated fields without splitting the whole line —
    * the bounded prefix parse the pushed filters evaluate on. */
  def headFields(line: String, n: Int): Array[String] = {
    val out = new Array[String](n)
    var i = 0
    var from = 0
    while (i < n) {
      val tab = line.indexOf('\t', from)
      if (tab < 0) {
        out(i) = line.substring(from)
        return java.util.Arrays.copyOf(out, i + 1)
      }
      out(i) = line.substring(from, tab)
      from = tab + 1
      i += 1
    }
    out
  }

  def toLongOrNull(s: String): java.lang.Long =
    if (s == null) null
    else try java.lang.Long.valueOf(s.trim) catch { case _: NumberFormatException => null }

  private[sources] def toIntOrNull(s: String): java.lang.Integer =
    if (s == null) null
    else try java.lang.Integer.valueOf(s.trim) catch { case _: NumberFormatException => null }

  private def toDoubleOrNull(s: String): java.lang.Double =
    if (s == null) null
    else try java.lang.Double.valueOf(s.trim) catch { case _: NumberFormatException => null }

  private def utf8(s: String): UTF8String =
    if (s == null) null else UTF8String.fromString(s)

  /** element_at semantics: 1-based, out of range → null. */
  private def at(f: Array[String], i: Int): String =
    if (i >= 1 && i <= f.length) f(i - 1) else null

  /** Mirrors the expression path's DUPLICATE_MAP_KEY behavior: under the
    * default spark.sql.mapKeyDedupPolicy=EXCEPTION, map_from_arrays (FORMAT
    * sample map, Vcf.scala:136) and str_to_map (INFO, Vcf.scala:157) throw
    * on a repeated key — a silent last-wins here would make the two parse
    * paths diverge on exactly the malformed files where it matters. */
  private def duplicateKey(k: String, ctx: String): Nothing =
    throw new IllegalStateException(
      s"Duplicate map key $k was found in $ctx; the vcf v2 parse matches " +
        "map_from_arrays/str_to_map under spark.sql.mapKeyDedupPolicy=EXCEPTION")

  private[sources] def requireDistinct(keys: Array[String], ctx: String): Unit = {
    val seen = new java.util.HashSet[String](keys.length * 2)
    var i = 0
    while (i < keys.length) {
      if (!seen.add(keys(i))) duplicateKey(keys(i), ctx)
      i += 1
    }
  }

  def parse(line: String, chrom: String, pos: java.lang.Long,
            sampleIndex: Int, fields: Array[String],
            infoFields: Map[String, (String, String)] = Map.empty): InternalRow =
    parseFields(line.split("\t", -1), chrom, pos, sampleIndex, fields, infoFields)

  /** Parse from a pre-split field array (the FORMAT-predicate stage has
    * already paid for the tab split on lines it lets through).
    * `infoFields` maps typed-INFO column names (`info_an`) to their
    * (INFO key, type) for the `info_fields` option's columns. */
  def parseFields(f: Array[String], chrom: String, pos: java.lang.Long,
                  sampleIndex: Int, fields: Array[String],
                  infoFields: Map[String, (String, String)] = Map.empty): InternalRow = {

    // typed INFO lookups share one lazily-parsed raw map; duplicate keys
    // throw like str_to_map (parity with the `info` column + filter stage)
    var infoMapComputed = false
    var infoMapCache: java.util.HashMap[String, String] = null
    def infoRawMap: java.util.HashMap[String, String] = {
      if (!infoMapComputed) {
        infoMapComputed = true
        val info = at(f, 8)
        if (info != null) {
          val parts = info.split(";", -1)
          infoMapCache = new java.util.HashMap[String, String](parts.length * 2)
          parts.foreach { part =>
            val e = part.indexOf('=')
            val (k, v) =
              if (e < 0) (part, null)
              else (part.substring(0, e), part.substring(e + 1))
            if (infoMapCache.containsKey(k)) duplicateKey(k, "INFO")
            infoMapCache.put(k, v)
          }
        }
      }
      infoMapCache
    }

    // FORMAT sample map, built lazily once for the gt/ad/pl/dp/gq family
    var sampleComputed = false
    var sampleMap: Map[String, String] = null
    def sample: Map[String, String] = {
      if (!sampleComputed) {
        sampleComputed = true
        val keys = at(f, 9)
        val vals = at(f, 10 + sampleIndex)
        if (keys != null && vals != null) {
          val ks = keys.split(":", -1)
          val vs = vals.split(":", -1)
          val m = math.min(ks.length, vs.length)
          sampleMap = ks.take(m).zip(vs.take(m)).toMap
        }
      }
      sampleMap
    }
    def sampleField(k: String): String =
      if (sample == null) null else sample.getOrElse(k, null)

    def strMapData(m: Map[String, String], order: Seq[String]): ArrayBasedMapData =
      new ArrayBasedMapData(
        new GenericArrayData(order.map(utf8).toArray[Any]),
        new GenericArrayData(order.map(k => utf8(m(k))).toArray[Any]))

    val values = fields.map {
      case "chrom" => utf8(chrom)
      case "pos" => pos
      case "id" => utf8(at(f, 3))
      case "ref" => utf8(at(f, 4))
      case "alleles" =>
        val alt = at(f, 5)
        if (alt == null) null
        else new GenericArrayData(
          (at(f, 4) +: alt.split(",", -1).toSeq).map(utf8).toArray[Any])
      case "qual" =>
        val q = at(f, 6)
        if (q == ".") null else toDoubleOrNull(q)
      case "filter" => utf8(at(f, 7))
      case "info" =>
        val info = at(f, 8)
        if (info == null) null
        else {
          // str_to_map semantics: ";"-split keeps empties, "="-split limit
          // 2 (value = rest after first '='), entry without '=' → null value;
          // duplicate keys throw like str_to_map under the default
          // spark.sql.mapKeyDedupPolicy=EXCEPTION (path parity, spec-gated)
          val parts = info.split(";", -1)
          val order = scala.collection.mutable.LinkedHashSet.empty[String]
          val m = scala.collection.mutable.Map.empty[String, String]
          parts.foreach { part =>
            val e = part.indexOf('=')
            val (k, v) =
              if (e < 0) (part, null) else (part.substring(0, e), part.substring(e + 1))
            if (!order.add(k)) duplicateKey(k, "INFO")
            m(k) = v
          }
          strMapData(m.toMap, order.toSeq)
        }
      case "sample" =>
        val s = sample
        if (s == null) null
        else {
          // FORMAT order; duplicate FORMAT keys throw like map_from_arrays
          val keys = at(f, 9).split(":", -1)
          val m = math.min(keys.length, at(f, 10 + sampleIndex).split(":", -1).length)
          val kk = keys.take(m)
          requireDistinct(kk, "FORMAT")
          strMapData(s, scala.collection.immutable.ArraySeq.unsafeWrapArray(kk))
        }
      case "gt" =>
        val gt = sampleField("GT")
        if (gt == null) null
        else new GenericArrayData(
          gt.replace('|', '/').split("/", -1)
            .map(g => if (g == "." || g == "") null else toIntOrNull(g))
            .toArray[Any])
      case "ad" => intArrayData(sampleField("AD"))
      case "pl" => intArrayData(sampleField("PL"))
      case "dp" => toIntOrNull(sampleField("DP"))
      case "gq" => toIntOrNull(sampleField("GQ"))
      case "samples" =>
        // wide panel shape (readAllSamples parity): one FORMAT map per
        // sample column 10.., each sliced to the common key/value length
        val keys = at(f, 9)
        if (keys == null || f.length < 10) null
        else {
          val ks = keys.split(":", -1)
          val maps = (9 until f.length).map { i =>
            val vs = f(i).split(":", -1)
            val m = math.min(ks.length, vs.length)
            val kk = ks.take(m)
            requireDistinct(kk, "FORMAT")
            new ArrayBasedMapData(
              new GenericArrayData(kk.map(utf8).toArray[Any]),
              new GenericArrayData(vs.take(m).map(utf8).toArray[Any]))
          }
          new GenericArrayData(maps.toArray[Any])
        }
      case name if infoFields.contains(name) =>
        // typed INFO column: lenient try_cast semantics ('.'/malformed →
        // null), flag = key presence (null when the line has no INFO)
        val (key, tpe) = infoFields(name)
        val m = infoRawMap
        if (tpe == "flag") {
          if (m == null) null else java.lang.Boolean.valueOf(m.containsKey(key))
        } else {
          val v = if (m == null) null else m.get(key)
          if (v == null) null
          else tpe match {
            case "long" => toLongOrNull(v)
            case "double" => toDoubleOrNull(v)
            case _ => utf8(v)
          }
        }
      case other => throw new IllegalArgumentException(s"unknown vcf column $other")
    }
    InternalRow.fromSeq(values.toSeq)
  }

  private def intArrayData(s: String): GenericArrayData =
    if (s == null) null
    else new GenericArrayData(s.split(",", -1).map(x => toIntOrNull(x)).toArray[Any])

  /** Whole-file gzip line iterator (plain gzip only; BGZF takes the
    * splittable path). */
  def gzipLines(conf: Configuration, path: String): Iterator[String] with AutoCloseable = {
    val p = new Path(path)
    val in = new java.util.zip.GZIPInputStream(p.getFileSystem(conf).open(p))
    val br = new java.io.BufferedReader(
      new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
    new Iterator[String] with AutoCloseable {
      private var pending: String = _
      private var closed = false
      override def hasNext: Boolean = {
        if (pending == null && !closed) {
          pending = br.readLine()
          if (pending == null) close()
        }
        pending != null
      }
      override def next(): String = {
        if (!hasNext) throw new NoSuchElementException
        val r = pending; pending = null; r
      }
      override def close(): Unit = if (!closed) { closed = true; br.close() }
    }
  }

  /** Plain-text byte-range line iterator: split `[start, end)` owns the
    * lines whose first byte lies in `(start, end]` (from byte 0 when
    * `start == 0`) — the standard Hadoop LineRecordReader convention, so
    * ranges tile a file exactly once. */
  def textSplitLines(conf: Configuration, path: String,
                     start: Long, end: Long): Iterator[String] with AutoCloseable = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    in.seek(start)
    val lr = new LineReader(in)
    val text = new Text()
    var pos = start
    if (start != 0) pos += lr.readLine(text) // discard the straddler's tail

    new Iterator[String] with AutoCloseable {
      private var pending: String = _
      private var closed = false

      override def hasNext: Boolean = {
        if (pending == null && !closed) {
          if (pos > end) close()
          else {
            val n = lr.readLine(text)
            if (n == 0) close()
            else { pending = text.toString; pos += n }
          }
        }
        pending != null
      }

      override def next(): String = {
        if (!hasNext) throw new NoSuchElementException
        val r = pending; pending = null; r
      }

      override def close(): Unit = if (!closed) { closed = true; in.close() }
    }
  }
}
