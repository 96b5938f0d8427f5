package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThan, LessThanOrEqual}
import java.nio.file.Files

/** Tabix `.tbi` production + consumption: binary round trip, bin math,
  * END-aware extents, split pruning through the DataSourceV2 scan, and
  * the write path's `option("index","tbi"/"gidx")` sidecars. */
class TabixSpec extends SparkSpec {

  private def header = Seq("##fileformat=VCFv4.2",
    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1")
  private def body(chrom: String, n: Int, step: Int = 1) =
    (1 to n).map(i => s"$chrom\t${i * step}\t.\tA\tT\t50\tPASS\tDP=$i\tGT:DP\t0/1:$i")

  private def writeBgzf(lines: Seq[String], blockBytes: Int = 512): java.nio.file.Path = {
    val d = Files.createTempDirectory("grafttbx")
    val p = d.resolve("t.vcf.gz")
    val os = Files.newOutputStream(p)
    Bgzf.write(lines.iterator, os, blockBytes)
    os.close()
    p
  }

  test("reg2bin / reg2bins agree: a contained feature's bin is always searched") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 500) {
      val beg = rnd.nextInt(1 << 28).toLong
      val len = 1L + rnd.nextInt(100000)
      val bin = Tabix.reg2bin(beg, beg + len)
      assert(bin >= 0 && bin <= 37448)
      // any query overlapping the feature must list its bin
      val qBeg = math.max(0L, beg - rnd.nextInt(1000))
      val qEnd = beg + len + rnd.nextInt(1000)
      assert(Tabix.reg2bins(qBeg, qEnd).contains(bin),
        s"feature [$beg,${beg + len}) bin $bin missing from query [$qBeg,$qEnd)")
    }
    // level sanity: a 16kb-contained feature lands in the deepest level
    assert(Tabix.reg2bin(0, 1) == 4681)
    assert(Tabix.reg2bin(16384, 16385) == 4682)
    assert(Tabix.reg2bin(0, (1L << 29)) == 0)
  }

  test("builder → write → read binary round trip with chunk queries") {
    val conf = spark.sessionState.newHadoopConf()
    val d = Files.createTempDirectory("grafttbxrt")
    val base = d.resolve("x.vcf.gz").toString
    val b = new Tabix.Builder
    // two refs, features at distinct virtual offsets
    b.add(Tabix.Feature("chr1", 99, 100, 0L << 16 | 10, 0L << 16 | 50))
    b.add(Tabix.Feature("chr1", 199, 200, 0L << 16 | 50, 1024L << 16 | 20))
    b.add(Tabix.Feature("chr2", 9, 10, 2048L << 16 | 0, 2048L << 16 | 40))
    Tabix.write(conf, base, b)
    val Some(idx) = Tabix.read(conf, base + Tabix.Suffix)
    assert(idx.names == Seq("chr1", "chr2"))
    // query hitting chr1:100 returns the merged chunk containing it
    val c1 = Tabix.chunksFor(idx, "chr1", 99, 100)
    assert(c1.nonEmpty && c1.exists { case (u, v) => u <= (0L << 16 | 10) && v > (0L << 16 | 10) })
    // absent ref is provably empty; far-away region likewise
    assert(Tabix.chunksFor(idx, "chr9", 0, 1000).isEmpty)
    assert(Tabix.chunksFor(idx, "chr2", 1000000, 1000001).isEmpty)
  }

  test("unsorted input is refused at build time") {
    val b = new Tabix.Builder
    b.add(Tabix.Feature("chr1", 100, 101, 0, 1))
    intercept[IllegalArgumentException] {
      b.add(Tabix.Feature("chr1", 50, 51, 1, 2))
    }
    val b2 = new Tabix.Builder
    b2.add(Tabix.Feature("chr1", 1, 2, 0, 1))
    b2.add(Tabix.Feature("chr2", 1, 2, 1, 2))
    intercept[IllegalArgumentException] {
      b2.add(Tabix.Feature("chr1", 5, 6, 2, 3)) // chr1 again: not contiguous
    }
  }

  test("buildForVcf + pruneSplits: a one-region query keeps a strict subset, row-identical") {
    val p = writeBgzf(header ++ body("chr1", 3000, step = 7) ++ body("chr2", 3000, step = 7))
    val conf = spark.sessionState.newHadoopConf()
    Tabix.buildForVcf(conf, p.toString)
    assert(Files.exists(p.resolveSibling("t.vcf.gz.tbi")))

    // only the .tbi exists (no .gidx): the scan must prune through it
    def v2 = spark.read.format("vcf").option("split_bytes", "1024").load(p.toString)
    val total = v2.rdd.getNumPartitions
    assert(total > 4, s"need multiple splits for a meaningful prune (got $total)")
    val q = v2.filter(col("chrom") === "chr2" && col("pos") <= 700)
    assert(q.rdd.getNumPartitions < total,
      s"one-region query must plan a strict subset of splits (kept ${q.rdd.getNumPartitions} of $total)")
    assert(q.count() == 100L)
    // boundary exactness across the whole file
    val full = v2.filter(col("chrom") === "chr1").agg(sum("pos")).head.getLong(0)
    assert(full == (1 to 3000).map(_.toLong * 7).sum)
    // no-hit chrom prunes everything
    val none = v2.filter(col("chrom") === "chr9")
    assert(none.rdd.getNumPartitions == 0 && none.count() == 0L)
  }

  test("END-aware extents: a gVCF block is found by a mid-block locus query") {
    // one gVCF-style block chr1:1000 END=200000 among sparse later rows
    val lines = header ++
      Seq(s"chr1\t1000\t.\tA\t<NON_REF>\t.\t.\tEND=200000\tGT:DP\t0/0:30") ++
      (1 to 2000).map(i => s"chr1\t${200001 + i * 5}\t.\tA\tT\t50\tPASS\tDP=$i\tGT:DP\t0/1:$i")
    val p = writeBgzf(lines)
    val conf = spark.sessionState.newHadoopConf()
    Tabix.buildForVcf(conf, p.toString)
    val Some(idx) = Tabix.read(conf, p.toString + Tabix.Suffix)
    // a locus inside the block but far from its start line
    val mid = Tabix.chunksFor(idx, "chr1", 150000, 150001)
    assert(mid.nonEmpty, "END-widened block must be reachable from a mid-block locus")
    // the engine-side filter pos=150000 matches no ROW (pos is the start),
    // so e2e semantics stay row-identical — this gate is about the index
    // never hiding the block's bytes from a region scan
    val kept = Tabix.pruneSplits(conf, p.toString,
      Files.getLastModifiedTime(p).toMillis,
      Array(EqualTo("chrom", "chr1"), GreaterThan("pos", 999L), LessThanOrEqual("pos", 1000L)),
      Seq(VcfPartition(p.toString, 0, Files.size(p), VcfPartition.Bgzf)))
    assert(kept.exists(_.nonEmpty))
  }

  test("a .tbi older than the data file is ignored") {
    val p = writeBgzf(header ++ body("chr1", 500))
    val conf = spark.sessionState.newHadoopConf()
    Tabix.buildForVcf(conf, p.toString)
    // data mtime moves past the index: pruning must refuse
    Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + 60000))
    val splits = Seq(VcfPartition(p.toString, 0, Files.size(p), VcfPartition.Bgzf))
    val r = Tabix.pruneSplits(conf, p.toString,
      Files.getLastModifiedTime(p).toMillis,
      Array(EqualTo("chrom", "chr1")), splits)
    assert(r.isEmpty, "stale .tbi must not prune")
  }

  test("df.write option(index=tbi) ships a .tbi per part; region reads prune through it") {
    val src = writeBgzf(header ++ body("chr1", 2000, step = 3) ++ body("chr2", 2000, step = 3))
    val conf = spark.sessionState.newHadoopConf()
    val df = spark.read.format("vcf").load(src.toString).orderBy("chrom", "pos")
    val out = Files.createTempDirectory("grafttbxw").resolve("out").toString
    df.write.format("vcf").mode("overwrite")
      .option("compression", "bgzf").option("bgzf_block_bytes", "512")
      .option("index", "tbi").save(out)
    val fs = new org.apache.hadoop.fs.Path(out).getFileSystem(conf)
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(out)).map(_.getPath.getName)
    val parts = names.filter(_.endsWith(".vcf.gz"))
    assert(parts.nonEmpty && parts.forall(p => names.contains(p + ".tbi")),
      s"every part must carry a .tbi sidecar: ${names.mkString(",")}")
    // region read over the just-written directory: subset of splits, exact rows
    def back = spark.read.format("vcf").option("split_bytes", "1024").load(out)
    val total = back.rdd.getNumPartitions
    val q = back.filter(col("chrom") === "chr1" && col("pos") <= 300)
    assert(q.rdd.getNumPartitions < total)
    assert(q.count() == 100L)
  }

  // independent CSI encoder (spec-derived, not the production writer) so
  // readCsi is checked against hand-built bytes, not its own inverse
  private def encodeCsi(refs: Seq[(String, Map[Int, Seq[(Long, Long)]])],
                        minShift: Int, depth: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val o = new java.io.DataOutputStream(bos)
    def i32(v: Int): Unit = { o.write(v & 0xff); o.write((v >> 8) & 0xff)
      o.write((v >> 16) & 0xff); o.write((v >> 24) & 0xff) }
    def i64(v: Long): Unit = { i32((v & 0xffffffffL).toInt); i32((v >>> 32).toInt) }
    o.write('C'); o.write('S'); o.write('I'); o.write(1)
    i32(minShift); i32(depth)
    val names = refs.map(_._1.getBytes("UTF-8"))
    val lNm = names.map(_.length + 1).sum
    i32(28 + lNm)
    i32(2); i32(1); i32(2); i32(0); i32('#'); i32(0); i32(lNm)
    names.foreach { nb => o.write(nb); o.write(0) }
    i32(refs.length)
    refs.foreach { case (_, bins) =>
      i32(bins.size)
      bins.foreach { case (bin, chunks) =>
        i32(bin); i64(0L); i32(chunks.size)
        chunks.foreach { case (u, v) => i64(u); i64(v) }
      }
    }
    o.flush(); bos.toByteArray
  }

  test("CSI: depth-6 index addresses a locus past 2^29 (what .csi exists for)") {
    val conf = spark.sessionState.newHadoopConf()
    val d = Files.createTempDirectory("graftcsi")
    val csiPath = d.resolve("big.vcf.gz.csi").toString
    // a feature at pos ~3e9 — unaddressable by .tbi's 5-level scheme
    val beg = 3000000000L
    val bin = (37449L + (beg >> 14)).toInt // deepest level, depth=6/minShift=14
    val bytes = encodeCsi(
      Seq("chr1" -> Map(bin -> Seq((1024L << 16 | 7L, 1024L << 16 | 99L)))),
      minShift = 14, depth = 6)
    val os = Files.newOutputStream(d.resolve("big.vcf.gz.csi"))
    Bgzf.writeBytes(bytes, os); os.close()
    val Some(idx) = Tabix.readCsi(conf, csiPath)
    assert(idx.minShift == 14 && idx.depth == 6 && idx.maxPos == (1L << 32))
    val hit = Tabix.chunksFor(idx, "chr1", beg, beg + 1)
    assert(hit == Seq((1024L << 16 | 7L, 1024L << 16 | 99L)))
    assert(Tabix.chunksFor(idx, "chr1", 100, 200).isEmpty)
    assert(Tabix.chunksFor(idx, "chrX", beg, beg + 1).isEmpty)
  }

  test("a lone .csi sidecar prunes splits end-to-end (bcftools-indexed input)") {
    val p = writeBgzf(header ++ body("chr1", 3000, step = 7) ++ body("chr2", 3000, step = 7))
    val conf = spark.sessionState.newHadoopConf()
    // build the .tbi, transcode its bins/chunks into a .csi, drop the .tbi —
    // leaving exactly what a bcftools-indexed foreign file ships
    Tabix.buildForVcf(conf, p.toString)
    val Some(tbi) = Tabix.read(conf, p.toString + Tabix.Suffix)
    val refs = tbi.refs.map(r => r.name -> r.bins.map { case (b, cs) => b -> cs.toSeq })
    val os = Files.newOutputStream(p.resolveSibling(p.getFileName.toString + ".csi"))
    Bgzf.writeBytes(encodeCsi(refs, minShift = 14, depth = 5), os); os.close()
    Files.delete(p.resolveSibling(p.getFileName.toString + ".tbi"))

    def v2 = spark.read.format("vcf").option("split_bytes", "1024").load(p.toString)
    val total = v2.rdd.getNumPartitions
    val q = v2.filter(col("chrom") === "chr2" && col("pos") <= 700)
    assert(q.rdd.getNumPartitions < total,
      s"csi-pruned query must plan a strict subset (kept ${q.rdd.getNumPartitions} of $total)")
    assert(q.count() == 100L)
    assert(v2.filter(col("chrom") === "chr1").agg(sum("pos")).head.getLong(0) ==
      (1 to 3000).map(_.toLong * 7).sum)
  }

  test("randomized soundness: .tbi pruning never loses a matching row") {
    val rnd = new scala.util.Random(20260813)
    val lines = header ++ Seq("chr1", "chr2", "chr3").flatMap { c =>
      // irregular position gaps so bins/linear windows land unevenly
      Iterator.iterate(1L)(_ + 1 + rnd.nextInt(400)).take(800 + rnd.nextInt(800))
        .map(p => s"$c\t$p\t.\tA\tT\t50\tPASS\tDP=1\tGT:DP\t0/1:3").toSeq
    }
    val p = writeBgzf(lines, blockBytes = 256)
    val conf = spark.sessionState.newHadoopConf()
    Tabix.buildForVcf(conf, p.toString)
    def pruned = spark.read.format("vcf").option("split_bytes", "512").load(p.toString)
    val truth = Vcf.read(spark, p.toString) // expression path: never pruned
    for (_ <- 1 to 12) {
      val c = s"chr${1 + rnd.nextInt(4)}" // incl. a chrom absent from the file
      val a = rnd.nextInt(120000).toLong
      val b = a + rnd.nextInt(30000)
      val cond = rnd.nextInt(3) match {
        case 0 => col("chrom") === c && col("pos") >= a && col("pos") <= b
        case 1 => col("chrom") === c && col("pos") === a // point query
        case _ => col("pos") >= a && col("pos") <= b // pos-only, all chroms
      }
      val got = pruned.filter(cond).count()
      val want = truth.filter(cond).count()
      assert(got == want, s"pruned=$got truth=$want for $cond")
    }
  }

  test("df.write option(index=gidx) builds a fresh sidecar; write→read round trip prunes") {
    val src = writeBgzf(header ++ body("chr1", 2000) ++ body("chr2", 2000))
    val df = spark.read.format("vcf").load(src.toString)
    val out = Files.createTempDirectory("graftgidxw").resolve("out").toString
    // one file per chrom (overwrite then append) so file-level stats give
    // the prune something to drop deterministically
    df.filter(col("chrom") === "chr1").coalesce(1).write.format("vcf")
      .mode("overwrite").option("index", "gidx").save(out)
    df.filter(col("chrom") === "chr2").coalesce(1).write.format("vcf")
      .mode("append").option("index", "gidx").save(out)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(out).getFileSystem(conf)
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(out)).map(_.getPath.getName)
    val parts = names.filter(_.endsWith(".vcf"))
    assert(parts.nonEmpty && parts.forall(p => names.contains(p + VcfIndex.Suffix)),
      s"every part must carry a .gidx sidecar: ${names.mkString(",")}")
    def back = spark.read.format("vcf").load(out)
    val total = back.rdd.getNumPartitions
    val q = back.filter(col("chrom") === "chr2")
    assert(q.rdd.getNumPartitions < total,
      "a chrom-restricted read of a chrom-partitioned write must drop whole files")
    assert(q.count() == 2000L)
  }
}
