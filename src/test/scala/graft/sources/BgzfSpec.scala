package graft.sources

import graft.SparkSpec
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import java.io.FileOutputStream
import java.nio.file.Files

class BgzfSpec extends SparkSpec {

  private val conf = new Configuration()

  private def writeFile(lines: Seq[String], blockBytes: Int): String = {
    val f = Files.createTempDirectory("graft_bgzf").resolve("t.gz").toFile
    val out = new FileOutputStream(f)
    try Bgzf.write(lines.iterator, out, blockBytes) finally out.close()
    f.getAbsolutePath
  }

  private def blockStarts(path: String): Seq[Long] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    val in = fs.open(p)
    try {
      val b = Seq.newBuilder[Long]
      var off = 0L
      while (off < len) {
        val next = Bgzf.findBlockStart(in, off, len)
        if (next < len) b += next
        off = math.max(next + 1, off + 1)
      }
      b.result()
    } finally in.close()
  }

  private val rnd = new scala.util.Random(11)
  private val lines: Seq[String] = (0 until 3000).map { i =>
    val len = rnd.nextInt(120)
    s"line$i " + ("x" * len)
  }

  test("multi-block roundtrip with many small splits is exact and parallel") {
    val path = writeFile(lines, blockBytes = 512)
    assert(blockStarts(path).length > 100, "corpus must span many blocks")
    val ds = Bgzf.readLines(spark, path, splitBytes = 2048)
    assert(ds.rdd.getNumPartitions > 10, "the read must genuinely split")
    assert(ds.collect().toSeq == lines)
  }

  test("handcrafted split boundaries: exact block starts, mid-block, inside-block") {
    val path = writeFile(lines, blockBytes = 512)
    val starts = blockStarts(path)
    val fileLen = {
      val p = new Path(path)
      p.getFileSystem(conf).getFileStatus(p).getLen
    }
    // boundaries: exactly on block starts, mid-block, and clustered so some
    // ranges contain no block start at all
    val cuts = (Seq(0L) ++ starts.slice(3, 6) ++ starts.slice(10, 12).map(_ + 7) ++
      Seq(starts(20) + 1, starts(20) + 2, starts(20) + 3) ++ Seq(fileLen)).distinct.sorted
    val ranges = cuts.zip(cuts.tail)
    val got = ranges.flatMap { case (s, e) =>
      Bgzf.splitLines(conf, path, s, e).toSeq
    }
    assert(got == lines)
  }

  test("a line spanning many blocks and whole split ranges is emitted exactly once") {
    val giant = "G" * 300000 // ~600 blocks at 512B — swallows whole splits
    val corpus = lines.take(50) ++ Seq(giant) ++ lines.slice(50, 100)
    val path = writeFile(corpus, blockBytes = 512)
    val got = Bgzf.readLines(spark, path, splitBytes = 1024).collect().toSeq
    assert(got == corpus)
  }

  test("readBgzf parses a bgzip VCF identically to the plain-text read, split >1") {
    val header = Seq(
      "##fileformat=VCFv4.2",
      "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1")
    val body = (1 to 4000).map { i =>
      s"chr${i % 5}\t${i * 10}\t.\tA\tT\t${i % 90}.5\tPASS\tDP=${i % 60}\tGT:DP\t0/1:${i % 40}"
    }
    val dir = Files.createTempDirectory("graft_bgzf_vcf")
    val plain = dir.resolve("t.vcf")
    Files.writeString(plain, (header ++ body).mkString("\n"))
    val gz = dir.resolve("t.vcf.gz").toFile
    val out = new FileOutputStream(gz)
    try Bgzf.write((header ++ body).iterator, out, blockBytes = 1024) finally out.close()

    val viaBgzf = Vcf.readBgzf(spark, gz.getAbsolutePath, splitBytes = 4096)
    assert(Bgzf.readLines(spark, gz.getAbsolutePath, splitBytes = 4096)
      .rdd.getNumPartitions > 1)
    val viaText = Vcf.read(spark, plain.toString)
    val a = viaBgzf.orderBy("chrom", "pos").collect().map(_.toString).toSeq
    val b = viaText.orderBy("chrom", "pos").collect().map(_.toString).toSeq
    assert(a == b && a.length == 4000)
  }

  test("Vcf.read auto-dispatches a bgzip file to the splittable reader") {
    val header = Seq(
      "##fileformat=VCFv4.2",
      "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1")
    val body = (1 to 500).map { i =>
      s"chr1\t${i * 10}\t.\tA\tT\t50\tPASS\tDP=$i\tGT\t0/1"
    }
    val dir = Files.createTempDirectory("graft_bgzf_auto")
    val gz = dir.resolve("t.vcf.gz").toFile
    val out = new FileOutputStream(gz)
    try Bgzf.write((header ++ body).iterator, out, blockBytes = 1024) finally out.close()
    val df = Vcf.read(spark, gz.getAbsolutePath)
    assert(df.count() == 500)
    // dispatch proof: the splittable path is RDD-backed, not a codec
    // FileScan (a tiny file still gets 1 split either way, so partition
    // count cannot distinguish the two)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("FileScan"), "bgzip file must take the BGZF reader")
  }

  test("isBgzf sniffs bgzip files and rejects plain text") {
    val path = writeFile(lines.take(10), blockBytes = 512)
    assert(Bgzf.isBgzf(conf, path))
    val txt = Files.createTempDirectory("graft_bgzf_txt").resolve("t.txt")
    Files.writeString(txt, lines.take(100).mkString("\n"))
    assert(!Bgzf.isBgzf(conf, txt.toString))
  }
}
