package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** `option("info_fields", ...)`: typed INFO columns on the DSv2 reader and
  * INFO-predicate pushdown into the scan (the reference's `INFO/AN>4` /
  * `INFO/VARIANT_TYPE` pre-filters). */
class VcfInfoFieldsSpec extends SparkSpec {

  private val lines = Seq(
    "##fileformat=VCFv4.2",
    "##INFO=<ID=AN,Number=1,Type=Integer,Description=\"alleles\">",
    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1",
    "chr1\t100\t.\tA\tT\t50\tPASS\tAN=2;AF=0.5;VARIANT_TYPE=snp;DB\tGT:GQ\t0/1:99",
    "chr1\t200\t.\tG\tC\t40\tPASS\tAN=6;AF=0.25;VARIANT_TYPE=h-indel\tGT:GQ\t0/1:30",
    "chr1\t300\t.\tT\tA\t30\tPASS\tAN=8;VARIANT_TYPE=snp\tGT:GQ\t1/1:12",
    "chr1\t400\t.\tC\tG\t20\tPASS\tAN=abc;AF=.\tGT:GQ\t0/1:77", // malformed AN, '.' AF
    "chr1\t500\t.\tA\tC\t10\tPASS\t.\tGT:GQ\t0/1:44") // empty INFO

  private def path(prefix: String): String = {
    val d = Files.createTempDirectory(prefix)
    Files.writeString(d.resolve("t.vcf"), lines.mkString("\n"))
    d.resolve("t.vcf").toString
  }

  private def readTyped(p: String) = spark.read.format("vcf")
    .option("info_fields", "AN:long,AF:double,VARIANT_TYPE,DB:flag").load(p)

  test("typed INFO columns materialize with try_cast leniency") {
    val df = readTyped(path("graftinfo1"))
    import org.apache.spark.sql.types._
    val byName = df.schema.map(f => f.name -> f.dataType).toMap
    assert(byName("info_an") == LongType && byName("info_af") == DoubleType &&
      byName("info_variant_type") == StringType && byName("info_db") == BooleanType)
    val rows = df.orderBy("pos")
      .select("pos", "info_an", "info_af", "info_variant_type", "info_db")
      .collect().map(_.toSeq)
    assert(rows(0) == Seq(100L, 2L, 0.5, "snp", true))
    assert(rows(1) == Seq(200L, 6L, 0.25, "h-indel", false))
    assert(rows(2) == Seq(300L, 8L, null, "snp", false))
    // malformed long and '.' double degrade to null, not errors
    assert(rows(3) == Seq(400L, null, null, null, false))
    // INFO '.' parses as the marker entry: keys absent, flag false
    assert(rows(4) == Seq(500L, null, null, null, false))
  }

  test("INFO predicates are pushed to the scan and row-identical (INFO/AN>4 parity)") {
    val p = path("graftinfo2")
    val q = readTyped(p).filter(col("info_an") > 4L)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("info_an"),
      s"INFO predicate must reach the scan: $plan")
    assert(q.select("pos").orderBy("pos").collect().map(_.getLong(0)).toSeq ==
      Seq(200L, 300L))
    // string equality (INFO/VARIANT_TYPE) and flag presence push too
    val s = readTyped(p).filter(col("info_variant_type") === "snp")
    assert(s.queryExecution.executedPlan.toString.contains("info_variant_type"))
    assert(s.select("pos").orderBy("pos").collect().map(_.getLong(0)).toSeq ==
      Seq(100L, 300L))
    val fl = readTyped(p).filter(col("info_db") === true)
    assert(fl.select("pos").collect().map(_.getLong(0)).toSeq == Seq(100L))
  }

  test("INFO + FORMAT predicate conjunction stages correctly") {
    val q = readTyped(path("graftinfo3"))
      .filter(col("info_an") >= 2L && col("gq") > 20)
    assert(q.select("pos").orderBy("pos").collect().map(_.getLong(0)).toSeq ==
      Seq(100L, 200L))
  }

  test("values parity with the expression path's withInfoFields") {
    val p = path("graftinfo4")
    // expression path: header-driven AN:long via infoSchema + manual extras
    val expr = Vcf.withInfoFields(Vcf.read(spark, p),
      Map("AN" -> "long", "VARIANT_TYPE" -> "string", "DB" -> "flag"))
      .orderBy("pos").select("an", "variant_type", "db")
      .collect().map(_.toSeq)
    val v2 = readTyped(p).orderBy("pos")
      .select("info_an", "info_variant_type", "info_db")
      .collect().map(_.toSeq)
    // full parity incl. malformed AN=abc and the '.' INFO marker — both
    // paths use try_cast leniency
    assert(v2.toSeq == expr.toSeq)
  }

  test("info_fields read shape writes cleanly (info_* columns ignored)") {
    val p = path("graftinfo5")
    val df = readTyped(p)
    val out = Files.createTempDirectory("graftinfo5o").resolve("out").toString
    df.write.format("vcf").mode("overwrite").save(out)
    val back = spark.read.format("vcf").load(out)
    assert(back.count() == 5)
    // the info map content round-tripped even though typed cols were dropped
    val an = back.filter(col("pos") === 200L)
      .select(element_at(col("info"), "AN")).head.getString(0)
    assert(an == "6")
  }
}
