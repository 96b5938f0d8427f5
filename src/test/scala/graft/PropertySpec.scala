package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.{PlMath, Stats, Text}
import graft.operators.Intervals
import org.apache.spark.sql.functions._

/** Property-based checks (ScalaCheck) for the algebraic invariants the
  * reference asserts ad hoc (SURVEY §5): conservation, monotonicity,
  * round-trips. */
class PropertySpec extends SparkSpec {
  // plain-ScalaCheck sampling (scalatestplus bridge isn't in the offline
  // dependency set): 60 deterministic samples per property
  private def forAll[A](g: Gen[A])(f: A => Unit): Unit =
    (0 until 60).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }
  private def forAll2[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    (0 until 60).foreach { i =>
      for {
        a <- ga.apply(Gen.Parameters.default, Seed(i.toLong))
        b <- gb.apply(Gen.Parameters.default, Seed(i.toLong + 1000))
      } f(a, b)
    }
  private def whenever(c: Boolean)(body: => Unit): Unit = if (c) body


  test("phred/unphred round-trip over (0, 1]") {
    forAll(Gen.choose(1e-10, 1.0)) { p =>
      val q = -10.0 * math.log10(p)
      val back = math.pow(10.0, -q / 10.0)
      assert(math.abs(back - p) <= 1e-9 * p)
    }
  }

  test("compressPl3 entries are lower bounds of their classes") {
    val plGen = Gen.choose(2, 4).flatMap { n =>
      Gen.listOfN(n * (n + 1) / 2, Gen.choose(0, 200))
    }
    forAll(plGen) { pl =>
      val c = PlMath.compressPl3(pl)
      assert(c.head == pl.head)
      assert(c.size == 3 && c.forall(v => pl.contains(v) || v == Int.MaxValue))
      assert(c(1) == Int.MaxValue || c(1) >= pl.min)
    }
  }

  test("toHaploid output is min-normalized and allele-count sized") {
    val plGen = Gen.choose(2, 4).flatMap { n =>
      Gen.listOfN(n * (n + 1) / 2, Gen.choose(0, 100))
    }
    forAll(plGen) { pl =>
      val h = PlMath.toHaploid(pl)
      assert(h.size == PlMath.nAlleles(pl.size))
      assert(h.min == 0)
    }
  }

  test("scaleContingencyTable conserves proportions to rounding") {
    val arrGen = Gen.nonEmptyListOf(Gen.choose(1L, 1000L)).suchThat(_.sum > 0)
    forAll2(arrGen, Gen.choose(10, 10000)) { (xs, n) =>
      import spark.implicits._
      val out = Seq(Tuple1(xs)).toDF("arr")
        .select(Stats.scaleContingencyTable(col("arr"), lit(n)))
        .head.getSeq[Long](0)
      // each cell within 0.5 of its exact share
      xs.zip(out).foreach { case (x, o) =>
        assert(math.abs(o - x.toDouble * n / xs.sum) <= 0.5 + 1e-9)
      }
    }
  }

  test("interval merge conserves covered bases and emits disjoint islands") {
    val ivGen = Gen.listOfN(40, for {
      s <- Gen.choose(0L, 1000L); len <- Gen.choose(1L, 120L)
    } yield ("c", s, s + len))
    forAll(ivGen) { ivs =>
      whenever(ivs.nonEmpty) {
        import spark.implicits._
        val merged = Intervals.merge(ivs.toDF("chrom", "start", "end"))
          .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
        def cover(xs: Seq[(Long, Long)]): Set[Long] =
          xs.flatMap { case (s, e) => s until e }.toSet
        assert(cover(merged.toSeq) == cover(ivs.map(i => (i._2, i._3))))
        merged.sliding(2).foreach {
          case Array((_, e1), (s2, _)) => assert(e1 < s2)
          case _ =>
        }
      }
    }
  }

  test("flow key expansion round-trips the sequence (F16)") {
    val seqGen = Gen.listOf(Gen.oneOf('T', 'G', 'C', 'A')).map(_.mkString)
    forAll(seqGen) { s =>
      val key = graft.functions.Genomics.flowKey(s)
      val rebuilt = key.zipWithIndex.flatMap { case (n, i) =>
        ("TGCA" (i % 4)).toString * n
      }.mkString
      assert(rebuilt == s)
    }
  }
}
