package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for specs (one JVM-wide session, forked sbt test). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  implicit def sparkImplicit: SparkSession = spark
}

object SparkSpec {
  lazy val session: SparkSession = Spark.session("graft-test", cpus = "4")
}
