package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession fixture (UTC, 4 shuffle partitions — same
  * shape as the driver's Verify/Bench sessions).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  def sf0001 = "/root/testdata/sf0.001"

  /** Deterministic property check over a ScalaCheck Gen (the
    * scalatest-plus bridge isn't in the offline cache).
    */
  def forAllN[A](gen: org.scalacheck.Gen[A], n: Int = 50)(f: A => Unit): Unit = {
    val params = org.scalacheck.Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(42L)
    (1 to n).foreach { _ =>
      gen.apply(params, seed).foreach(f)
      seed = seed.next
    }
  }
}

object SparkSpec {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // graft session default (see Bench.scala for the rationale): keep
    // object aggregates on the hash path at realistic group counts
    .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
      "1000000")
    .appName("graft-test")
    .getOrCreate()
}
