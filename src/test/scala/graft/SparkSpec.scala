package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession fixture (one JVM-wide session — getOrCreate
  * reuses it across suites, keeping `sbt test` fast).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    // graft_db / graft_dot and the fuse rule — the same surface Verify
    // and Bench register (getOrCreate may reuse a session built without
    // the extensions config)
    graft.plans.GraftExtensions.register(s)
    s
  }

  val Sf0001 = "/root/testdata/sf0.001"
}
