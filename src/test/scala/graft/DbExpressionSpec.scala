package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.PixelOps

/** The native codegen'd `graft_db` expression must agree bit-for-bit
  * with the composed-builtin PixelOps.toDb, through a session created
  * with the extensions installed.
  */
class DbExpressionSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // getOrCreate may return a session another suite built without the
    // extensions config — the live-session registration path covers it.
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.plans.GraftExtensions.register(s)
    s
  }

  test("graft_db SQL function matches the composed builtin form") {
    import spark.implicits._
    val df = Seq(0.0, 1e-12, 0.5, 1.0, 12345.678, 1e10).toDF("v")
    df.createOrReplaceTempView("vals")
    val native = spark.sql("SELECT graft_db(v) AS db FROM vals").collect().map(_.getDouble(0))
    val builtin = df.select(PixelOps.toDb(org.apache.spark.sql.functions.col("v")).as("db"))
      .collect().map(_.getDouble(0))
    assert(native.toSeq == builtin.toSeq)
    assert(native(0) == 10.0 * math.log10(1e-10), "floor applies")
    assert(native(3) == 0.0)
  }

  test("FuseDbRule rewrites the composed PixelOps.toDb pattern into the native node") {
    // non-foldable source (a literal relation would be constant-folded
    // before the fused node is observable)
    val df = spark.range(1, 4)
      .select(PixelOps.toDb(org.apache.spark.sql.functions.col("id")).as("db"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_db"),
      s"expected fused node in optimized plan:\n$optimized")
    // and the rewrite preserves values exactly
    val fused = df.collect().map(_.getDouble(0)).toSeq
    assert(fused == Seq(1L, 2L, 3L).map(v => 10.0 * math.log10(v.toDouble)))
  }

  test("graft_db participates in whole-stage codegen (no fallback errors) and aggregates") {
    val n = spark.sql(
      "SELECT COUNT(*) FROM (SELECT graft_db(CAST(id AS DOUBLE)) AS d FROM RANGE(10000)) WHERE d > 0")
      .collect()(0).getLong(0)
    assert(n == 9998L, "ids 2..9999 have db > 0 (10*log10(1)=0, id 0 floors to -100)")
  }
}
