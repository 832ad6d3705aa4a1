package graft.tools

import org.apache.spark.sql.SparkSession

/** Reconstruction-overhead screen (r20 diagnostic, generalized from the
  * m6 finding): for each named registry query, prints
  *
  *   - `cold`   — first construct+run (arms any internal persists)
  *   - `warm`   — min re-collect of the SAME DataFrame instance (AQE
  *                query stages + shuffle files all reused: the floor)
  *   - `recon`  — min of fresh construct+run with the caches left armed
  *                (exactly what the bench's timed() loop measures for an
  *                extraIters entry on iterations 2+)
  *
  * A large recon/warm ratio means the published number is dominated by
  * re-run stage overhead DOWNSTREAM of the persist boundary, not by the
  * fixture build — the fix is moving the persist closer to the output
  * (the r20 m6 restructure: 2.7 s → 0.65 s). A recon ≈ warm query is
  * already persist-bounded and its number is the real steady state.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ReProf q1 q2 ..."
  */
object ReProf {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Seq("m6_frame_overlap")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.maxPlanStringLength", "8192")
      // r20: codegen-class cache sized to the registry (see Bench.buildSession)
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "4096"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftExtensions.register(spark)

    def sec[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    println(f"${"query"}%-36s ${"cold"}%6s ${"warm"}%6s ${"recon"}%6s ${"constr"}%6s  ratio")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val df = fn(spark, sfDir)
      val cold = sec(df.collect())
      val warm = (1 to 3).map(_ => sec(df.collect())).min
      val recon = (1 to 3).map(_ => sec(fn(spark, sfDir).collect())).min
      // construction alone (no action): the driver-side analysis cost a
      // fresh iteration pays before any task runs
      val constr = (1 to 3).map(_ => sec(fn(spark, sfDir))).min
      println(f"$name%-36s $cold%6.2f $warm%6.2f $recon%6.2f $constr%6.2f  ${recon / math.max(warm, 0.005)}%5.1fx")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
