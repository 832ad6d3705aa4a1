package graft.tools

import org.apache.spark.sql.SparkSession

/** Construction-cost census over the whole registry (diagnostic): calls
  * each query function twice WITHOUT executing the result and reports
  * the second call's wall time — the steady-state per-action Dataset
  * construction cost a bench iteration pays before any task runs
  * (eager per-operation analysis, embedded driver actions like Grid's
  * bucket sizing; memoized entries show ~0). Found the r19 a5/a5b/d17
  * memoization candidates; run it when the slow tail shifts.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.BuildCensus [minMs]"
  */
object BuildCensus {
  def main(args: Array[String]): Unit = {
    val minMs = args.headOption.map(_.toLong).getOrElse(100L)
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

    // rawQueries, NOT queries (r19 ADVICE): the prepared-query memo
    // would make every second call a map hit (~0 ms) and the census
    // could no longer surface a construction-cost regression for the
    // memoized majority — the raw registry measures real construction.
    val results = graft.SparkEntry.rawQueries.toSeq.map { case (name, fn) =>
      val t0 = System.nanoTime()
      fn(spark, sfDir)
      val first = (System.nanoTime() - t0) / 1000000L
      val t1 = System.nanoTime()
      fn(spark, sfDir)
      val second = (System.nanoTime() - t1) / 1000000L
      (name, first, second)
    }
    println(f"${"query"}%-36s ${"first_ms"}%9s ${"second_ms"}%10s")
    results.filter(_._3 >= minMs).sortBy(-_._3).foreach { case (n, f, sec) =>
      println(f"$n%-36s $f%9d $sec%10d")
    }
    val total = results.map(_._3).sum
    println(s"TOTAL second-call construction: ${total}ms over ${results.size} queries (${results.count(_._3 >= minMs)} >= ${minMs}ms shown)")
    spark.catalog.clearCache()
    spark.stop()
  }
}
