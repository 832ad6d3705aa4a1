package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{bit_xor, col, struct, xxhash64}

/** Driver-side phase split for one registry query (diagnostic, not in
  * the sweep): per warm action, how much wall goes to Dataset
  * construction (registry fn, memo hit for memoized plans), analysis of
  * the bench hash wrapper, cache substitution + optimization, physical
  * planning, and actual execution. Motivated by the r19 a4_clahe
  * finding (D17Prof): on a QUIET host a4's warm wall is ~1.9 s of which
  * ~1.6 s is `main`-thread CPU while summed task time is ~0.1–0.3 s of
  * wall — i.e. the warm floor is driver PLANNING, not compute, and this
  * tool names the phase.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.PlanPhase a4_clahe"
  */
object PlanPhase {
  def main(args: Array[String]): Unit = {
    val query = args.headOption.getOrElse("a4_clahe")
    require(graft.SparkEntry.queries.contains(query), s"unknown registry query: $query")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "6").toInt
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // A/B lever for the r19 finding: AQE renders + redacts the full plan
    // description per stage update on the driver thread; capping the
    // plan-string length bounds that cost for plans embedding big cached
    // lineages (a4 warm min 1.89 s → 1.10 s measured here). Defaults to
    // the production value (Bench.buildSession); set
    // SPARK_GRAFT_MAXPLANSTR=unset to measure Spark's unbounded default.
    sys.env.getOrElse("SPARK_GRAFT_MAXPLANSTR", "8192") match {
      case "unset" => ()
      case n => builder.config("spark.sql.maxPlanStringLength", n)
    }
    // r20: codegen-class cache sized to the registry (see
    // Bench.buildSession); SPARK_GRAFT_CODEGEN_CACHE=100 restores the
    // Spark default for A/B.
    builder.config("spark.sql.codegen.cache.maxEntries",
      sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "4096"))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(spark)

    def ms(t0: Long): Long = (System.nanoTime() - t0) / 1000000L

    // one untimed cold run + ONE clearCache, like TimeQ/D17Prof
    {
      val d = graft.SparkEntry.queries(query)(spark, sfDir)
      d.select(bit_xor(xxhash64(struct(d.columns.toIndexedSeq.map(col): _*)))).collect()
    }
    spark.catalog.clearCache()
    println(f"${"iter"}%4s ${"build"}%7s ${"analyze"}%8s ${"optimize"}%9s ${"physical"}%9s ${"execute"}%8s ${"total"}%7s  (ms)")
    (1 to iters).foreach { i =>
      val tAll = System.nanoTime()
      var t0 = System.nanoTime()
      val d = graft.SparkEntry.queries(query)(spark, sfDir)
      val tBuild = ms(t0)

      t0 = System.nanoTime()
      val wrapped = d.select(bit_xor(xxhash64(struct(d.columns.toIndexedSeq.map(col): _*))))
      val qe = wrapped.queryExecution
      qe.assertAnalyzed()
      val tAna = ms(t0)

      t0 = System.nanoTime()
      qe.optimizedPlan // forces withCachedData + optimizer
      val tOpt = ms(t0)

      t0 = System.nanoTime()
      qe.executedPlan // physical planning + AQE prep
      val tPhy = ms(t0)

      // sample the driver thread's stack during execution: names the
      // main-thread CPU consumer the phase split can't see (AQE loop,
      // broadcast wait, result decode, ...)
      val mainThread = Thread.currentThread()
      val samples = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
      @volatile var sampling = true
      val sampler = new Thread(() => {
        while (sampling) {
          val st = mainThread.getStackTrace
          if (st.nonEmpty) {
            // first non-Thread frame plus the deepest graft/spark frame family
            val top = st.find(f => !f.getClassName.startsWith("java.lang.Thread"))
              .map(f => s"${f.getClassName.split('.').takeRight(2).mkString(".")}.${f.getMethodName}")
              .getOrElse("?")
            samples.merge(top, 1, (a, b) => a + b)
          }
          Thread.sleep(20)
        }
      })
      sampler.setDaemon(true)
      t0 = System.nanoTime()
      sampler.start()
      wrapped.collect()
      sampling = false
      val tExe = ms(t0)
      val hot = {
        import scala.jdk.CollectionConverters._
        samples.asScala.toList.sortBy(-_._2).take(4)
          .map { case (f, n) => s"$f=${n * 20}ms" }.mkString(" ")
      }
      println(f"$i%4d $tBuild%7d $tAna%8d $tOpt%9d $tPhy%9d $tExe%8d ${ms(tAll)}%7d")
      println(s"      main-stack: $hot")
      if (i == iters && sys.env.get("SPARK_GRAFT_PLANPHASE_EXPLAIN").contains("1"))
        println(qe.executedPlan.toString.take(8000))
    }
    spark.catalog.clearCache()
    spark.stop()
  }
}
