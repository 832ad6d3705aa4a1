package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{bit_xor, col, struct, xxhash64}
import scala.collection.mutable

/** Names the source of d17_method_agreement's bimodal isolated timing
  * (r15 finding: 1.2–2.1 s spread across rounds with unchanged code;
  * r17 verdict slack item #6). Runs the query N times in one JVM and
  * attributes each iteration three ways:
  *
  *   - wall seconds (the bimodal signal itself);
  *   - JVM GC-time delta across the iteration (collector pressure —
  *     the sig/band self-join materializes a persisted relation every
  *     iteration because the bench protocol clearCache()s between);
  *   - per-stage executor-run-time totals bucketed by stage name, via
  *     a SparkListener — if one stage (the band self-join exchange,
  *     the simhash block join) doubles while the rest hold, the mode
  *     is plan/shuffle-side; if all stages scale together with GC, it
  *     is JVM-side.
  *
  * Diagnostic only — not in the bench sweep or the registry.
  *
  * r19: takes an optional registry-query argument (default
  * d17_method_agreement) — the same compile-lag signature turned up in
  * a4_clahe and g7_kcore (r18 verdict slack item #6), so the profiler
  * now runs against any registry entry:
  * `sbt "runMain graft.tools.D17Prof a4_clahe"`.
  */
object D17Prof {
  def main(args: Array[String]): Unit = {
    val query = args.headOption.getOrElse("d17_method_agreement")
    require(graft.SparkEntry.queries.contains(query), s"unknown registry query: $query")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "10").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(spark)

    // (stageId, execRunMs, shuffleWriteMs, cpuMs, name)
    val stageRun = mutable.ArrayBuffer.empty[(Int, Long, Long, Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        stageRun.synchronized {
          stageRun += ((sc.stageInfo.stageId, m.executorRunTime,
            m.shuffleWriteMetrics.writeTime / 1000000L,
            m.executorCpuTime / 1000000L,
            sc.stageInfo.name.takeWhile(_ != '\n').take(60)))
        }
      }
    })

    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def jitMs: Long =
      java.lang.management.ManagementFactory.getCompilationMXBean
        .getTotalCompilationTime
    // Whole-process CPU nanos (all threads): discriminates an inflated
    // iteration that is COMPUTING (procCpu ≈ inflation × cores-busy)
    // from one that is OFF-CPU — blocked or descheduled by host
    // contention (procCpu ≪ wall). r19: a4's warm inflation showed
    // ~8 s wall with ~1 s stage execRun, so the missing time needed
    // this attribution.
    def procCpuMs: Long =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime / 1000000L
        case _ => -1L
      }

    def run(): Unit = {
      val d = graft.SparkEntry.queries(query)(spark, sfDir)
      d.select(bit_xor(xxhash64(struct(d.columns.toIndexedSeq.map(col): _*)))).collect()
      ()
    }

    // TimeQ's exact discipline: one untimed warm run, ONE clearCache,
    // then timed iterations — iteration 1 is the cold rebuild, 2+ run
    // against the persisted sig (the 1.2–2.1 s bimodal band lives HERE;
    // clearing between iterations would measure the ~7 s cold build
    // every time and hide the warm modes entirely).
    run()
    spark.catalog.clearCache()
    println(f"${"iter"}%4s ${"wall_s"}%8s ${"gc_ms"}%7s ${"jit_ms"}%7s ${"procCpu_ms"}%11s ${"execRun_ms"}%11s ${"shufWr_ms"}%10s  stages top-3 execRun")
    (1 to iters).foreach { i =>
      stageRun.synchronized(stageRun.clear())
      val gc0 = gcMs
      val jit0 = jitMs
      val cpu0 = procCpuMs
      val t0 = System.nanoTime()
      run()
      val wall = (System.nanoTime() - t0) / 1e9
      val gcd = gcMs - gc0
      val jitd = jitMs - jit0
      val cpud = if (cpu0 < 0) -1L else procCpuMs - cpu0
      // The listener bus is async: the final stage-completed events can
      // still be queued when collect() returns, which would attribute
      // them to the NEXT iteration (or drop them at clear()). Settle
      // until the buffer stops growing before reading — wall time is
      // already captured above, so the wait costs nothing measured.
      var prevN = -1
      var curN = stageRun.synchronized(stageRun.length)
      while (curN != prevN) {
        Thread.sleep(100)
        prevN = curN
        curN = stageRun.synchronized(stageRun.length)
      }
      val stages = stageRun.synchronized(stageRun.toList)
      val exec = stages.map(_._2).sum
      val shuf = stages.map(_._3).sum
      val top = stages.sortBy(-_._2).take(3)
        .map { case (id, r, _, cpu, nm) => s"s$id:${r}ms(cpu${cpu}ms,$nm)" }
        .mkString(" ")
      println(f"$i%4d $wall%8.3f $gcd%7d $jitd%7d $cpud%11d $exec%11d $shuf%10d  $top")
    }
    spark.catalog.clearCache()
    spark.stop()
  }
}
