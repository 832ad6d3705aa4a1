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
  *
  * r19 finding (verdict item #6, a4_clahe at sf0.1, 3 independent runs):
  * the a4/g7 warm 4x class is HOST CPU STEAL, not JIT compile-lag and
  * not codegen-cache thrash. Evidence: warm iterations show janino_n=0
  * (zero Janino recompiles — the generated-class cache holds) and
  * jit_ms <= 1.6 s, per-stage executorCpuTime is flat ~1.5–2.3 s across
  * fast AND slow iterations, but inflated iterations pair task run-time
  * >> task CPU-time (s183: 12.5 s run / 8.7 s cpu) with a /proc/stat
  * steal delta of the same seconds-order (4.5 s steal on a 5.0 s
  * iteration; 63 s steal across one 21.7 s cold build), while quiet
  * iterations carry <= 0.7 s steal and a 1.85–2.4 s wall floor. Guest
  * thread-CPU readings also inflate under steal, so procCpu alone
  * cannot discriminate — the steal column is the ground truth. No code
  * change can win this back; the bench min(sweep, isolated) rule plus
  * warm reval children are the correct mitigation.
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
      // match Bench.buildSession (r19): bound AQE plan-string rendering
      .config("spark.sql.maxPlanStringLength", "8192")
      // r20: codegen-class cache sized to the registry (see Bench.buildSession)
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "4096"))
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
    // Janino whole-stage-codegen compilations this JVM has run (cumulative
    // counter). Spark's generated-class cache is a STATIC conf capped at
    // spark.sql.codegen.cache.maxEntries (default 100): a session whose
    // plan churn exceeds it recompiles identical code every iteration —
    // CPU that lands in neither jit_ms (Janino is ordinary app code) nor
    // stage execRun (compilation happens on driver/AQE threads). A warm
    // iteration of an unchanged query should show janino_n == 0.
    def janinoN: Long =
      org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME.getCount
    // Per-thread CPU grouped by thread-name family (digits stripped):
    // names the off-stage CPU consumer when procCpu ≫ stage execRun —
    // task threads vs AQE stage-materialization pool vs broadcast pool
    // vs GC/JIT service threads all carry distinct name prefixes.
    val threadMx = java.lang.management.ManagementFactory.getThreadMXBean
    // Guest-visible host interference, from /proc/stat's aggregate cpu
    // line: steal (ticks the hypervisor ran someone else while this
    // guest was runnable) and iowait. A slow iteration whose per-stage
    // executorCpuTime is flat but whose steal delta spikes is host
    // contention, not engine work — the discriminator the bench
    // artifact-validity protocol needs on shared hosts.
    // Tick length from the kernel's CLK_TCK (r19 ADVICE: the previous
    // hardcoded *10 assumed USER_HZ=100; on a kernel exposing a
    // different USER_HZ the printed steal/iowait ms would be scaled
    // wrong). getconf once at startup; 100 Hz fallback on any failure.
    val tickMs: Long = try {
      val p = new ProcessBuilder("getconf", "CLK_TCK").start()
      val out = new String(p.getInputStream.readAllBytes, "UTF-8").trim
      p.waitFor()
      1000L / math.max(1L, out.toLong)
    } catch { case _: Exception => 10L }
    def stealIowaitTicks(): (Long, Long) = {
      try {
        val src = scala.io.Source.fromFile("/proc/stat")
        try {
          val cols = src.getLines().next().trim.split("\\s+")
          // cpu user nice system idle iowait irq softirq steal ...
          val io = if (cols.length > 5) cols(5).toLong else 0L
          val st = if (cols.length > 8) cols(8).toLong else 0L
          (st, io)
        } finally src.close()
      } catch { case _: Exception => (0L, 0L) }
    }
    def threadCpu(): Map[String, Long] = {
      val ids = threadMx.getAllThreadIds
      val out = mutable.Map.empty[String, Long]
      var i = 0
      while (i < ids.length) {
        val info = threadMx.getThreadInfo(ids(i))
        if (info != null) {
          val cpu = threadMx.getThreadCpuTime(ids(i))
          if (cpu > 0) {
            val fam = info.getThreadName.replaceAll("[0-9]+", "#")
            out(fam) = out.getOrElse(fam, 0L) + cpu / 1000000L
          }
        }
        i += 1
      }
      out.toMap
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
    println(f"${"iter"}%4s ${"wall_s"}%8s ${"gc_ms"}%7s ${"jit_ms"}%7s ${"janino_n"}%8s ${"procCpu_ms"}%11s ${"execRun_ms"}%11s ${"shufWr_ms"}%10s  stages top-3 execRun")
    (1 to iters).foreach { i =>
      stageRun.synchronized(stageRun.clear())
      val gc0 = gcMs
      val jit0 = jitMs
      val jan0 = janinoN
      val tc0 = threadCpu()
      val (st0, io0) = stealIowaitTicks()
      val cpu0 = procCpuMs
      val t0 = System.nanoTime()
      run()
      val wall = (System.nanoTime() - t0) / 1e9
      val gcd = gcMs - gc0
      val jitd = jitMs - jit0
      val jand = janinoN - jan0
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
      println(f"$i%4d $wall%8.3f $gcd%7d $jitd%7d $jand%8d $cpud%11d $exec%11d $shuf%10d  $top")
      val tc1 = threadCpu()
      val (st1, io1) = stealIowaitTicks()
      val byFam = tc1.map { case (fam, v) => fam -> (v - tc0.getOrElse(fam, 0L)) }
        .filter(_._2 > 50).toList.sortBy(-_._2).take(5)
      println("      thread-cpu: " + byFam.map { case (f, ms) => s"$f=${ms}ms" }.mkString(" ") +
        s"  steal=${(st1 - st0) * tickMs}ms iowait=${(io1 - io0) * tickMs}ms")
    }
    spark.catalog.clearCache()
    spark.stop()
  }
}
