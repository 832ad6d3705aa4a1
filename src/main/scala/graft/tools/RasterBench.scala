package graft.tools

import org.apache.spark.sql.SparkSession
import graft.api.Engine
import graft.model._

/** E2E raster pipeline timings comparable to the reference's published
  * numbers (BASELINE.md): synthetic band → dB → autoscale → quantize →
  * assemble → resize.
  */
object RasterBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // r21 (ADVICE r20 #2): timing sessions must carry BOTH comparability
      // confs (CLAUDE.md rule) or isolated numbers drift vs Bench/TimeQ
      .config("spark.sql.maxPlanStringLength", "8192")
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "4096"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Unit): Unit = {
      // two runs, min: single-shot timings on shared infra are noisy
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: ${ts.min}%.2f s (runs: ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    // warmup (codegen/JIT)
    Engine.processBand(spark, "w", "vv", 512, 512,
      ProcessingParams(autoscale = AutoscaleStrategy.Standard, targetSize = Some(256)))
    Engine.processBand(spark, "w", "vv", 512, 512,
      ProcessingParams(autoscale = AutoscaleStrategy.Clahe, targetSize = Some(256)))
    time("standard 4096x4096 (16.8 MP) -> 2048") {
      Engine.processBand(spark, "p", "vv", 4096, 4096,
        ProcessingParams(autoscale = AutoscaleStrategy.Standard, targetSize = Some(2048)))
    }
    time("clahe 4096x4096 (16.8 MP) -> 2048") {
      Engine.processBand(spark, "p", "vv", 4096, 4096,
        ProcessingParams(autoscale = AutoscaleStrategy.Clahe, targetSize = Some(2048)))
    }
    time("standard 8192x8192 (67 MP) -> 2048") {
      Engine.processBand(spark, "p", "vv", 8192, 8192,
        ProcessingParams(autoscale = AutoscaleStrategy.Standard, targetSize = Some(2048)))
    }
    time("standard 20k x 20k (400 MP) decimate 8 -> 2048 (pushdown path)") {
      Engine.processBand(spark, "p", "vv", 20000, 20000,
        ProcessingParams(autoscale = AutoscaleStrategy.Standard, targetSize = Some(2048)),
        decimate = 8)
    }
    time("multiband tamed synRGB 4096x4096 -> 2048") {
      Engine.processMultiband(spark, "p", ("vv", "vh"), 4096, 4096,
        ProcessingParams(autoscale = AutoscaleStrategy.Tamed, targetSize = Some(2048)))
    }
    spark.stop()
  }
}
