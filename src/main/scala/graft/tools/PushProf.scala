package graft.tools

import org.apache.spark.sql.SparkSession
import graft.api.Engine
import graft.model._
import graft.sources.RasterSource

/** Stage-level profile of the raster_pushdown_400mp bench case: where do
  * the ~0.5 s go (scan+persist, dB+stats, quantize+resize+collect)?
  * Diagnostic only — not part of the default sweep.
  */
object PushProf {
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
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // warmup: full pipeline twice (codegen/JIT at the real shapes)
    Engine.processBand(spark, "w", "vv", 20000, 20000,
      ProcessingParams(autoscale = AutoscaleStrategy.Standard, targetSize = Some(2048)),
      decimate = 8)
    (1 to 3).foreach { i =>
      println(s"run $i:")
      val total0 = System.nanoTime()
      val raw = t("scan+persist+count") {
        val r = RasterSource.scan(spark, "p", "vv", 20000, 20000, 8).persist()
        r.count(); r
      }
      val tiles = Engine.toDbTiles(raw)
      val st = t("dB+stats") { Engine.tileStats(tiles) }
      val quant = {
        val (low, high, gamma) = graft.stats.FastStats.strategyParams(st, "standard")
        Engine.quantizeTiles(tiles, low, high, gamma, 65535.0)
      }
      t("quantize+resize+collect") {
        Engine.collectResized(quant, 2500, 2500, Some(2048), 65535)
      }
      println(f"  total                        ${(System.nanoTime() - total0) / 1e9}%.3f s")
      raw.unpersist(blocking = true)
    }
    spark.stop()
  }
}
