package graft.tools
import org.apache.spark.sql.SparkSession
import graft.api.Engine
import graft.model._
object WarpBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      // r21 (ADVICE r20 #2): timing sessions must carry BOTH comparability
      // confs (CLAUDE.md rule) or isolated numbers drift vs Bench/TimeQ
      .config("spark.sql.maxPlanStringLength", "8192")
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "4096"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val meta = graft.meta.SafeMeta(crs = Some("EPSG:32632"),
      geotransform = Some(Array(730000.0, 10.0, 0.0, 5000000.0, 0.0, -10.0)))
    def once(): Unit = {
      Engine.processToBuffer(spark, "b", 4096, 4096,
        ProcessingParams(autoscale = AutoscaleStrategy.Standard, targetSize = Some(2048),
          targetCrs = Some("EPSG:32633")), meta)
      ()
    }
    once() // warm
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); once(); (System.nanoTime() - t0) / 1e9
    }
    println(f"[warpbench] min ${ts.min}%.2f s (runs: ${ts.map(t => f"$t%.2f").mkString(", ")})")
    spark.stop()
  }
}
