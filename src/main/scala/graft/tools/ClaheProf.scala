package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.api.Engine
import graft.sources.RasterSource
import graft.ops.PixelOps
import graft.model._
object ClaheProf {
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
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val tiles = Engine.toDbTiles(RasterSource.scan(spark, "p", "vv", 4096, 4096)).persist()
    time("materialize tiles") { tiles.count() }
    val px = tiles.toDF().select(explode(col("pixels")).as("v"))
    val db = PixelOps.toDb(col("v"))
    val pxdb = px.withColumn("db", db).withColumn("valid", PixelOps.validMask(db))
    val (low, high, _) = time("stats") {
      graft.stats.FastStats.strategyParams(Engine.tileStats(tiles), "clahe") }
    val q = time("claheTiles plan+hist") { Engine.claheTiles(tiles, 4096, 4096, low, high, 255.0) }
    time("final transform + assemble") { Engine.assembleTiles(q, 4096, 4096) }
    spark.stop()
  }
}
