package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{bit_xor, col, struct, xxhash64}

/** Times named registry queries (Bench's protocol: checksum-materialize
  * every column, warm first iteration kept separate) without paying for
  * the full bench sweep — the targeted-iteration loop for perf work.
  * Usage: runMain graft.tools.TimeQ <name> [name ...]; env
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS / SPARK_GRAFT_ITERS as usual.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(spark)
    def run(name: String): Unit = {
      val d = graft.SparkEntry.queries(name)(spark, sfDir)
      d.select(bit_xor(xxhash64(struct(d.columns.toIndexedSeq.map(col): _*)))).collect()
      ()
    }
    args.foreach { name =>
      try run(name) catch { case e: Throwable =>
        System.err.println(s"warmless first run failed $name: ${e.getMessage}") }
      spark.catalog.clearCache() // cold iteration 1, like Bench
      val times = (1 to iters).map { i =>
        val t0 = System.nanoTime()
        run(name)
        val dt = (System.nanoTime() - t0) / 1e9
        if (i == iters) spark.catalog.clearCache()
        dt
      }
      println(f"TIMEQ $name%-32s min ${times.min}%.3f  all ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
