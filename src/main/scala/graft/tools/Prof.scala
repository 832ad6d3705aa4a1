package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: stage-level timing of the a4 oracle plan — isolates the
  * Grid fixture (global row_number) from the CLAHE relational stages.
  * Run: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.Prof"
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      // r21 (ADVICE r20 #2): timing sessions must carry BOTH comparability
      // confs (CLAUDE.md rule) or isolated numbers drift vs Bench/TimeQ
      .config("spark.sql.maxPlanStringLength", "8192")
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "4096"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm the session
    spark.range(1000000).count()
    time("grid count")(graft.enhance.Grid.df(spark, dir).count())
    val g = graft.enhance.Grid.df(spark, dir).persist()
    time("grid persist+count")(g.count())
    time("a4 full (grid cached separately above, own persist inside)")(
      graft.enhance.Clahe.query(spark, dir).collect().length)
    g.unpersist()
    spark.stop()
  }
}
