package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.enhance.{Clahe, Grid}

/** Stage breakdown of the relational a4_clahe plan (dev utility). */
object A4Prof {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size); ()
      }
    })
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val j0 = jobs.get(); val s0 = stages.get()
      val r = f
      println(f"[a4prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"(${jobs.get() - j0} jobs, ${stages.get() - s0} stages)")
      r
    }
    (1 to 2).foreach { it =>
      println(s"[a4prof] --- iteration $it")
      val g = time("grid build (head job)")(Grid.df(spark, dir).persist())
      time("grid count (materialize cache)")(g.count())
      val st = time("stats over grid") {
        val s0 = graft.stats.HistStats.stats(g.filter(col("valid")).select(col("db")))
        s0.collect(); s0
      }
      val params = st.select(col("p01").as("low"), col("p99").as("high"),
        greatest(col("p99") - col("p01"), lit(1.0)).as("rng"))
      val px = g.crossJoin(org.apache.spark.sql.functions.broadcast(params))
        .withColumn("tile_h", expr(s"(rows_ + 7) div 8"))
        .withColumn("norm", when(col("valid"),
          (least(greatest(col("db"), col("low")), col("high")) - col("low")) / col("rng"))
          .otherwise(lit(0.0)))
        .withColumn("bin",
          round(least(greatest(col("norm"), lit(0.0)), lit(1.0)) * lit(255.0), 0).cast("int"))
        .withColumn("ty", expr("y div tile_h"))
        .withColumn("tx", expr(s"x div ${Clahe.TileW}"))
        .select(col("y"), col("x"), col("valid"), col("tile_h"),
          col("bin"), col("ty"), col("tx"))
        .persist()
      time("px materialize")(px.count())
      time("hist agg") {
        px.filter(col("valid")).groupBy(col("ty"), col("tx"), col("bin"))
          .agg(count(lit(1)).as("h")).collect()
      }
      spark.catalog.clearCache()
      time("full a4 query (cold)") {
        Clahe.query(spark, dir).select(sum(col("q"))).collect()
      }
      time("full a4 query (warm caches)") {
        Clahe.query(spark, dir).select(sum(col("q"))).collect()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
