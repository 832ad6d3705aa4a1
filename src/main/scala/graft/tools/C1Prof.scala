package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cold-path stage breakdown of c1_curation_funnel (dev utility). */
object C1Prof {
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
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[c1prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 2).foreach { it =>
      println(s"[c1prof] --- iteration $it (cold)")
      spark.catalog.clearCache()
      val labels = time("clusterIds construct (runs CC loop)")(
        graft.ext.Dedup.clusterIds(spark, dir))
      time("labels count")(labels.count())
      val funnel = time("funnel construct (incl. 2nd clusterIds)")(
        graft.ext.Curation.funnel(spark, dir))
      time("funnel action")(funnel.collect())
      time("funnel action warm")(graft.ext.Curation.funnel(spark, dir).collect())
      println("[c1prof] --- full cold c1 (clearCache first)")
      spark.catalog.clearCache()
      time("full cold c1")(graft.ext.Curation.funnel(spark, dir).collect())
      time("full warm c1")(graft.ext.Curation.funnel(spark, dir).collect())
    }
    spark.stop()
  }
}
