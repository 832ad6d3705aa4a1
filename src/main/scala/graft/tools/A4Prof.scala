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
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[a4prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 2).foreach { it =>
      println(s"[a4prof] --- iteration $it")
      val g = time("grid materialize")(Grid.df(spark, dir).persist())
      time("grid count")(g.count())
      time("stats over grid") {
        graft.stats.HistStats.stats(g.filter(col("valid")).select(col("db"))).collect()
      }
      spark.catalog.clearCache()
      time("full a4 query") {
        Clahe.query(spark, dir).select(sum(col("q"))).collect()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
