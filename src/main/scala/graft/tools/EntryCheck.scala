package graft.tools
import org.apache.spark.sql.SparkSession
object EntryCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("ENTRY_ROWS=" + graft.SparkEntry.entry(spark).count())
    println("QUERIES=" + graft.SparkEntry.queries.size +
      " ORACLES=" + graft.SparkEntry.oracleSql.size)
    spark.stop()
  }
}
