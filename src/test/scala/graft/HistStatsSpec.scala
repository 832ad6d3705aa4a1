package graft

import org.apache.spark.sql.functions._
import graft.stats.HistStats

/** Specs for the streaming-stats + histogram-percentile aggregate,
  * including the reference's degenerate-input guards
  * (`autoscale.rs:57-100`) and its accepted one-bin-width percentile
  * error vs an exact sort (`CHANGELOG.md:219-229`).
  */
class HistStatsSpec extends SparkSpec {
  import spark.implicits._

  private def statsOf(vals: Seq[Double]) =
    HistStats.stats(vals.toDF("db")).collect()(0)

  test("empty input yields all-zero stats") {
    val r = HistStats.stats(Seq.empty[Double].toDF("db")).collect()(0)
    assert(r.getLong(0) == 0)
    (1 until r.length).foreach(i => assert(r.getDouble(i) == 0.0))
  }

  test("all-equal input collapses percentiles to the constant") {
    val r = statsOf(Seq.fill(100)(7.5))
    assert(r.getLong(0) == 100)
    assert(r.getAs[Double]("min_db") == 7.5 && r.getAs[Double]("max_db") == 7.5)
    assert(r.getAs[Double]("mean_db") == 7.5 && r.getAs[Double]("std_db") == 0.0)
    HistStats.Percentiles.foreach { case (nm, _) => assert(r.getAs[Double](nm) == 7.5) }
  }

  test("basic moments match direct computation") {
    val vals = (1 to 1000).map(_.toDouble)
    val r = statsOf(vals)
    assert(r.getAs[Double]("min_db") == 1.0 && r.getAs[Double]("max_db") == 1000.0)
    assert(math.abs(r.getAs[Double]("mean_db") - 500.5) < 1e-9)
    val popStd = math.sqrt(vals.map(v => (v - 500.5) * (v - 500.5)).sum / 1000)
    assert(math.abs(r.getAs[Double]("std_db") - popStd) < 1e-9)
  }

  test("histogram percentiles within one bin width of exact rank") {
    val vals = (0 until 5000).map(i => (i * 37 % 5000).toDouble)
    val r = statsOf(vals)
    val sorted = vals.sorted
    val binWidth = (sorted.last - sorted.head) / HistStats.NumBins
    HistStats.Percentiles.foreach { case (nm, p) =>
      val exact = sorted(math.min((p * vals.size).toInt, vals.size - 1))
      assert(math.abs(r.getAs[Double](nm) - exact) <= binWidth + 1e-9,
        s"$nm: got ${r.getAs[Double](nm)}, exact $exact, binWidth $binWidth")
    }
  }

  test("percentiles are monotone") {
    val vals = (0 until 2000).map(i => math.pow(1.01, i % 700))
    val r = statsOf(vals)
    val ordered = Seq("p01", "p02", "p05", "p10", "p25", "median_db", "p75", "p90", "p95", "p98", "p99")
      .map(r.getAs[Double](_))
    assert(ordered == ordered.sorted)
  }

  test("advancedParams emits all seven strategies with low < high") {
    val st = HistStats.stats((1 to 1000).map(i => i / 10.0).toDF("db"))
    val rows = HistStats.advancedParams(st).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("adaptive", "clahe", "default", "equalized", "robust", "standard", "tamed"))
    rows.foreach(r => assert(r.getDouble(1) < r.getDouble(2), s"strategy ${r.getString(0)}"))
  }

  test("legacyParams clamps clip window to [min,max]") {
    val st = HistStats.stats((1 to 500).map(_.toDouble).toDF("db"))
    val r = HistStats.legacyParams(st).collect()(0)
    assert(r.getDouble(0) >= 1.0 && r.getDouble(1) <= 500.0)
    assert(r.getDouble(0) < r.getDouble(1))
  }
}
