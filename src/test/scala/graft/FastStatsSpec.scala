package graft

import graft.stats.{FastStats, HistStats}

/** The single-pass typed-Aggregator stats path must agree with the
  * declarative oracle-checked path: percentiles bit-identical (integer
  * bin counts + same inversion arithmetic), moments within float-merge
  * tolerance.
  */
class FastStatsSpec extends SparkSpec {
  import spark.implicits._

  private def compare(vals: Seq[Double]): Unit = {
    val df = vals.toDF("db")
    val slow = HistStats.stats(df).collect()(0)
    val fast = FastStats.stats(df)
    assert(fast.n == slow.getLong(0))
    assert(fast.min == slow.getAs[Double]("min_db"))
    assert(fast.max == slow.getAs[Double]("max_db"))
    assert(math.abs(fast.mean - slow.getAs[Double]("mean_db")) < 1e-9)
    assert(math.abs(fast.std - slow.getAs[Double]("std_db")) < 1e-9)
    HistStats.Percentiles.foreach { case (nm, _) =>
      assert(fast.percentiles(nm) == slow.getAs[Double](nm),
        s"$nm: fast=${fast.percentiles(nm)} slow=${slow.getAs[Double](nm)}")
    }
  }

  test("fast stats match declarative stats on uniform data") {
    compare((1 to 5000).map(_.toDouble))
  }

  test("fast stats match on skewed data") {
    compare((0 until 3000).map(i => math.pow(1.003, i)))
  }

  test("fast stats match on degenerate inputs") {
    compare(Seq.fill(50)(3.25))
    val fastEmpty = FastStats.stats(Seq.empty[Double].toDF("db"))
    assert(fastEmpty.n == 0 && fastEmpty.percentiles.values.forall(_ == 0.0))
  }

  test("strategy params agree with the declarative advancedParams") {
    val df = (1 to 4000).map(i => (i % 611).toDouble / 7.0).toDF("db")
    val fast = FastStats.stats(df)
    val slowRows = HistStats.advancedParams(HistStats.stats(df)).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    Seq("robust", "adaptive", "equalized", "clahe", "tamed", "standard", "default").foreach { s =>
      val (lo, hi, g) = FastStats.strategyParams(fast, s)
      val (slo, shi, sg) = slowRows(s)
      assert(math.abs(lo - slo) < 1e-9 && math.abs(hi - shi) < 1e-9 && g == sg,
        s"$s: fast=($lo,$hi,$g) slow=($slo,$shi,$sg)")
    }
  }
}
