package graft.stats

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Single-pass custom typed Aggregators for the stats pipeline — the
  * optimization tier of SURVEY §2.10/§7.4 (the oracle-checked tier is
  * the declarative two-pass formulation in [[HistStats]]).
  *
  * Why custom: the built-in pass 2 shuffles a 4096-key groupBy; the
  * [[FixedHistAgg]] buffer is ONE long[4096] per partition merged by
  * vector add — partial aggregation with constant-size state, zero
  * shuffle rows beyond the buffers themselves. This is exactly the
  * property the reference chose the streaming histogram for (32 KB
  * constant memory, `/root/reference/CHANGELOG.md:219-229`), expressed
  * as a mergeable Spark Aggregator so it parallelizes over any number
  * of executors.
  */
object FastStats {

  /** Welford/Chan mergeable moments buffer. */
  final case class Moments(n: Long, mean: Double, m2: Double, mn: Double, mx: Double)

  final case class MomentsResult(n: Long, min: Double, max: Double, mean: Double, std: Double)

  /** Pass 1: count/min/max/mean/std in one pass (Chan's parallel merge —
    * the distributed form of the reference's sequential Welford update,
    * `autoscale.rs:35-78`).
    */
  object WelfordAgg extends Aggregator[Double, Moments, MomentsResult] {
    def zero: Moments = Moments(0L, 0.0, 0.0, Double.PositiveInfinity, Double.NegativeInfinity)
    def reduce(b: Moments, v: Double): Moments = {
      val n = b.n + 1
      val delta = v - b.mean
      val mean = b.mean + delta / n
      Moments(n, mean, b.m2 + delta * (v - mean), math.min(b.mn, v), math.max(b.mx, v))
    }
    def merge(a: Moments, b: Moments): Moments = {
      if (a.n == 0) b
      else if (b.n == 0) a
      else {
        val n = a.n + b.n
        val delta = b.mean - a.mean
        Moments(n,
          a.mean + delta * b.n / n,
          a.m2 + b.m2 + delta * delta * a.n * b.n / n,
          math.min(a.mn, b.mn), math.max(a.mx, b.mx))
      }
    }
    def finish(r: Moments): MomentsResult =
      if (r.n == 0) MomentsResult(0, 0.0, 0.0, 0.0, 0.0)
      else MomentsResult(r.n, r.mn, r.mx, r.mean,
        if (r.n <= 1) 0.0 else math.sqrt(r.m2 / r.n))
    def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
    def outputEncoder: Encoder[MomentsResult] = Encoders.product[MomentsResult]
  }

  /** Pass 2: fixed-range histogram — buffer is the bin array itself,
    * merged by element-wise add. Binning matches `autoscale.rs:112-116`:
    * bin = min(floor(clamp((v−mn)·(1/span),0,1)·bins), bins−1).
    */
  final class FixedHistAgg(mn: Double, mx: Double, bins: Int)
      extends Aggregator[Double, Array[Long], Array[Long]] {
    private val inv = if (mx > mn) 1.0 / (mx - mn) else 0.0
    def zero: Array[Long] = new Array[Long](bins)
    def reduce(b: Array[Long], v: Double): Array[Long] = {
      val t = math.min(math.max((v - mn) * inv, 0.0), 1.0)
      val bin = math.min(math.floor(t * bins).toLong, (bins - 1).toLong).toInt
      b(bin) += 1
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < bins) { a(i) += b(i); i += 1 }
      a
    }
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  final case class FastStatsResult(
      n: Long, min: Double, max: Double, mean: Double, std: Double,
      percentiles: Map[String, Double])

  /** Two-job driver helper: moments pass → histogram pass → CDF inversion
    * on the 4096-bin array (driver-side, same arithmetic as
    * `HistStats.statsCtesSql`: target = min(floor(p·n), n−1), intra-bin
    * linear interpolation). Percentiles are bit-identical to the
    * declarative path; mean/std may differ in final ulps (float merge
    * order) — use the declarative path where oracle exactness matters.
    */
  def stats(px: DataFrame, numBins: Int = HistStats.NumBins): FastStatsResult = {
    import px.sparkSession.implicits._
    val ds = px.select(col("db").cast("double")).as[Double]
    val mr = ds.select(WelfordAgg.toColumn).collect()(0)
    fromMoments(mr,
      () => ds.select(new FixedHistAgg(mr.min, mr.max, numBins).toColumn).collect()(0),
      numBins)
  }

  /** Degenerate handling + CDF inversion shared by the DF and tile
    * paths. `histProvider` is only invoked when a histogram is needed.
    */
  def fromMoments(m: MomentsResult, histProvider: () => Array[Long],
                  numBins: Int = HistStats.NumBins): FastStatsResult = {
    if (m.n == 0)
      return FastStatsResult(0, 0.0, 0.0, 0.0, 0.0,
        HistStats.Percentiles.map { case (nm, _) => nm -> 0.0 }.toMap)
    if (m.max == m.min)
      return FastStatsResult(m.n, m.min, m.max, m.mean, m.std,
        HistStats.Percentiles.map { case (nm, _) => nm -> m.min }.toMap)
    val hist = histProvider()
    val binWidth = (m.max - m.min) / numBins.toDouble
    val cum = new Array[Long](numBins + 1)
    var i = 0
    while (i < numBins) { cum(i + 1) = cum(i) + hist(i); i += 1 }
    val pcts = HistStats.Percentiles.map { case (nm, p) =>
      val target = math.min(math.floor(p * m.n).toLong, m.n - 1)
      var bin = 0
      while (bin < numBins && !(target >= cum(bin) && target < cum(bin + 1))) bin += 1
      val cb = cum(bin); val h = hist(bin)
      val v = (m.min + bin * binWidth) + ((target - cb).toDouble / h.toDouble) * binWidth
      nm -> v
    }.toMap
    FastStatsResult(m.n, m.min, m.max, m.mean, m.std, pcts)
  }

  /** Legacy 4-branch autoscale params (`autoscale.rs:404-429`) — the
    * path the reference routes strategy=Standard through
    * (`pipeline.rs:49-52`).
    */
  def legacyParams(st: FastStatsResult): (Double, Double, Double) = {
    val p = st.percentiles
    val dynamicRange = st.max - st.min
    val iqr = p("p75") - p("p25")
    val medRange = math.max(20.0, dynamicRange * 0.8)
    val (low, high, gamma) =
      if (dynamicRange < 15.0)
        (p("median_db") - medRange / 2.0, p("median_db") + medRange / 2.0, 1.1)
      else if (iqr < 5.0)
        (p("p25") - 2.5 * iqr, p("p75") + 2.5 * iqr, 1.0)
      else if (dynamicRange > 40.0)
        (math.max(p("p02"), st.min + 0.02 * dynamicRange),
          math.min(p("p98"), st.max - 0.02 * dynamicRange), 0.9)
      else (p("p02"), p("p98"), 1.0)
    (math.max(low, st.min), math.min(high, st.max), gamma)
  }

  /** A3 strategy selection on the driver-side stats row (same branch
    * logic as [[HistStats.advancedParams]] / `autoscale.rs:491-562`).
    */
  def strategyParams(st: FastStatsResult, strategy: String): (Double, Double, Double) = {
    val p = st.percentiles
    strategy match {
      case "robust" =>
        val iqr = p("p75") - p("p25")
        (math.max(math.max(p("p25") - 2.5 * iqr, p("p01")), st.min),
          math.min(math.min(p("p75") + 2.5 * iqr, p("p99")), st.max), 1.0)
      case "adaptive" =>
        val skew = (st.mean - p("median_db")) / math.max(math.abs(st.std), 1.0)
        val tail = (p("p99") - p("p95")) / math.max(p("p95") - p("p75"), 1.0)
        if (math.abs(skew) > 0.5) {
          if (skew > 0.0) (p("p02"), p("p98"), 0.9) else (p("p05"), p("p95"), 1.1)
        } else if (tail > 2.0) (p("p10"), p("p90"), 0.8)
        else (p("p05"), p("p95"), 1.0)
      case "equalized" | "clahe" => (p("p01"), p("p99"), 1.0)
      case "tamed" => (p("p25"), p("p99"), 1.0)
      case _ => (p("p05"), p("p95"), 1.0)
    }
  }
}
