package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** A1/A2: streaming stats + fixed-bin histogram percentiles
  * (`/root/reference/src/core/processing/autoscale.rs:35-160`).
  *
  * The reference makes two passes over the pixels: (1) count/min/max +
  * Welford mean/std, (2) a 4096-bin histogram over [min,max] whose CDF is
  * inverted for the percentiles (rank = floor(n·p) clamped, linear
  * interpolation within the bin — `autoscale.rs:120-140`). This module is
  * the same two-pass design as a distributed plan:
  *
  *   - pass 1 is a hash aggregate with map-side partials (no shuffle of
  *     pixel data, one row out);
  *   - pass 2 broadcasts that row, bins pixels (4096-key hash agg), and
  *     runs the CDF inversion as a window over ≤4096 rows — constant-size
  *     state regardless of image size, exactly the property the reference
  *     chose the histogram for (32 KB vs O(N) sort, CHANGELOG.md:219-229).
  *
  * Sums are accumulated in DECIMAL so the result is independent of
  * partition order (mean/std reformulated as exact-decimal E[x], E[x²];
  * population std like Welford's `sqrt(m2/n)`, `autoscale.rs:78`).
  */
object HistStats {

  val NumBins = 4096

  /** Percentile columns exposed by the stats relation, with their ranks
    * (`autoscale.rs:142-159`).
    */
  val Percentiles: Seq[(String, Double)] = Seq(
    "median_db" -> 0.5,
    "p01" -> 0.01, "p02" -> 0.02, "p05" -> 0.05, "p10" -> 0.10,
    "p25" -> 0.25, "p75" -> 0.75, "p90" -> 0.90, "p95" -> 0.95,
    "p98" -> 0.98, "p99" -> 0.99)

  /** One-row stats relation over a pre-masked dB column named `db`:
    * `n, min_db, max_db, mean_db, std_db, median_db, p01..p99`.
    *
    * Degenerate inputs follow the reference: empty → all zeros
    * (`autoscale.rs:57-76`); all-equal → percentiles collapse to min/max
    * (`autoscale.rs:81-100`).
    */
  def stats(px: DataFrame): DataFrame = {
    val spark = px.sparkSession
    import spark.implicits._

    val pixels = px.select(col("db"))

    // ONE broadcast of the one-row pass-1 aggregate, shared by every
    // consumer below (hist binning, targets, interpolation, final
    // projection): identical broadcast subtrees collapse via
    // ReuseExchange, so the pixel relation is aggregated once — an
    // unhinted plain `s1` on the final crossJoin used to cost a whole
    // extra pixel pass.
    val s1 = broadcast(pixels.agg(
      count(lit(1)).as("n"),
      min($"db").as("mn"),
      max($"db").as("mx"),
      sum($"db".cast(DecimalType(28, 10))).cast("double").as("sum_db"),
      sum(($"db" * $"db").cast(DecimalType(38, 10))).cast("double").as("sum_db2")))

    // Pass 2: bin = trunc(clamp((v-min)*(1/span),0,1) * 4096) capped at 4095
    // (`autoscale.rs:112-116`; note the reference multiplies by 1/span).
    val span = $"mx" - $"mn"
    val t = least(greatest(($"db" - $"mn") * (lit(1.0) / span), lit(0.0)), lit(1.0))
    val binCol = when($"mx" > $"mn",
      least(floor(t * lit(NumBins.toDouble)), lit((NumBins - 1).toLong)))
      .otherwise(lit(0L))

    val hist = pixels.crossJoin(s1)
      .select(binCol.as("bin"))
      .groupBy($"bin").agg(count(lit(1)).as("h"))

    val w = Window.orderBy($"bin")
    val cum = hist.select(
      $"bin", $"h",
      coalesce(sum($"h").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("cb"),
      sum($"h").over(w.rowsBetween(Window.unboundedPreceding, 0)).as("ct"))

    // CDF inversion: target = min(floor(p*n), n-1); first bin with
    // cumulative > target; linear interpolation within it
    // (`autoscale.rs:120-140`).
    val targets = Percentiles.toDF("name", "p")
      .crossJoin(s1)
      .select($"name", least(floor($"p" * $"n"), $"n" - 1).as("target"))

    val binWidth = ($"mx" - $"mn") / lit(NumBins.toDouble)
    val interpolated = targets
      .join(cum, $"target" >= $"cb" && $"target" < $"ct")
      .crossJoin(s1)
      .select($"name",
        (($"mn" + $"bin" * binWidth) +
          (($"target" - $"cb").cast("double") / $"h".cast("double")) * binWidth).as("value"))

    val wide = interpolated.agg(
      Percentiles.map { case (nm, _) => max(when($"name" === nm, $"value")).as(nm) }.head,
      Percentiles.tail.map { case (nm, _) => max(when($"name" === nm, $"value")).as(nm) }: _*)

    val meanDb = $"sum_db" / $"n"
    val stdDb = when($"n" <= 1, lit(0.0))
      .otherwise(sqrt(greatest($"sum_db2" / $"n" - meanDb * meanDb, lit(0.0))))

    s1.crossJoin(wide).select(
      Seq(
        $"n",
        when($"n" === 0, 0.0).otherwise($"mn").as("min_db"),
        when($"n" === 0, 0.0).otherwise($"mx").as("max_db"),
        when($"n" === 0, 0.0).otherwise(meanDb).as("mean_db"),
        when($"n" === 0, 0.0).otherwise(stdDb).as("std_db")) ++
        Percentiles.map { case (nm, _) =>
          when($"n" === 0, 0.0)
            .when($"mx" === $"mn", $"mn")
            .otherwise(col(nm)).as(nm)
        }: _*)
  }

  /** DuckDB-dialect mirror of [[stats]], as WITH-clause fragments. The
    * expression trees are kept shape-identical to the Spark plan so both
    * engines perform the same IEEE-754 operations and the driver's hash
    * compare sees bit-equal doubles.
    *
    * @param pixelsSql SELECT producing a relation with a `db` column.
    * @return CTE text defining `pix`, `s1`, `hist`, `cum`, `pct`, `pval`
    *         and finally `stats(n, min_db, max_db, mean_db, std_db,
    *         median_db, p01..p99)`.
    */
  def statsCtesSql(pixelsSql: String): String = {
    val pctValues = Percentiles.map { case (nm, p) => s"('$nm', ${p}e0)" }.mkString(", ")
    val pctCols = Percentiles.map { case (nm, _) =>
      s"MAX(CASE WHEN name = '$nm' THEN value END) AS $nm"
    }.mkString(",\n       ")
    s"""pix AS ($pixelsSql),
s1 AS (
  SELECT COUNT(*) AS n, MIN(db) AS mn, MAX(db) AS mx,
         CAST(SUM(CAST(db AS DECIMAL(28,10))) AS DOUBLE) AS sum_db,
         CAST(SUM(CAST(db*db AS DECIMAL(38,10))) AS DOUBLE) AS sum_db2
  FROM pix),
hist AS (
  SELECT LEAST(CAST(FLOOR(LEAST(GREATEST((db - mn) * (1.0/(mx - mn)), 0.0), 1.0)
                    * 4096.0) AS BIGINT), 4095) AS bin,
         COUNT(*) AS h
  FROM pix, s1 GROUP BY 1),
cum AS (
  SELECT bin, h,
         COALESCE(SUM(h) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb,
         SUM(h) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ct
  FROM hist),
pct AS (
  SELECT name, LEAST(CAST(FLOOR(p * n) AS BIGINT), n - 1) AS target
  FROM (VALUES $pctValues) v(name, p), s1),
pval AS (
  SELECT name,
         ((mn + bin * ((mx - mn)/4096.0)) +
          (CAST(target - cb AS DOUBLE)/CAST(h AS DOUBLE)) * ((mx - mn)/4096.0)) AS value
  FROM pct JOIN cum ON target >= cb AND target < ct, s1),
pwide AS (
  SELECT $pctCols
  FROM pval),
stats AS (
  SELECT n, mn AS min_db, mx AS max_db,
         sum_db/n AS mean_db,
         CASE WHEN n <= 1 THEN 0.0
              ELSE sqrt(GREATEST(sum_db2/n - (sum_db/n)*(sum_db/n), 0.0)) END AS std_db,
         ${Percentiles.map { case (nm, _) => nm }.mkString(", ")}
  FROM s1, pwide)"""
  }

  /** A3 (advanced): strategy → (low_clip, high_clip, gamma) selection from
    * the stats row (`autoscale.rs:491-562`). `use_local_enhancement` is
    * false for every strategy in the reference.
    */
  def advancedParams(stats: DataFrame): DataFrame = {
    val iqr = col("p75") - col("p25")
    val robustLow = greatest(greatest(col("p25") - lit(2.5) * iqr, col("p01")), col("min_db"))
    val robustHigh = least(least(col("p75") + lit(2.5) * iqr, col("p99")), col("max_db"))
    val skew = (col("mean_db") - col("median_db")) / greatest(abs(col("std_db")), lit(1.0))
    val tail = (col("p99") - col("p95")) / greatest(col("p95") - col("p75"), lit(1.0))
    val adaptiveLow = when(abs(skew) > 0.5, when(skew > 0.0, col("p02")).otherwise(col("p05")))
      .when(tail > 2.0, col("p10"))
      .otherwise(col("p05"))
    val adaptiveHigh = when(abs(skew) > 0.5, when(skew > 0.0, col("p98")).otherwise(col("p95")))
      .when(tail > 2.0, col("p90"))
      .otherwise(col("p95"))
    val adaptiveGamma = when(abs(skew) > 0.5, when(skew > 0.0, lit(0.9)).otherwise(lit(1.1)))
      .when(tail > 2.0, lit(0.8))
      .otherwise(lit(1.0))

    val rows = Seq(
      ("robust", robustLow, robustHigh, lit(1.0)),
      ("adaptive", adaptiveLow, adaptiveHigh, adaptiveGamma),
      ("equalized", col("p01"), col("p99"), lit(1.0)),
      ("clahe", col("p01"), col("p99"), lit(1.0)),
      ("tamed", col("p25"), col("p99"), lit(1.0)),
      ("standard", col("p05"), col("p95"), lit(1.0)),
      ("default", col("p05"), col("p95"), lit(1.0)))
    // One pass over the (1-row) stats relation: explode an array of
    // per-strategy structs rather than a 7-way union of the stats subtree.
    val packed = array(rows.map { case (nm, lo, hi, g) =>
      struct(lit(nm).as("strategy"), lo.as("low_clip"), hi.as("high_clip"), g.as("gamma"))
    }: _*)
    stats.select(explode(packed).as("s")).select(col("s.*"))
  }

  /** A3 (legacy, `autoscale.rs:404-429`): the 4-branch dynamic-range
    * heuristic of `autoscale_db_image`, including the final clamp of the
    * clip window to [min,max].
    */
  def legacyParams(stats: DataFrame): DataFrame = {
    val dynamicRange = col("max_db") - col("min_db")
    val iqr = col("p75") - col("p25")
    val medRange = greatest(lit(20.0), dynamicRange * lit(0.8))
    val low = when(dynamicRange < 15.0, col("median_db") - medRange / lit(2.0))
      .when(iqr < 5.0, col("p25") - lit(2.5) * iqr)
      .when(dynamicRange > 40.0, greatest(col("p02"), col("min_db") + lit(0.02) * dynamicRange))
      .otherwise(col("p02"))
    val high = when(dynamicRange < 15.0, col("median_db") + medRange / lit(2.0))
      .when(iqr < 5.0, col("p75") + lit(2.5) * iqr)
      .when(dynamicRange > 40.0, least(col("p98"), col("max_db") - lit(0.02) * dynamicRange))
      .otherwise(col("p98"))
    val gamma = when(dynamicRange < 15.0, lit(1.1))
      .when(iqr < 5.0, lit(1.0))
      .when(dynamicRange > 40.0, lit(0.9))
      .otherwise(lit(1.0))
    stats.select(
      greatest(low, col("min_db")).as("low_clip"),
      least(high, col("max_db")).as("high_clip"),
      gamma.as("gamma"))
  }
}
