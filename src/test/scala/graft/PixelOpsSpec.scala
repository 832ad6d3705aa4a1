package graft

import org.apache.spark.sql.functions._
import graft.ops.PixelOps

/** Unit specs for the per-pixel operators — the reference's edge guards
  * are the assertions (SURVEY §5.1): 1e-10 log floor, −50 dB mask,
  * /0 → 0, clip bounds, quantize monotonicity, u16 min==max guard.
  */
class PixelOpsSpec extends SparkSpec {
  import spark.implicits._

  private def col1(vals: Seq[Double], f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Seq[Any] =
    vals.toDF("v").select(f(col("v")).as("r")).collect().toSeq.map(_.get(0))

  test("toDb floors magnitude at 1e-10") {
    val r = col1(Seq(0.0, -5.0, 1e-12), PixelOps.toDb)
    assert(r.forall(_ == 10.0 * math.log10(1e-10)))
  }

  test("toDb matches 10*log10 for positive values") {
    val r = col1(Seq(1.0, 100.0, 0.5), PixelOps.toDb)
    assert(r == Seq(0.0, 20.0, 10.0 * math.log10(0.5)))
  }

  test("validMask is db > -50") {
    val r = Seq(-50.0000001, -50.0, -49.9999999, 0.0).toDF("db")
      .select(PixelOps.validMask(col("db"))).collect().map(_.getBoolean(0)).toSeq
    assert(r == Seq(false, false, true, true))
  }

  test("bandRatio guards |b| <= 1e-10 to 0") {
    val r = Seq((1.0, 0.0), (1.0, 1e-11), (6.0, 2.0), (1.0, -1e-11))
      .toDF("a", "b").select(PixelOps.bandRatio(col("a"), col("b"))).collect().map(_.getDouble(0)).toSeq
    assert(r == Seq(0.0, 0.0, 3.0, 0.0))
  }

  test("bandNormalizedDiff guards a+b ~ 0") {
    val r = Seq((1.0, -1.0), (3.0, 1.0)).toDF("a", "b")
      .select(PixelOps.bandNormalizedDiff(col("a"), col("b"))).collect().map(_.getDouble(0)).toSeq
    assert(r == Seq(0.0, 0.5))
  }

  test("clipQuantize clamps to [0, maxVal] and is monotone") {
    val vals = Seq(-100.0, -20.0, -10.0, -5.0, 0.0, 100.0)
    val r = vals.toDF("db")
      .select(PixelOps.clipQuantize(col("db"), lit(-20.0), lit(0.0), lit(1.0), lit(255.0)))
      .collect().map(_.getInt(0)).toSeq
    assert(r.head == 0 && r.last == 255)
    assert(r == r.sorted, "quantization must be monotone in db")
  }

  test("clipQuantize applies range floor max(high-low, 1)") {
    // high-low = 0.5 → range floored to 1.0: v=high maps to (0.5/1.0)^1*255
    val r = Seq(0.5).toDF("db")
      .select(PixelOps.clipQuantize(col("db"), lit(0.0), lit(0.5), lit(1.0), lit(255.0)))
      .collect().map(_.getInt(0)).toSeq
    assert(r == Seq((0.5 / 1.0 * 255.0).toInt))
  }

  test("clipQuantizeMasked zeroes invalid pixels") {
    val r = Seq((0.0, true), (0.0, false)).toDF("db", "valid")
      .select(PixelOps.clipQuantizeMasked(col("db"), col("valid"),
        lit(-20.0), lit(0.0), lit(1.0), lit(255.0)))
      .collect().map(_.getInt(0)).toSeq
    assert(r == Seq(255, 0))
  }

  test("u16ToU8 min==max degenerate keeps scale 1") {
    val r = Seq((7, 7, 7), (0, 0, 65535), (65535, 0, 65535))
      .toDF("q", "mn", "mx")
      .select(PixelOps.u16ToU8(col("q"), col("mn"), col("mx")))
      .collect().map(_.getInt(0)).toSeq
    assert(r == Seq(0, 0, 255))
  }

  test("gammaU8 endpoints fixed at 0 and 255") {
    val r = Seq(0, 255).toDF("v").select(PixelOps.gammaU8(col("v"), 0.7))
      .collect().map(_.getInt(0)).toSeq
    assert(r == Seq(0, 255))
  }

  test("blueRatio returns 0 when b2 == 0") {
    val r = Seq((100, 0), (100, 100)).toDF("b1", "b2")
      .select(PixelOps.blueRatio(col("b1"), col("b2"))).collect().map(_.getInt(0)).toSeq
    assert(r.head == 0 && r(1) > 0)
  }

  test("geotransformRewrite scales pixel size and shifts origin by pad") {
    val df = Seq((100.0, 10.0, 0.0, 200.0, 0.0, -10.0)).toDF("g0", "g1", "g2", "g3", "g4", "g5")
    val out = PixelOps.geotransformRewrite(
      Seq(col("g0"), col("g1"), col("g2"), col("g3"), col("g4"), col("g5")),
      lit(1000), lit(500), lit(512), lit(512), lit(0), lit(128))
    val r = df.select(out: _*).collect()(0)
    // gt1 scaled by 1000/512, gt5 by 500/512, origin Y shifted by pad_top
    assert(r.getDouble(1) == 10.0 * (1000.0 / 512.0))
    assert(r.getDouble(5) == -10.0 * (500.0 / 512.0))
    assert(r.getDouble(0) == 100.0)
    assert(r.getDouble(3) == 200.0 - 128.0 * (-10.0 * (500.0 / 512.0)))
  }
}
