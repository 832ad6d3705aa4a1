package graft

import org.apache.spark.sql.functions._
import graft.ext.Sketch

/** Pins for the HLL-256 distinct sketch (e31): register construction
  * against an engine-independent MD5 reference, exact max-mergeability
  * (the property that makes the sketch the 100 TB distinct primitive),
  * and estimator accuracy — including the ln-based small-range
  * correction, which lives HERE (Scala-side) because the oracle's
  * no-transcendental rule keeps it out of the emitted cells.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  /** Reference bucket/rho from java MessageDigest — no Spark, no DuckDB. */
  private def refRegister(userId: Long): (Long, Long) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(userId.toString.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val bucket = java.lang.Long.parseLong(hex.substring(0, 2), 16)
    val w = java.lang.Long.parseLong(hex.substring(2, 16), 16)
    val rho = if (w == 0L) 57L else 57L - (64 - java.lang.Long.numberOfLeadingZeros(w))
    (bucket, rho)
  }

  test("register build matches the MessageDigest reference per user") {
    val ids = Seq(1L, 7L, 42L, 999999L, 123456789L)
    val df = ids.toDF("user_id").withColumn("event_type", lit("t"))
    val got = Sketch.registers(df).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    // distinct ids may share a bucket — reference must max-merge too
    val want = ids.map(refRegister).groupBy(_._1)
      .map { case (b, rs) => (b, rs.map(_._2).max) }.toSet
    assert(got == want)
  }

  test("sketch of a union is the register-wise max-merge (exact, real table)") {
    val ev = spark.read.parquet(s"$Sf0001/events.parquet")
    val a = ev.filter(col("event_id") % 2 === 0)
    val b = ev.filter(col("event_id") % 2 === 1)
    val merged = Sketch.registers(a).union(Sketch.registers(b))
      .groupBy("event_type", "bucket").agg(max("rho").as("rho"))
    val whole = Sketch.registers(ev)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getString(0), r.getLong(1), r.getLong(2))
    assert(merged.collect().map(key).toSet == whole.collect().map(key).toSet)
  }

  test("raw estimate within 3 sigma on a 5000-distinct fixture; LC correction tightens the small range") {
    // 5000 distinct >> 5/2·m = 640: the raw-regime fixture.
    val big = (1L to 5000L).toDF("user_id").withColumn("event_type", lit("big"))
    val est = rawEstimate(big)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.2, s"raw est $est vs 5000")
    // 100 distinct << 640: raw is biased there — the ln-based linear
    // counting m·ln(m/V) (Scala-only, see Scaladoc) must land close.
    val small = (1L to 100L).toDF("user_id").withColumn("event_type", lit("small"))
    val regs = Sketch.registers(small).collect()
    val v = Sketch.Registers - regs.length
    val lc = Sketch.Registers * math.log(Sketch.Registers.toDouble / v)
    assert(math.abs(lc - 100.0) / 100.0 < 0.2, s"LC est $lc vs 100")
  }

  private def rawEstimate(df: org.apache.spark.sql.DataFrame): Double = {
    val regs = Sketch.registers(df).collect().map(_.getLong(2))
    val v = Sketch.Registers - regs.length
    val s = v.toDouble + regs.map(r => math.pow(2.0, -r.toDouble)).sum
    0.7213 / (1.0 + 1.079 / 256.0) * Sketch.Registers * Sketch.Registers / s
  }

  test("e31 on sf0.001: audit columns consistent with an independent exact count") {
    val out = Sketch.hllUsers(spark, Sf0001).collect()
    assert(out.nonEmpty)
    val ev = spark.read.parquet(s"$Sf0001/events.parquet")
    out.foreach { r =>
      val et = r.getString(0)
      val exact = ev.filter(col("event_type") === et)
        .select("user_id").distinct().count()
      assert(r.getLong(1) == exact, s"$et n_exact")
      val v = r.getLong(3)
      assert(v >= 0 && v <= Sketch.Registers, s"$et v_empty $v")
      val relErr = r.getDouble(4)
      assert(relErr >= 0.0, s"$et rel_err")
      // raw-regime types must audit within 3 sigma + small slack
      if (exact > 640) assert(relErr < 0.25, s"$et rel_err $relErr at n=$exact")
    }
  }
}
