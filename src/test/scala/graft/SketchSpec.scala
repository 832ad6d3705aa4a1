package graft

import org.apache.spark.sql.Column
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

  test("t35 on sf0.001: CMS never under-counts, and is exact when no bucket collides") {
    val out = Sketch.cmsHeavyHitters(spark, Sf0001).collect()
    val nVocab = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select(explode(graft.ext.TextOps.tokens(col("text"))).as("tok"))
      .distinct().count()
    assert(out.length == math.min(Sketch.CmsTopK.toLong, nVocab))
    out.foreach { r =>
      assert(r.getLong(4) >= 0L, s"${r.getString(1)} under-counted") // overest ≥ 0
      assert(r.getLong(3) == r.getLong(2) + r.getLong(4))
    }
    // ranks are 1..|out| by descending exact count
    assert(out.map(_.getInt(0)).toSeq == (1 to out.length))
    val cnts = out.map(_.getLong(2)).toSeq
    assert(cnts == cnts.sorted.reverse)
  }

  test("t35 estimate is exact on a tiny vocabulary (collision-free regime)") {
    // 8 distinct tokens into 4x1024 cells: a same-bucket collision in
    // EVERY row is cosmically unlikely; min-of-rows must be exact.
    val docs = Seq.tabulate(8)(i => (i.toLong, (s"tok$i " * (i + 1)).trim))
      .toDF("doc_id", "text")
    val dir = "/tmp/graft-fixtures/t35tiny"
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Sketch.cmsHeavyHitters(spark, dir).collect()
    assert(out.length == 8)
    out.foreach(r => assert(r.getLong(4) == 0L, s"${r.getString(1)} overest"))
  }

  test("t35 stays one-sided under forced collisions (vocab ≫ width)") {
    // 5000 distinct tokens into w=1024 buckets per row: pigeonhole
    // forces multi-token cells in EVERY row, so estimates over-count —
    // but must never under-count (the CMS guarantee under load).
    val docs = (1 to 5000).map(i => (i.toLong, s"w$i")).toDF("doc_id", "text")
    val dir = "/tmp/graft-fixtures/t35coll"
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Sketch.cmsHeavyHitters(spark, dir).collect()
    assert(out.length == Sketch.CmsTopK)
    out.foreach(r => assert(r.getLong(4) >= 0L, s"${r.getString(1)} under-counted"))
    assert(out.exists(_.getLong(4) > 0L), "expected at least one collision")
  }

  test("CMS cell tables merge additively across corpus shards (real table)") {
    // the mergeability contract: cells(A ∪ B) = cells(A) + cells(B) —
    // what lets per-shard sketches roll up without a vocabulary union.
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    def cells(df: org.apache.spark.sql.DataFrame) = {
      val vocab = df
        .select(explode(graft.ext.TextOps.tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
      Sketch.cmsCellsOf(vocab).collect()
        .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    }
    val a = cells(docs.filter(col("doc_id") % 2 === 0))
    val b = cells(docs.filter(col("doc_id") % 2 === 1))
    val whole = cells(docs)
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged == whole)
  }

  test("d23 on sf0.001: audit invariants — kmv within bounds, exact regime exact") {
    val out = Sketch.kmvOverlap(spark, Sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (na, nb, sh) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(sh <= math.min(na, nb))
      val kUsed = r.getInt(6).toLong
      val kmvShared = r.getInt(7).toLong
      assert(kUsed >= 1 && kUsed <= Sketch.KmvK)
      assert(kmvShared >= 0 && kmvShared <= kUsed)
      // exact regime: |A ∪ B| <= k means the sketch IS the set
      if (na + nb - sh <= Sketch.KmvK) {
        assert(kmvShared == sh, s"${r.getString(0)}/${r.getString(1)}")
        assert(kUsed == na + nb - sh)
      }
    }
  }

  test("d23 estimator lands near truth when the union exceeds k (constructed overlap)") {
    // two sources of 400 distinct texts sharing 200: true J = 200/600.
    val shared = (1 to 200).map(i => s"shared doc $i")
    val rows = (shared ++ (1 to 200).map(i => s"only a $i")).map(("sa", _)) ++
      (shared ++ (1 to 200).map(i => s"only b $i")).map(("sb", _))
    val dir = "/tmp/graft-fixtures/d23acc"
    rows.toDF("source", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val r = Sketch.kmvOverlap(spark, dir).collect().head
    assert(r.getLong(4) == 200L && r.getDouble(5) == math.rint(200.0 / 600.0 * 1e6) / 1e6)
    val est = r.getDouble(8)
    // k=64 bottom-k Jaccard: sigma ~ sqrt(J(1-J)/k) ~ 0.059; allow 3 sigma
    assert(math.abs(est - 200.0 / 600.0) < 0.18, s"jacc_kmv $est")
  }

  test("bottom-k sketches merge: bottomK(A ∪ B) == bottomK(bottomK(A) ∪ bottomK(B))") {
    // the merge law that lets per-shard sketches roll up (real table)
    def hs(src: Column => Column): Seq[Long] = {
      val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
        .filter(src(col("doc_id")))
        .select(conv(substring(md5(col("text")), 1, 14), 16, 10)
          .cast("long").as("h"))
        .distinct().collect().map(_.getLong(0)).toSeq
      docs.sorted.take(Sketch.KmvK)
    }
    val a = hs(_ % 2 === 0)
    val b = hs(_ % 2 === 1)
    val whole = hs(_ >= Long.MinValue)
    assert((a ++ b).distinct.sorted.take(Sketch.KmvK) == whole)
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
      // r18: the emitted cells are exact e6-scaled BIGINTs (t23 idiom)
      val estE6 = r.getLong(2)
      val relErrE6 = r.getLong(4)
      assert(estE6 > 0L, s"$et hll_est_e6")
      assert(relErrE6 >= 0L, s"$et rel_err_e6")
      assert(relErrE6 ==
        math.abs(estE6 - exact * 1000000L) / exact, s"$et rel_err_e6 defn")
      // raw-regime types must audit within 3 sigma + small slack
      if (exact > 640) assert(relErrE6 < 250000L, s"$et rel_err_e6 $relErrE6 at n=$exact")
    }
  }

  test("e31 integer estimator equals the float raw estimator to 1e-6 (fixture)") {
    // the r18 restatement must be the SAME estimator, just exact: on a
    // 5000-distinct fixture the e6 integer floor-division lands within
    // one ulp-of-grain of the IEEE alpha*m^2/S chain it replaced
    val big = (1L to 5000L).toDF("user_id").withColumn("event_type", lit("big"))
    val float = rawEstimate(big)
    val dir = "/tmp/graft-fixtures/e31int"
    big.withColumn("event_id", col("user_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val estE6 = Sketch.hllUsers(spark, dir).collect().head.getLong(2)
    assert(math.abs(estE6 / 1e6 - float) < 2e-6,
      s"int $estE6 vs float ${float * 1e6}")
  }
}
