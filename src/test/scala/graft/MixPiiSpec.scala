package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.{Mix, Pii, TextOps}

/** Behavioral specs for the W1/W2 mixing-packing tier and the W3 PII
  * scan — crafted fixtures pin the exact values the sf corpus can't
  * (quota arithmetic, greedy-vs-optimal packing, regex edge behavior),
  * plus sf0.001 runs for conservation/equivalence properties.
  */
class MixPiiSpec extends SparkSpec {
  import spark.implicits._

  /** JVM-side mirror of TextOps.tokenHash (md5 hex prefix → long) so
    * fixtures can be constructed in hash order without running Spark.
    */
  private def mdHash(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  test("w1: exact integer quota and hash-ordered prefix selection") {
    val ids = (1L to 10L)
    val df = ids.map(i => (i, "s", i * 10L)).toSeq.toDF("doc_id", "source", "ntok")
    val k = math.floorMod(mdHash("s"), 4L) + 1
    val quota = 10L * k / 4
    val ordered = ids.sortBy(i => (mdHash(i.toString), i)).take(quota.toInt)
    val r = Mix.sourceMixFrom(df).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getAs[String]("source") == "s")
    assert(row.getAs[Double]("weight") == k / 4.0)
    assert(row.getAs[Long]("available") == 10L)
    assert(row.getAs[Long]("quota") == quota)
    assert(row.getAs[Long]("taken") == quota)
    assert(row.getAs[Long]("taken_tokens") == ordered.map(_ * 10L).sum)
    assert(row.getAs[Long]("taken_id_sum") == ordered.sum)
  }

  test("w1: two-phase bucketed rank equals the naive per-source window on sf0.001") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select(col("doc_id"), col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("ntok"))
    val base = docs.withColumn("h",
      TextOps.tokenHash(col("doc_id").cast("string")))
    val quotas = base.groupBy("source").agg(count(lit(1)).as("available"))
      .withColumn("k", Mix.weightK(col("source")))
      .withColumn("quota", expr("(available * k) div 4"))
    val naive = base
      .withColumn("rk", row_number().over(
        Window.partitionBy("source").orderBy(col("h"), col("doc_id"))))
      .join(quotas, Seq("source"))
      .withColumn("sel", col("rk") <= col("quota"))
      .groupBy("source")
      .agg((max("k").cast("double") / lit(4.0)).as("weight"),
        max("available").as("available"), max("quota").as("quota"),
        sum(when(col("sel"), lit(1L)).otherwise(lit(0L))).as("taken"),
        sum(when(col("sel"), col("ntok")).otherwise(lit(0L))).as("taken_tokens"),
        sum(when(col("sel"), col("doc_id")).otherwise(lit(0L))).as("taken_id_sum"))
      .orderBy("source")
      .collect()
    val twoPhase = Mix.sourceMix(spark, Sf0001).collect()
    assert(twoPhase.length == naive.length && twoPhase.length == 20)
    twoPhase.zip(naive).foreach { case (a, b) =>
      assert(a.getAs[String]("source") == b.getAs[String]("source"))
      Seq("available", "quota", "taken", "taken_tokens", "taken_id_sum")
        .foreach(c => assert(a.getAs[Long](c) == b.getAs[Long](c), c))
      assert(a.getAs[Double]("weight") == b.getAs[Double]("weight"))
    }
  }

  /** Four docs in ONE bucket whose hash order carries sizes
    * 150,150,100,100 against budget 256: greedy next-fit yields
    * [150],[150+100],[100] — 3 sequences — while the optimal pairing
    * [150+100],[150+100] needs only 2. Pins both the exact greedy
    * fold and that packing is greedy, not optimal.
    */
  test("w2: greedy next-fit packing, where greedy and optimal differ") {
    val sameBucket = (1L to 500L)
      .filter(i => math.floorMod(mdHash(i.toString), Mix.PackBucketsMin) == 0L)
      .sortBy(i => (mdHash(i.toString), i))
      .take(4)
    assert(sameBucket.length == 4)
    val sizes = Seq(150L, 150L, 100L, 100L)
    val df = sameBucket.zip(sizes).toDF("doc_id", "ntok")
    val r = Mix.seqPackFrom(df, 256L).collect()
    assert(r.map(_.getAs[Long]("seq")).toSeq == Seq(0L, 1L, 2L))
    assert(r.map(_.getAs[Long]("n_docs")).toSeq == Seq(1L, 2L, 1L))
    assert(r.map(_.getAs[Long]("n_tokens")).toSeq == Seq(150L, 250L, 100L))
    assert(r.map(_.getAs[Double]("fill_frac")).toSeq ==
      Seq(150.0 / 256, 250.0 / 256, 100.0 / 256).map(v => math.round(v * 1e6) / 1e6))
    // optimal packs the same sizes into 2 sequences — greedy used 3
    assert(150L + 100L <= 256L && r.length == 3)
  }

  test("w2: oversized doc gets its own sequence; packing never splits a doc") {
    val sameBucket = (1L to 500L)
      .filter(i => math.floorMod(mdHash(i.toString), Mix.PackBucketsMin) == 3L)
      .sortBy(i => (mdHash(i.toString), i))
      .take(3)
    val sizes = Seq(50L, 300L, 50L) // 300 > budget 256
    val df = sameBucket.zip(sizes).toDF("doc_id", "ntok")
    val r = Mix.seqPackFrom(df, 256L).collect()
    assert(r.map(_.getAs[Long]("n_tokens")).toSeq == Seq(50L, 300L, 50L))
    assert(r.map(_.getAs[Long]("n_docs")).forall(_ == 1L))
  }

  test("w2: token conservation and budget bound on sf0.001") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select(col("doc_id"), size(TextOps.tokens(col("text"))).cast("long").as("ntok"))
    val total = docs.agg(sum("ntok")).collect()(0).getLong(0)
    val packed = Mix.seqPack(spark, Sf0001).collect()
    assert(packed.map(_.getAs[Long]("n_tokens")).sum == total)
    assert(docs.count() == packed.map(_.getAs[Long]("n_docs")).sum)
    packed.foreach { r =>
      assert(r.getAs[Long]("n_tokens") <= Mix.PackBudget ||
        r.getAs[Long]("n_docs") == 1L)
    }
    // every bucket's sequence ids are a gapless 0..n prefix
    packed.groupBy(_.getAs[Long]("bucket")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("seq")).sorted.toSeq ==
        (0L until rows.length.toLong))
    }
  }

  /** The stream count derives from the corpus size so per-stream
    * collect_list state stays executor-bounded at any scale — pinned at
    * the exact boundaries of the formula (the plan uses the identical
    * `div` arithmetic via expr; the small-corpus tests above run with
    * the floor value 16).
    */
  test("w2: packStreams derivation boundaries") {
    assert(Mix.packStreams(0L) == Mix.PackBucketsMin)
    assert(Mix.packStreams(500L) == Mix.PackBucketsMin)
    assert(Mix.packStreams(16L * Mix.PackStreamRows) == Mix.PackBucketsMin)
    assert(Mix.packStreams(16L * Mix.PackStreamRows + 1) == 17L)
    assert(Mix.packStreams(100L * Mix.PackStreamRows) == 100L)
    // 100 TB design point: ~10^11 docs → ~1.5M bounded streams, each
    // still ~PackStreamRows docs of fold state
    assert(Mix.packStreams(100000000000L) == 1525879L)
  }

  test("w3: regex counts and chained redaction on crafted strings") {
    val df = Seq(
      (1L, "reach a.b@x.co or c@d.io now"),           // 2 emails
      (2L, "call +1-555-123-4567 today"),              // 1 phone
      (3L, "host 10.0.0.1 and 192.168.001.255 up"),    // 2 ipv4
      (4L, "acct 123456789 ok but 987654321x sticks"), // 1 id (x kills \b)
      (5L, "plain text, no pii at all"),
      (6L, "u7@ex1.com +1-555-111-2222 8.8.8.8 555123456789")) // one of each
      .toDF("doc_id", "t")
    val r = Pii.piiScanFrom(df).collect()
    def row(i: Long) = r.find(_.getLong(0) == i).get
    assert(row(1).getAs[Long]("n_email") == 2 && row(1).getAs[Long]("n_pii") == 2)
    assert(row(2).getAs[Long]("n_phone") == 1 && row(2).getAs[Long]("n_pii") == 1)
    assert(row(3).getAs[Long]("n_ipv4") == 2 && row(3).getAs[Long]("n_pii") == 2)
    assert(row(4).getAs[Long]("n_id") == 1 && row(4).getAs[Long]("n_pii") == 1)
    assert(row(5).getAs[Long]("n_pii") == 0 &&
      row(5).getAs[Long]("len_redacted") == row(5).getAs[Long]("len_raw"))
    val r6 = row(6)
    assert(r6.getAs[Long]("n_email") == 1 && r6.getAs[Long]("n_phone") == 1 &&
      r6.getAs[Long]("n_ipv4") == 1 && r6.getAs[Long]("n_id") == 1 &&
      r6.getAs[Long]("n_pii") == 4)
    // redacted form pinned exactly (chained order email→phone→ip→id)
    assert(r6.getAs[Long]("len_redacted") ==
      "<EMAIL> <PHONE> <IP> <ID>".length)
  }

  test("w3: augmented column injects on the modular schedule") {
    val df = Seq((105L, "base"), (1L, "base")).toDF("doc_id", "text")
      .select(col("doc_id"), Pii.augmented(col("text"), col("doc_id")).as("t"))
    val r = Pii.piiScanFrom(df).collect()
    val a = r.find(_.getLong(0) == 105L).get // 105 = 3·5·7 → email+phone+ip
    assert(a.getAs[Long]("n_email") == 1 && a.getAs[Long]("n_phone") == 1 &&
      a.getAs[Long]("n_ipv4") == 1 && a.getAs[Long]("n_id") == 0)
    val b = r.find(_.getLong(0) == 1L).get // 1 divides nothing scheduled
    assert(b.getAs[Long]("n_pii") == 0)
  }

  test("w12: redaction transform is byte-pinned by its hash") {
    val t = "mail a@b.co and +1-555-123-4567 then 10.0.0.1 plus 123456789 done"
    val expected = "mail <EMAIL> and <PHONE> then <IP> plus <ID> done"
    val d = Seq((1L, t)).toDF("doc_id", "t")
    val r = Pii.piiRedactFrom(d).collect().head
    assert(r.getLong(1) == 4L)
    assert(r.getLong(2) == expected.length.toLong)
    assert(r.getLong(3) == mdHash(expected))
    // real corpus: every row hashes, counts match the W3 scan
    val c = Pii.piiRedact(spark, Sf0001).collect()
    val scan = Pii.piiScan(spark, Sf0001).collect()
      .map(x => x.getLong(0) -> x.getAs[Long]("n_pii")).toMap
    assert(c.length == scan.size)
    c.foreach { x =>
      assert(scan(x.getLong(0)) == x.getLong(1))
      assert(!x.isNullAt(3))
    }
  }

  test("c1 funnel per-source rows stay consistent across stages on sf0.001") {
    val rows = graft.ext.Curation.funnel(spark, Sf0001).collect()
    val byStage = rows.groupBy(_.getAs[String]("stage"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    assert(byStage("1_ingest") == 500L)
    assert(byStage("2_quality") <= byStage("1_ingest"))
    assert(byStage("3_dedup") <= byStage("2_quality"))
    val splitTotal = Seq("4_train", "5_val", "6_test")
      .map(s => byStage.getOrElse(s, 0L)).sum
    assert(splitTotal == byStage("3_dedup"))
    // every stage is per-source now: ingest has one row per source
    assert(rows.count(_.getAs[String]("stage") == "1_ingest") == 20)
  }

  test("c2 data card agrees with the operators it summarizes on sf0.001") {
    val card = graft.ext.Curation.dataCard(spark, Sf0001).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    assert(card.values.map(_.getAs[Long]("n_docs")).sum == docs.count())
    // language counts partition each source's docs
    card.values.foreach { r =>
      assert(r.getAs[Long]("n_en") + r.getAs[Long]("n_es") + r.getAs[Long]("n_de")
        == r.getAs[Long]("n_docs"))
    }
    // quotas match W1's mixture arithmetic source-for-source
    val w1 = Mix.sourceMix(spark, Sf0001).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("quota"), r.getAs[Double]("weight"))).toMap
    card.foreach { case (src, r) =>
      assert(r.getAs[Long]("quota") == w1(src)._1, s"quota drift for $src")
      assert(r.getAs[Double]("weight") == w1(src)._2)
    }
    // corpus-wide dup counts match D1's exact dedup
    val dupTotal = graft.ext.Dedup.exact(spark, Sf0001).collect()
      .count(_.getAs[Int]("is_dup") == 1)
    val cardDups = card.values.map(r =>
      math.round(r.getAs[Double]("dup_frac") * r.getAs[Long]("n_docs"))).sum
    assert(cardDups == dupTotal,
      s"per-source dup fractions must re-sum to D1's total: $cardDups vs $dupTotal")
  }

  test("w4: exact global quality rank, tie-break on doc_id, equal phase split") {
    // 6 docs across 4 quality-range buckets, incl. a tied pair (docs 2,3)
    val d = Seq(
      (1L, 0.95), (2L, 0.85), (3L, 0.85), (4L, 0.50), (5L, 0.499), (6L, 0.10))
      .toDF("doc_id", "quality")
    val r = Mix.curriculumFrom(d).collect()
      .map(x => x.getLong(0) -> (x.getLong(2), x.getLong(3))).toMap
    assert(r == Map(
      1L -> ((1L, 1L)), 2L -> ((2L, 1L)), 3L -> ((3L, 2L)),
      4L -> ((4L, 2L)), 5L -> ((5L, 3L)), 6L -> ((6L, 3L))), s"$r")
  }

  test("w4: two-phase bucketed rank equals the naive global window on sf0.001") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select(col("doc_id"), TextOps.qualityCol.as("quality"))
    val naive = docs
      .withColumn("rk", row_number().over(
        Window.orderBy(col("quality").desc, col("doc_id"))))
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[Int]("rk").toLong).toMap
    val r = Mix.curriculum(spark, Sf0001).collect()
    assert(r.length == naive.size)
    r.foreach { x =>
      assert(x.getLong(2) == naive(x.getLong(0)),
        s"doc ${x.getLong(0)}: two-phase rank ${x.getLong(2)} != naive ${naive(x.getLong(0))}")
    }
    // phases partition the corpus into (near-)equal thirds
    val byPhase = r.groupBy(_.getLong(3)).view.mapValues(_.length).toMap
    assert(byPhase.keySet == Set(1L, 2L, 3L))
    assert(byPhase.values.max - byPhase.values.min <= 1)
  }

  test("w8: with budget == Σ(mult·tokens), epochs collapse to the multipliers") {
    import org.apache.spark.sql.functions.col
    // 9 docs, quality ladder 0.9..0.1 → phases (1,1,1,2,2,2,3,3,3);
    // 100 tokens each; tot = 4·300 + 2·300 + 1·300 = 2100
    val src = Seq("A", "A", "B", "A", "B", "B", "B", "B", "B")
    val d = (1 to 9).map(i =>
        (i.toLong, src(i - 1), 100L, (10 - i) / 10.0))
      .toDF("doc_id", "source", "ntok", "quality")
    val r = graft.ext.Mix.qualityUpsampleFrom(d, 2100L).collect()
    assert(r.length == 5) // (A,1) (A,2) (B,1) (B,2) (B,3)
    r.foreach { row =>
      val mult = row.getLong(4)
      val phase = row.getLong(1)
      assert(mult == (if (phase == 1) 4L else if (phase == 2) 2L else 1L))
      // target = mult·available exactly → epochs == mult, no remainder
      assert(row.getLong(5) == mult * row.getLong(3))
      assert(row.getDouble(6) == mult.toDouble)
      assert(row.getLong(7) == mult)
    }
    val cells = r.map(x => (x.getString(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(cells == Map(("A", 1L) -> 2L, ("B", 1L) -> 1L, ("A", 2L) -> 1L,
      ("B", 2L) -> 2L, ("B", 3L) -> 3L))
    // registry entry runs on the real corpus with budget conservation
    val c = graft.ext.Mix.qualityUpsample(spark, Sf0001).collect()
    assert(c.nonEmpty)
    val alloc = c.map(_.getLong(5)).sum
    assert(alloc <= graft.ext.Mix.EpochTokenBudget) // div truncation only loses
    assert(alloc > graft.ext.Mix.EpochTokenBudget * 9 / 10)
  }

  test("w14: stride-scheduled interleave — exact strides, per-prefix proportionality within one stride") {
    import org.apache.spark.sql.functions.col
    import graft.ext.Mix
    // crafted corpus: 3 sources, 600 docs each (enough that the 500-row
    // prefix never exhausts a source — proportionality is then the pure
    // stride-scheduling bound, no edge effects)
    val d = (0 until 1800).map(i => (i.toLong, s"src${i % 3}"))
      .toDF("doc_id", "source")
    val r = Mix.interleaveScheduleFrom(d).collect()
    assert(r.length == Mix.InterleaveLimit)
    // pos contiguous, v non-decreasing
    assert(r.map(_.getInt(0)).toSeq == (1 to Mix.InterleaveLimit))
    val vs = r.map(_.getLong(1)).toSeq
    assert(vs == vs.sorted)
    // exact stride law: v == src_seq · (12 / k) for every row
    r.foreach { row =>
      val k = row.getLong(5)
      assert(Mix.InterleaveLcm % k == 0)
      assert(row.getLong(1) == row.getInt(4) * (Mix.InterleaveLcm / k),
        s"stride law broken at pos ${row.getInt(0)}")
    }
    // within a source, src_seq strictly increases with pos (stream order
    // is preserved by the interleave)
    r.groupBy(_.getString(2)).foreach { case (_, rows) =>
      val seqs = rows.sortBy(_.getInt(0)).map(_.getInt(4)).toSeq
      assert(seqs == seqs.sorted && seqs.distinct == seqs)
    }
    // stride-scheduling proportionality: in ANY prefix of length L,
    // source s holds L·k_s/Σk documents within one stride's worth
    val ks = r.map(row => row.getString(2) -> row.getLong(5)).toMap
    val sumK = ks.values.sum
    for (l <- Seq(60, 120, 250, 500)) {
      val prefix = r.filter(_.getInt(0) <= l)
      ks.foreach { case (src, k) =>
        val got = prefix.count(_.getString(2) == src)
        val want = l.toDouble * k / sumK
        assert(math.abs(got - want) <= 2.0,
          s"prefix $l source $src: got $got want ~$want")
      }
    }
    // real corpus: bounded output, deterministic across invocations
    val c1 = Mix.interleaveSchedule(spark, Sf0001).collect()
    val c2 = Mix.interleaveSchedule(spark, Sf0001).collect()
    assert(c1.nonEmpty && c1.length <= Mix.InterleaveLimit)
    assert(c1.map(_.toString).toSeq == c2.map(_.toString).toSeq)
  }
}
