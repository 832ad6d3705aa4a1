package graft

import org.apache.spark.sql.functions._

/** The bucketing story the scale notes assert, proven on a real plan:
  * fact-fact joins on a shared key co-locate with ZERO exchanges when
  * both sides are bucketed on that key — the at-rest layout a 100 TB
  * deployment uses so the orderkey join never reshuffles the corpus.
  */
class BucketSpec extends SparkSpec {

  test("orderkey-bucketed fact tables join with zero exchanges; rows match") {
    val s = spark
    import s.implicits._
    val priorBroadcast = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val base = "/tmp/graft_bucket_spec"
    try {
      // force the sort-merge path: broadcast would hide the exchange
      // question entirely
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.sql("DROP TABLE IF EXISTS graft_li_bucketed")
      s.sql("DROP TABLE IF EXISTS graft_ord_bucketed")
      val li = s.read.parquet(s"$Sf0001/lineitem.parquet")
      val ord = s.read.parquet(s"$Sf0001/orders.parquet")
      li.write.mode("overwrite").format("parquet")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$base/li").saveAsTable("graft_li_bucketed")
      ord.write.mode("overwrite").format("parquet")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$base/ord").saveAsTable("graft_ord_bucketed")

      val bucketed = s.table("graft_li_bucketed")
        .join(s.table("graft_ord_bucketed"), $"l_orderkey" === $"o_orderkey")
      val plain = li.join(ord, $"l_orderkey" === $"o_orderkey")

      // same result...
      assert(bucketed.count() == plain.count())
      // ...but the bucketed plan carries NO shuffle at all, while the
      // plain parquet join must exchange both sides
      val bucketedPlan = bucketed.queryExecution.executedPlan.toString
      val plainPlan = plain.queryExecution.executedPlan.toString
      assert(!bucketedPlan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$bucketedPlan")
      assert(plainPlan.contains("Exchange"),
        "control: the unbucketed join does shuffle")
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", priorBroadcast)
      s.sql("DROP TABLE IF EXISTS graft_li_bucketed")
      s.sql("DROP TABLE IF EXISTS graft_ord_bucketed")
    }
  }

  test("JSONL and CSV corpus round-trips are lossless under the explicit schema") {
    val s = spark
    val docs = s.read.parquet(s"$Sf0001/documents.parquet")
    val expect = docs.collect().map(_.toSeq).toSet

    graft.sources.TextCorpus.writeJsonl(docs, "/tmp/graft_corpus_jsonl", 4)
    val j = graft.sources.TextCorpus.readJsonl(s, "/tmp/graft_corpus_jsonl")
    assert(j.schema == graft.sources.TextCorpus.documentsSchema)
    assert(j.collect().map(_.toSeq).toSet == expect, "JSONL round-trip")

    graft.sources.TextCorpus.writeCsv(docs, "/tmp/graft_corpus_csv", 4)
    val c = graft.sources.TextCorpus.readCsv(s, "/tmp/graft_corpus_csv")
    assert(c.collect().map(_.toSeq).toSet == expect,
      "CSV round-trip incl. embedded newlines/quotes")
  }

  test("CSV round-trip distinguishes empty string, null, and whitespace") {
    val s = spark
    import s.implicits._
    // the r10 ADVICE case: the driver corpus has no empty strings, so the
    // lossless claim needs a fixture that actually exercises the
    // empty/null/whitespace corners of the quote convention
    val rows = Seq(
      (1L, "", "en", "web", 0L),                   // empty text
      (2L, null.asInstanceOf[String], "en", "web", 0L), // null text
      (3L, " ", "en", "web", 1L),                  // whitespace-only text
      (4L, "plain", null.asInstanceOf[String], "web", 5L), // null lang
      (5L, "q\"uote\nline", "", "web", 11L))       // empty lang + hard text
    val df = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    val expect = df.collect().map(_.toSeq).toSet
    graft.sources.TextCorpus.writeCsv(df, "/tmp/graft_corpus_csv_edge", 2)
    val back = graft.sources.TextCorpus.readCsv(s, "/tmp/graft_corpus_csv_edge")
    assert(back.collect().map(_.toSeq).toSet == expect,
      "empty string, null, and whitespace must each survive the round-trip")
  }
}
