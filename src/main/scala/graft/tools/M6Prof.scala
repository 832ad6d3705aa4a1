package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** M6 leg profiler (r20 diagnostic, verdict item 6): times each leg of
  * `Multimodal.frameOverlap` — the persisted frame-posting base, the
  * df-cap, the inverted-index self-join, and the full query — so the
  * per-iteration warm cost can be attributed to a specific leg instead
  * of guessed. Pure diagnostics; not in the registry or sweep.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.M6Prof"
  */
object M6Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.maxPlanStringLength", "8192")
      // r20: codegen-class cache sized to the registry (see Bench.buildSession)
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "4096"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftExtensions.register(spark)

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $tag%-30s ${(System.nanoTime() - t0) / 1e9}%6.2f s  -> $r")
      r
    }

    import graft.sources.Multimodal
    val tbl = Multimodal.table(spark, sfDir)
    println("PROBE docs rows " + tbl.count())

    // Rebuild the legs exactly as frameOverlapFrom does, timing each.
    val fh = Multimodal.framesOf(tbl)
      .select(col("doc_id"), col("frame_hash")).distinct().persist()
    t("fh distinct postings")(fh.count())
    val keep = fh.groupBy("frame_hash").agg(count(lit(1)).as("df"))
      .filter(col("df") <= Multimodal.MaxFrameDf).select("frame_hash")
    t("keep (df-capped hashes)")(keep.count())
    val capped = fh.join(keep, "frame_hash")
    t("capped postings")(capped.count())
    val pairs = capped.as("a").join(capped.as("b"), "frame_hash")
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
    t("pairs (grouped)")(pairs.count())
    t("pairs warm")(pairs.count())
    fh.unpersist()

    val q = graft.SparkEntry.queries("m6_frame_overlap")(spark, sfDir)
    t("m6 full cold")(q.collect().length)
    t("m6 full warm1")(q.collect().length)
    t("m6 full warm2")(q.collect().length)
    t("m6 full warm3")(q.collect().length)
    // Fresh construction per iteration — what the bench's timed() loop
    // actually does for an extraIters entry (keepBetween leaves the
    // prior iteration's cache armed; does CacheManager reuse it across
    // construction calls?)
    // Fresh construction per iteration — what the bench's timed() loop
    // does for an extraIters entry: the armed fh/cappedN caches are
    // reused across constructions (canonicalized-plan match), so this
    // measures exactly the per-iteration stage overhead the sweep
    // publishes. r20 finding: with the sizes joins folded into the
    // posting enrichment this dropped 1.9–2.3 s → 0.9–1.2 s.
    (1 to 3).foreach { i =>
      t(s"m6 reconstruct+run $i") {
        graft.SparkEntry.queries("m6_frame_overlap")(spark, sfDir).collect().length
      }
    }
    spark.catalog.clearCache()
    spark.stop()
  }
}
