package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** C1: the end-to-end curation funnel — the composition a real
  * training-data run executes over the operator tiers this library
  * provides: quality gate ([[TextOps.qualityCol]]) → fuzzy-dedup to
  * cluster canonicals ([[Dedup.clusterIds]], the D7 transitive
  * closure) → deterministic split assignment (T7 hash buckets) — with
  * one row of exact integer counters per funnel stage, the numbers a
  * data card reports.
  *
  * Stage semantics are SEQUENTIAL (each filter applies to the previous
  * stage's survivors), except cluster labels, which are computed over
  * the FULL corpus: canonicality is a global property — a low-quality
  * canonical must not resurrect its higher-id duplicates.
  *
  * Determinism: every emitted number is an integer count or exact
  * integer sum; the single float in the plan (the quality score) is
  * rounded at 6 decimals BEFORE the threshold compare, so both engines
  * gate on the identical value. Scale shape: one corpus scan builds the
  * (ntok, quality) base; the cluster-label join is the D7 relation;
  * every stage aggregate is map-side partial; nothing is collected.
  */
object Curation {

  /** Quality threshold for stage 2 — intentionally inside the corpus'
    * observed score range (sf medians sit near 0.4) so the gate
    * demonstrably filters.
    */
  val QualityMin = 0.4

  private def t(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Per-(stage, source) funnel — the per-source breakdown makes the
    * funnel compose with W1's mixture weights: one query yields the
    * full data-card table (each source's survival through every gate).
    * Aggregation keys grow by the source cardinality only — mixture
    * configs are small, so every stage aggregate stays map-side
    * partial-friendly exactly as before.
    */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir).select(col("doc_id"), col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("ntok"),
        TextOps.qualityCol.as("q"))
      .persist() // one corpus scan feeds three stage aggregates
    def stageAgg(df: DataFrame, label: String): DataFrame =
      df.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          coalesce(sum("ntok"), lit(0L)).as("n_tokens"))
        .select(lit(label).as("stage"), col("source"), col("n_docs"), col("n_tokens"))
    val qual = base.filter(col("q") > QualityMin)
    val kept = qual.join(Dedup.clusterIds(s, dir),
        qual("doc_id") === col("id") && col("id") === col("lbl"))
      .select(qual("doc_id"), qual("source"), col("ntok"))
    val bucket = pmod(TextOps.tokenHash(col("doc_id").cast("string")), lit(100L))
    val splits = kept
      .select(col("source"), col("ntok"),
        when(bucket < TextOps.TrainBuckets, "4_train")
          .when(bucket < TextOps.ValBuckets, "5_val")
          .otherwise("6_test").as("stage"))
      .groupBy("stage", "source")
      .agg(count(lit(1)).as("n_docs"), sum("ntok").as("n_tokens"))
      .select(col("stage"), col("source"), col("n_docs"), col("n_tokens"))
    stageAgg(base, "1_ingest")
      .unionAll(stageAgg(qual, "2_quality"))
      .unionAll(stageAgg(kept, "3_dedup"))
      .unionAll(splits)
      .orderBy("stage", "source")
  }

  val funnelSql: String =
    s"""WITH RECURSIVE ${Dedup.clusterLabCtes},
    base AS (
      SELECT doc_id, source, CAST(len(${TextOps.tokensSql}) AS BIGINT) AS ntok,
        ${TextOps.qualityColSql} AS q
      FROM documents),
    qual AS (SELECT * FROM base WHERE q > ${QualityMin}),
    kept AS (
      SELECT qual.doc_id, qual.source, ntok FROM qual
      JOIN lab ON qual.doc_id = lab.doc_id AND lab.doc_id = lab.cluster_id),
    splits AS (
      SELECT CASE WHEN b < ${TextOps.TrainBuckets} THEN '4_train'
                  WHEN b < ${TextOps.ValBuckets} THEN '5_val'
                  ELSE '6_test' END AS stage,
        source, COUNT(*) AS n_docs, CAST(SUM(ntok) AS BIGINT) AS n_tokens
      FROM (SELECT source, ntok,
              ${TextOps.tokenHashSql("CAST(doc_id AS VARCHAR)")} % 100 AS b
            FROM kept)
      GROUP BY 1, 2)
    SELECT '1_ingest' AS stage, source, COUNT(*) AS n_docs,
      CAST(COALESCE(SUM(ntok), 0) AS BIGINT) AS n_tokens FROM base GROUP BY source
    UNION ALL SELECT '2_quality', source, COUNT(*),
      CAST(COALESCE(SUM(ntok), 0) AS BIGINT) FROM qual GROUP BY source
    UNION ALL SELECT '3_dedup', source, COUNT(*),
      CAST(COALESCE(SUM(ntok), 0) AS BIGINT) FROM kept GROUP BY source
    UNION ALL SELECT stage, source, n_docs, n_tokens FROM splits
    ORDER BY stage, source"""
}
