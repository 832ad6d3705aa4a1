package graft.ext

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the learned-
  * centroid counterpart of the sign-LSH path in [[Similarity]]: a KMeans
  * coarse quantizer partitions the corpus into `nlist` cells; a query
  * probes its `nprobe` nearest cells and exact-cosine re-ranks only
  * those candidates.
  *
  * Plan shape at scale: the corpus is bucketed ONCE (one shuffle on the
  * cell id, then cell-clustered storage amortizes every query); per
  * query-batch work is a join against the probed cells — a broadcast
  * join for bounded batches, a cell-keyed shuffle join above
  * [[MaxBroadcastQueries]] (the corpus moves on the same key its
  * bucketed layout clusters by) — the corpus never reshuffles PER
  * QUERY either way. Centroids (nlist×dim floats) always fit in a
  * broadcast.
  *
  * No DuckDB oracle (KMeans is not SQL-expressible) — but the output
  * carries its own ground-truth check: each row reports whether the
  * IVF candidate is in the EXACT cosine top-k (`exact_hit`, computed
  * in-plan against the brute-force baseline) and the per-query
  * `recall3`. The driver's rows-only gate sees a deterministic row
  * count; the spec gates on the embedded recall.
  */
object Ivf {

  val NList = 16
  val NProbe = 4
  val TopK = 3

  /** Quantizer training-set size: fixed, not a fraction — the fit cost
    * must not grow with the corpus.
    */
  val TrainSample = 2000

  /** Query batches up to this size ride a broadcast join against the
    * probed cells (zero corpus movement); a LARGER batch is no longer
    * "provably bounded" in the broadcast sense, so the probe join
    * becomes a cell-keyed shuffle join instead — the corpus side
    * shuffles once on its (already computed) cell id, the same key its
    * bucketed layout would be clustered by at rest. Both paths produce
    * identical rows (ExtSpec pins it).
    */
  val MaxBroadcastQueries = 4096

  /** Floor on the per-run mean recall@k (vs the in-plan exact baseline)
    * below which the query empties itself — so even a rows-only
    * correctness check fails on recall collapse, not just on a wrong
    * row count. Strictly-greater, like the ExtSpec gate; the mean is
    * computed from exact integer hit counts with one IEEE division, so
    * the comparison can't flip with partition order. Set as a QUALITY
    * bar, not just a collapse detector: measured mean recall@3 with
    * NProbe=4 is 0.70-0.75 across sf0.001/0.01/0.1, so 0.5 trips on any
    * real quantizer/probe regression while leaving honest headroom.
    */
  val MinRecall = 0.5

  private def toVec = udf((a: Seq[Float]) =>
    Vectors.dense(a.map(_.toDouble).toArray))

  def ivfTopk(s: SparkSession, dir: String): DataFrame =
    ivfTopk(s, dir, broadcastQueries = Similarity.NumQueries <= MaxBroadcastQueries)

  /** [[ivfTopk]] with the probe-join strategy explicit — the registry
    * entry picks by batch size; the spec drives both and asserts row
    * parity.
    */
  def ivfTopk(s: SparkSession, dir: String, broadcastQueries: Boolean): DataFrame = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
      .withColumn("features", toVec(col("embedding")))
      .withColumn("nrm", Similarity.norm(col("embedding")))
      .persist()

    // Fit the coarse quantizer on a deterministic fixed-size SAMPLE — at
    // corpus scale the quantizer never trains on all vectors; assignment
    // does see every vector below. Hash-ordered top-N is size-bounded
    // however the planner renders the limit (TakeOrdered, or a global
    // sort whose limit lets at most N rows per partition cross the
    // exchange) and deterministic, where a fraction-based sample would
    // need a separate COUNT pass to size the fraction.
    val train = emb
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(TrainSample)
    val model = new KMeans().setK(NList).setSeed(42L).setMaxIter(5)
      .setFeaturesCol("features").setPredictionCol("cell")
      .fit(train)
    val centroids = model.clusterCenters

    val corpus = model.transform(emb)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cell"))

    // Query side: nprobe nearest centroids per query vector, computed on
    // the (tiny) broadcast centroid set.
    val bc = s.sparkContext.broadcast(centroids.map(_.toArray))
    val probeCells = udf((a: Seq[Float]) => {
      val q = a.map(_.toDouble).toArray
      bc.value.zipWithIndex.map { case (c, i) =>
        var d = 0.0
        var j = 0
        while (j < q.length) { val t = q(j) - c(j); d += t * t; j += 1 }
        (i, d)
      }.sortBy(_._2).take(NProbe).map(_._1)
    })
    val queries = corpus.filter(col("vec_id") < Similarity.NumQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"),
        explode(probeCells(col("embedding"))).as("cell"))

    val probed =
      if (broadcastQueries) corpus.join(broadcast(queries), Seq("cell"))
      else corpus.join(queries, Seq("cell"))
    val cos = probed
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("oid"),
        (Similarity.dot(col("qe"), col("embedding")) / (col("qn") * col("nrm"))).as("cos"))
    val ivf = cos.withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("oid"))))
      .filter(col("rk") <= TopK)
      .select(col("qid"), col("rk"), col("oid"), round(col("cos"), 6).as("cos"))

    // Embedded ground truth: the EXACT cosine top-k per query (one more
    // broadcast pass — over the persisted `emb`, NOT the KMeans-
    // transformed `corpus`, so the prediction UDF doesn't rerun for a
    // plan that never reads `cell`), joined back so every IVF row
    // self-reports whether it's a true neighbor and the query's
    // recall@k.
    val qbase = emb.filter(col("vec_id") < Similarity.NumQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"))
    val exact = Similarity.exactTopk(
        emb.select(col("vec_id"), col("embedding"), col("nrm")), qbase, TopK)
      .select(col("qid"), col("oid"), lit(true).as("exact_hit"))
    val res = ivf.join(exact, Seq("qid", "oid"), "left")
      .withColumn("exact_hit", coalesce(col("exact_hit"), lit(false)))
      .withColumn("recall3",
        sum(when(col("exact_hit"), 1L).otherwise(0L))
          .over(Window.partitionBy("qid")).cast("double") / TopK)
      .select(col("qid"), col("rk"), col("oid"), col("cos"),
        col("exact_hit"), col("recall3"))
      .persist() // tiny (queries×k rows); feeds the output AND the guard

    // Recall guard: if the run's mean recall@k vs the exact baseline
    // falls below MinRecall the guard relation is EMPTY and the whole
    // output empties with it — a rows-only driver check now fails on
    // quality collapse, not just on a missing row. One agg pass over the
    // persisted result (no intermediate distinct): each (qid, oid) row
    // is already unique, so mean recall = Σ hits / (n_queries · k) —
    // exact integer counts, a single IEEE division, strict > gate.
    // denominator = the FULL query count (bounded one-row agg), not the
    // distinct qids present in `res`: a query with zero IVF candidates
    // must count as recall 0 in the gate, not silently drop out
    val nq = qbase.agg(count(lit(1)).as("nq"))
    val guard = res
      .agg(sum(when(col("exact_hit"), 1L).otherwise(0L)).as("n_hit"))
      .crossJoin(broadcast(nq))
      .select((col("n_hit").cast("double") /
        (col("nq") * TopK).cast("double")).as("mean_recall"))
      .filter(col("mean_recall") > MinRecall)
      .select(lit(true).as("recall_ok"))
    res.crossJoin(broadcast(guard))
      .orderBy("qid", "rk")
  }

  /** The nprobe values S9 sweeps (≤ [[NList]]). */
  val ProbeGrid: Seq[Int] = Seq(1, 2, 4, 8)

  /** S9: recall-vs-nprobe sweep — for each probe width in [[ProbeGrid]],
    * the mean recall@[[TopK]] against the in-plan exact baseline and the
    * mean candidate count per query: the tuning curve every real ANN
    * deployment reads before fixing its latency/recall point (FAISS'
    * nprobe knob). Shares the quantizer, probe logic, and exact-top-k
    * construction with [[ivfTopk]] so the curve describes exactly the
    * operator s4 ships.
    *
    * One probe pass at the WIDEST grid value does all the work: each
    * candidate row carries the probe RANK of the cell that produced it,
    * and narrower widths are `prank ≤ p` filters over the same relation
    * — the sweep never re-joins the corpus per grid point. Like s4, not
    * SQL-expressible (KMeans); the embedded exact baseline is the
    * ground truth and the spec gates monotonicity.
    */
  def probeSweep(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
      .withColumn("features", toVec(col("embedding")))
      .withColumn("nrm", Similarity.norm(col("embedding")))
      .persist()
    val train = emb
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(TrainSample)
    val model = new KMeans().setK(NList).setSeed(42L).setMaxIter(5)
      .setFeaturesCol("features").setPredictionCol("cell")
      .fit(train)
    val maxProbe = ProbeGrid.max
    val bc = s.sparkContext.broadcast(model.clusterCenters.map(_.toArray))
    // (cell, probe_rank) pairs for the widest width — identical distance
    // logic to ivfTopk's probeCells
    val probeRanked = udf((a: Seq[Float]) => {
      val q = a.map(_.toDouble).toArray
      bc.value.zipWithIndex.map { case (c, i) =>
        var d = 0.0
        var j = 0
        while (j < q.length) { val t = q(j) - c(j); d += t * t; j += 1 }
        (i, d)
      }.sortBy(_._2).take(maxProbe).zipWithIndex
        .map { case ((cell, _), r) => (cell, r + 1) }
    })
    val corpus = model.transform(emb)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cell"))
    val queries = emb.filter(col("vec_id") < Similarity.NumQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"),
        explode(probeRanked(col("embedding"))).as("pc"))
      .select(col("qid"), col("qe"), col("qn"),
        col("pc._1").as("cell"), col("pc._2").as("prank"))
    val cand = corpus.join(broadcast(queries), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("prank"), col("vec_id").as("oid"),
        (Similarity.dot(col("qe"), col("embedding")) / (col("qn") * col("nrm")))
          .as("cos"))
      .persist() // one probe pass feeds every grid point
    val qbase = emb.filter(col("vec_id") < Similarity.NumQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"))
    val exact = Similarity.exactTopk(
        emb.select(col("vec_id"), col("embedding"), col("nrm")), qbase, TopK)
      .select(col("qid"), col("oid"), lit(true).as("exact_hit"))
    // One relation serves every grid point (the e13 expansion pattern):
    // a candidate produced at probe rank r belongs to every sweep width
    // p ≥ r, so each row explodes into its ≤|grid| memberships and ONE
    // window over (qid, nprobe) ranks all sweep points together —
    // instead of a window + two aggs PER grid point (26 shuffles → the
    // r10 audit's improvement item). Expansion factor is the constant
    // grid size, never corpus-proportional.
    val gridArr = array(ProbeGrid.sorted.map(lit): _*)
    val candGrid = cand
      .select(col("qid"), col("oid"), col("cos"),
        explode(filter(gridArr, p => p >= col("prank"))).as("nprobe"))
    val hits = candGrid
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid", "nprobe").orderBy(col("cos").desc, col("oid"))))
      .filter(col("rk") <= TopK)
      .join(exact, Seq("qid", "oid"), "left")
      .groupBy("nprobe")
      .agg(sum(when(col("exact_hit"), 1L).otherwise(0L)).as("n_hit"))
    val nCand = candGrid.groupBy("nprobe").agg(count(lit(1)).as("n_cand"))
    // Denominator = the FULL query count (one bounded agg), not the
    // distinct qids that happened to produce candidates: a query with
    // zero candidates at a narrow width counts as recall 0 instead of
    // silently dropping out (which inflated narrow-width recall and
    // weakened the monotonicity guarantee). With the full-count
    // denominator, monotonicity is exact: widening the probe only adds
    // candidates, and an exact-top-k member can never be displaced from
    // the IVF top-k by a non-member (members are the k highest cosines).
    val nq = qbase.agg(count(lit(1)).as("nq"))
    // grid points with zero candidates still emit their row (left joins
    // from the literal grid relation; n_hit/n_cand coalesce to 0)
    val gridDf = ProbeGrid.sorted.toDF("nprobe")
    gridDf
      .join(hits, Seq("nprobe"), "left")
      .join(nCand, Seq("nprobe"), "left")
      .crossJoin(broadcast(nq))
      .select(col("nprobe"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double") /
          (col("nq") * TopK).cast("double"), 6).as("mean_recall"),
        round(coalesce(col("n_cand"), lit(0L)).cast("double") /
          col("nq").cast("double"), 2).as("mean_candidates"))
      .orderBy("nprobe")
  }
}
