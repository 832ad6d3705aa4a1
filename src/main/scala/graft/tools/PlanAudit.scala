package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/** Plan-shape audit: machine-checks the two scale invariants CLAUDE.md
  * states in prose and the judge has so far verified by hand —
  *
  *  1. NO `CartesianProductExec` anywhere in any registry plan. The
  *     legitimate "broadcast a provably-bounded relation into every
  *     row" shapes (recall guards, one-row stat joins) plan as
  *     BroadcastNestedLoopJoin, never as a cartesian; an actual
  *     cartesian means two unbounded sides multiplied — a 100 TB
  *     scale-killer by construction.
  *
  *  2. Global-order windows (a `WindowExec` whose partitionSpec is
  *     EMPTY — everything funnels through ONE task) only over provably
  *     bounded inputs. Two accepted proofs:
  *     (a) MACHINE-VERIFIED post-limit: the window's child subtree
  *         contains a limit node (TakeOrderedAndProject / GlobalLimit /
  *         CollectLimit), so at most `limit` rows ever reach the single
  *         task — the D2 "TakeOrdered then rank the survivors" shape;
  *     (b) the documented allowlist below for bin-/stat-spine windows
  *         whose bound lives in the GROUPING key domain (≤4096 bins,
  *         sources-sized relations) — invisible to a plan walk, so each
  *         entry carries its justification.
  *     A new global window with neither proof fails the audit until it
  *     is re-shaped (the W1/W4/T15 two-phase rank) or documented.
  *
  * QUERY execution is planning-only (AQE off so EnsureRequirements
  * materializes the full prepared tree — the Bench exchange-audit
  * trick): no registry query's output plan executes. BUILDER-side
  * driver actions DO run, though (r14 ADVICE: the doc previously
  * claimed "nothing executes"): constructing the s4/s9/s21/s22 plans
  * fits KMeans and collects the bounded TrainSample/codebook
  * relations, and memo holders persist shared builds — so a full-
  * registry audit costs ML-fit minutes, not milliseconds. Exits
  * nonzero on any violation.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.PlanAudit
  * [name ...]" — no names = the full registry.
  */
object PlanAudit {

  /** Queries allowed to carry a global-order (empty-partition) window,
    * with the boundedness argument for each. The window input bound is
    * what matters — the CORPUS-sized part of these plans never crosses
    * the single-task window.
    */
  private[graft] val GlobalWindowAllowed: Map[String, String] = Map(
    // 4096-bin histogram / CDF spines (the A-family's aggregated bin
    // relation — the window input is the post-groupBy bin domain)
    "a1_stats" -> "4096-bin histogram spine",
    "a2_percentiles" -> "4096-bin histogram spine",
    "a3_strategy_params" -> "4096-bin histogram spine",
    "a3_legacy_params" -> "4096-bin histogram spine",
    "a6_hist_floor" -> "combined 4096-bin spine",
    "p7_quantize_default" -> "4096-bin CDF spine",
    "p7_quantize_legacy" -> "4096-bin CDF spine",
    "p12_synrgb_suppressed" -> "≤256-value CDF spine",
    "a5_local_median_range" -> "data-derived grid-bucket spine (≤4096)",
    "a5b_local_enhanced_quantize" -> "data-derived grid-bucket spine (≤4096)",
    // two-phase-rank bucket-offset spines (≤64-row exclusive sums)
    "w4_curriculum" -> "bucket-offset spine, ≤64 rows",
    "t15_quality_winsor" -> "bucket-offset spine, ≤64 rows",
    "x11_rfm_segments" -> "value-bucket offset spine, ≤64 rows",
    "x15_customer_concentration" -> "value-bucket spine, ≤64 rows",
    // other bounded key-domain spines
    "e19_pareto_share" -> "decile spine, ≤10 rows",
    "t27_vocab_coverage" -> "coverage-bucket spine, ≤64 rows",
    "t30_heaps_law" -> "≤64-checkpoint spine",
    "x6_monthly_revenue" -> "calendar-month spine (dataset spans ~7y)",
    "s7_centroid_separation" -> "label×label relation (≤ labels² rows)",
    // surfaced by the r14 spine-dominance tightening: the seed spine is
    // a ≤SemSeeds-row relation, but its bound lives in seedRel's LIMIT
    // inside a JOIN leg — dominating for this left join (the spine is
    // the preserved side), invisible to the unary-spine walk
    "s16_cell_occupancy" -> "seed spine, ≤ SemSeeds rows (limit in the preserved join leg)")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // planning-only audit: AQE off so the prepared tree is walkable
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(spark)
    val names = if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    var cartesian = List.empty[String]
    var undocWindow = List.empty[String]
    var planFail = List.empty[String]
    val usedAllow = scala.collection.mutable.Set.empty[String]
    names.foreach { name =>
      try {
        val plan: SparkPlan =
          graft.SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan
        var hasCartesian = false
        var unboundedGlobal = 0
        var postLimitGlobal = 0
        // The limit must DOMINATE the window input: walk only the
        // unary child spine (projections, filters, sorts, exchanges —
        // none increase cardinality) and stop at anything that can
        // (joins: 2 children; Generate/Expand: row-multiplying unary).
        // A limit merely inside one leg of a join below the window
        // does NOT bound the window input and must not count (it did
        // in the first cut of this audit).
        @scala.annotation.tailrec
        def boundedByLimit(p: SparkPlan): Boolean = {
          val c = p.getClass.getSimpleName
          if (c == "TakeOrderedAndProjectExec" || c == "GlobalLimitExec" ||
              c == "CollectLimitExec") true
          else if (p.children.length != 1 ||
              c == "GenerateExec" || c == "ExpandExec") false
          else boundedByLimit(p.children.head)
        }
        plan.foreach {
          case _: CartesianProductExec => hasCartesian = true
          case w: WindowExec if w.partitionSpec.isEmpty =>
            if (boundedByLimit(w.child)) postLimitGlobal += 1
            else unboundedGlobal += 1
          case _ => ()
        }
        if (hasCartesian) cartesian ::= name
        val allowed = GlobalWindowAllowed.contains(name)
        if (unboundedGlobal > 0 && allowed) usedAllow += name
        if (unboundedGlobal > 0 && !allowed) undocWindow ::= name
        println(s"PLAN $name " +
          (if (hasCartesian) "CARTESIAN " else "") +
          (if (postLimitGlobal > 0) "global-window(post-limit) " else "") +
          (if (unboundedGlobal > 0)
            s"global-window${if (allowed) "(documented-spine)" else "(UNDOC)"} "
           else "") +
          (if (!hasCartesian && postLimitGlobal + unboundedGlobal == 0) "clean" else ""))
      } catch { case scala.util.control.NonFatal(e) =>
        planFail ::= name
        println(s"PLAN $name PLANNING-ERROR ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    // allowlist hygiene: an entry whose query no longer carries an
    // UN-limited global window (re-shaped, post-limit-proven, or
    // deleted) is stale — flag it so the list can't rot
    val stale = if (args.nonEmpty) Nil
      else GlobalWindowAllowed.keys.filterNot(usedAllow.contains).toList
    if (stale.nonEmpty)
      println(s"PLAN WARN stale allowlist entries: ${stale.sorted.mkString(", ")}")
    if (cartesian.nonEmpty || undocWindow.nonEmpty || planFail.nonEmpty) {
      println(s"PLAN AUDIT FAIL: cartesian=${cartesian.sorted.mkString(",")} " +
        s"undocumented-global-window=${undocWindow.sorted.mkString(",")} " +
        s"planning-error=${planFail.sorted.mkString(",")}")
      spark.stop()
      sys.exit(1)
    }
    println("PLAN AUDIT PASS: no cartesian products; every global-order " +
      "window is on the documented bounded allowlist")
    spark.stop()
  }
}
