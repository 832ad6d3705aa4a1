package graft.ext

import org.apache.spark.sql.SparkSession

/** Session-scoped memo for expensive-to-build relations shared across
  * registry queries — the shared registry behind the re-armed-persist
  * pattern (shingle builds, CC labels, co-purchase adjacency; see
  * CLAUDE.md "re-armed-persist memo"). Values are pure in
  * (session, key). Entries whose SparkSession has STOPPED are evicted
  * on every access, so a long-lived JVM cycling sessions (test suites,
  * notebooks) does not pin dead DataFrames and persist references for
  * its lifetime — r12 ADVICE: with a third per-object
  * ConcurrentHashMap copy the leak had become structural; this is the
  * one shared, self-cleaning home.
  */
private[graft] object SessionMemo {
  private val entries = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), AnyRef]

  /** Re-arm a memoized relation's persist if a caller's clearCache
    * dropped it — the ONE shared copy of the idiom every memo holder
    * (Dedup, Graph, Enhance, Ivf) applies to relations it hands out;
    * re-execution then reuses the retained shuffle files of the same
    * RDD lineage.
    */
  def rearm(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE) df.persist()
    df
  }

  /** Memoized build of a pure (session, key) value. The caller re-arms
    * any persists on the returned relations (the storageLevel check).
    *
    * Deliberately NOT `computeIfAbsent`: builds nest (Graph.components →
    * edgeRelations → halfPairs; Dedup.clusterIds → minhashSig), and a
    * nested `computeIfAbsent` on one ConcurrentHashMap throws
    * "Recursive update" (or silently drops the inner entry) whenever the
    * inner key hashes into the outer key's reserved bin — session-
    * identity-hash dependent, so intermittent per JVM. get-then-build-
    * then-putIfAbsent is race-safe here because values are pure in
    * (session, key): a duplicate plan construction under a race is
    * benign and the first published value wins — but build blocks have
    * one side effect, `.persist()` marks, so the losing thread's
    * discarded build is swept for persisted Datasets and unpersists
    * them (r14 ADVICE: without the sweep the loser's cached RDDs leak
    * for the session's lifetime).
    */
  def get[A <: AnyRef](s: SparkSession, key: String)(build: => A): A = {
    val it = entries.keySet.iterator()
    while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
    val k = (s, key)
    val existing = entries.get(k)
    if (existing != null) existing.asInstanceOf[A]
    else {
      val built = build
      val prior = entries.putIfAbsent(k, built)
      if (prior != null) { unpersistAll(built); prior.asInstanceOf[A] }
      else built.asInstanceOf[A]
    }
  }

  /** Unpersist every persisted Dataset reachable from a discarded
    * duplicate build value (the value shapes memo holders use:
    * Datasets, tuples/case classes of them, collections). Non-Dataset
    * leaves (models, scalars) are side-effect-free and ignored.
    */
  private def unpersistAll(v: Any): Unit = v match {
    case ds: org.apache.spark.sql.Dataset[_] =>
      if (ds.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
        ds.unpersist(blocking = false)
    case p: Product => p.productIterator.foreach(unpersistAll)
    case xs: Iterable[_] => xs.foreach(unpersistAll)
    case _ => ()
  }
}
