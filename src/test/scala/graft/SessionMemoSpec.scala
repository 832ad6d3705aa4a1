package graft

import scala.jdk.CollectionConverters._

import graft.ext.SessionMemo

/** Pins the r14 SessionMemo contract: nested builds on the ONE shared
  * map are safe (the replaced `computeIfAbsent` threw "Recursive
  * update" — or silently dropped the inner entry — whenever a nested
  * build's key hashed into the outer key's reserved bin; Graph and
  * Dedup builds nest two and three deep), and a concurrent first-build
  * race publishes exactly one value.
  */
class SessionMemoSpec extends SparkSpec {

  test("nested builds never throw and both levels memoize") {
    val outer = SessionMemo.get[String](spark, "smtest:outer") {
      val inner = SessionMemo.get[String](spark, "smtest:inner") { "inner-v" }
      "outer-" + inner
    }
    assert(outer == "outer-inner-v")
    // the inner entry was PUBLISHED, not dropped: a second get must not
    // re-run the build
    val again = SessionMemo.get[String](spark, "smtest:inner") {
      throw new IllegalStateException("inner entry was dropped and rebuilt")
    }
    assert(again == "inner-v")
    // sweep many key pairs so some inner keys land in the outer key's
    // hash bin — the exact geometry the old computeIfAbsent crashed on
    (0 until 256).foreach { i =>
      val v = SessionMemo.get[String](spark, s"smtest:o$i") {
        SessionMemo.get[String](spark, s"smtest:i$i") { i.toString }
      }
      assert(v == i.toString)
    }
  }

  test("concurrent first-build race publishes exactly one value") {
    val results = new java.util.concurrent.ConcurrentLinkedQueue[AnyRef]()
    val barrier = new java.util.concurrent.CyclicBarrier(8)
    val threads = (0 until 8).map { _ =>
      new Thread(() => {
        barrier.await()
        results.add(SessionMemo.get[AnyRef](spark, "smtest:race") { new Object })
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    // duplicate CONSTRUCTION under the race is benign (values are pure),
    // but every caller must observe the same published value
    assert(results.asScala.toSet.size == 1)
  }
}
