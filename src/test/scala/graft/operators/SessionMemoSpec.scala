package graft.operators

import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the memo's two contracts: build-once PER (session, key), and —
  * since the per-key latch rework — no cross-key serialization: a hit
  * for one key returns while another key's multi-second build is still
  * in flight (the memo-wide monitor used to be held across `compute`,
  * so the media and lookup memos serialized every session in the JVM
  * behind whichever build ran first). */
class SessionMemoSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("build-once per key: concurrent callers share one compute") {
    val memo = new SessionMemo[String]
    val builds = new AtomicInteger(0)
    val gate = new CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (1 to 4).map { _ =>
      new Thread(() => {
        gate.await()
        results.add(memo.getOrCompute(spark, "k")(_ => true) {
          builds.incrementAndGet()
          Thread.sleep(50)
          "artifact"
        })
      })
    }
    threads.foreach(_.start()); gate.countDown(); threads.foreach(_.join(5000))
    assert(results.size == 4 && results.asScala.forall(_ == "artifact"))
    assert(builds.get() == 1, "exactly one build for 4 concurrent callers")
  }
  private implicit class QW[A](q: java.util.concurrent.ConcurrentLinkedQueue[A]) {
    def asScala: Iterator[A] = {
      val it = q.iterator()
      new Iterator[A] { def hasNext = it.hasNext; def next() = it.next() }
    }
  }

  test("a hit for one key returns before another key's slow build completes") {
    val memo = new SessionMemo[String]
    val slowStarted = new CountDownLatch(1)
    val slowRelease = new CountDownLatch(1)
    // warm key B while nothing is building
    assert(memo.getOrCompute(spark, "b")(_ => true)("fast") == "fast")
    val slow = new Thread(() => {
      memo.getOrCompute(spark, "a")(_ => true) {
        slowStarted.countDown()
        slowRelease.await(10, TimeUnit.SECONDS)
        "slow"
      }
    })
    slow.start()
    assert(slowStarted.await(5, TimeUnit.SECONDS), "slow build never started")
    // the HIT must not block behind the in-flight build of the other key
    val t0 = System.nanoTime()
    val hit = memo.getOrCompute(spark, "b")(_ => true)(
      fail("key b must be served from cache"))
    val hitMs = (System.nanoTime() - t0) / 1000000L
    assert(hit == "fast")
    assert(slowRelease.getCount == 1, "slow build still in flight at hit time")
    assert(hitMs < 2000, s"hit took ${hitMs}ms — serialized behind the build?")
    slowRelease.countDown()
    slow.join(5000)
    assert(memo.getOrCompute(spark, "a")(_ => true)(fail("a cached")) == "slow")
  }

  test("invalid hits recompute; failed builds release the slot") {
    val memo = new SessionMemo[String]
    assert(memo.getOrCompute(spark, "k")(_ => true)("v1") == "v1")
    // valid=false: the cached value is stale → rebuild
    assert(memo.getOrCompute(spark, "k")(_ => false)("v2") == "v2")
    // a failing build throws to its caller and leaves no poisoned slot
    val boom = intercept[RuntimeException] {
      memo.getOrCompute(spark, "gone")(_ => true)(
        throw new RuntimeException("build failed"))
    }
    assert(boom.getMessage == "build failed")
    assert(memo.getOrCompute(spark, "gone")(_ => true)("recovered")
      == "recovered")
  }
}
