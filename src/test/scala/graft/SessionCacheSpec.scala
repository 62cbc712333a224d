package graft

import org.scalatest.funsuite.AnyFunSuite

/** The shared-artifact memo ([[SessionCache]]) is keyed by the OWNING
  * SparkSession: a frame checkpointed in one session must never be
  * served to another (a recreated session would receive dead frames; a
  * sibling session would silently reuse a foreign plan).
  */
class SessionCacheSpec extends AnyFunSuite with SparkSpec {

  test("artifacts are memoized per session and never cross sessions") {
    var builds = 0
    def build(): String = { builds += 1; s"artifact-$builds" }

    val a1 = SessionCache.getOrElseUpdate(spark, ("spec", "k1"))(build())
    val a2 = SessionCache.getOrElseUpdate(spark, ("spec", "k1"))(build())
    assert(a1 === a2, "same (session, key) must hit the memo")
    assert(builds === 1, "the artifact must be built exactly once per session")

    // a sibling session (same context, distinct session state) must
    // build its OWN artifact — cached frames are session-bound
    val sibling = spark.newSession()
    val b1 = SessionCache.getOrElseUpdate(sibling, ("spec", "k1"))(build())
    assert(builds === 2, "a different session must not inherit the artifact")
    assert(b1 !== a1)

    // distinct logical keys under one session stay distinct
    SessionCache.getOrElseUpdate(spark, ("spec", "k2"))(build())
    assert(builds === 3)
  }

  test("invalidate releases a retired sibling session's entries, others stay") {
    val sizeBefore = SessionCache.size
    val sibling = spark.newSession()
    SessionCache.getOrElseUpdate(sibling, ("spec", "inv1"))("a")
    SessionCache.getOrElseUpdate(sibling, ("spec", "inv2"))("b")
    SessionCache.getOrElseUpdate(spark, ("spec", "inv-keep"))("c")
    assert(SessionCache.size === sizeBefore + 3)
    // the sibling shares a LIVE context, so only the explicit release
    // can drop its artifacts (the stopped-context eviction never fires)
    SessionCache.invalidate(sibling)
    assert(SessionCache.size === sizeBefore + 1,
      "the sibling's entries must go; the main session's must stay")
    var rebuilt = false
    SessionCache.getOrElseUpdate(sibling, ("spec", "inv1")) { rebuilt = true; "a2" }
    assert(rebuilt, "an invalidated entry must rebuild on next access")
  }

  test("concurrent first access runs the builder exactly once") {
    // a raced-and-lost builder would leak its localCheckpoint in real
    // use; the cell indirection must force only the published builder
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val start = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futures = (1 to 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String = {
            start.await()
            SessionCache.getOrElseUpdate(spark, ("spec", "race")) {
              builds.incrementAndGet(); "raced-artifact"
            }
          }
        })
      }
      start.countDown()
      val results = futures.map(_.get()).toSet
      assert(results === Set("raced-artifact"))
      assert(builds.get() === 1,
        "all racers must observe the one published builder result")
    } finally pool.shutdown()
  }
}
