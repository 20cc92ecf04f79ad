package graft.core

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import graft.SparkSpec

/** Pins the registry's thread-scoping contract (r4 review leftover):
  * concurrent harness threads each doing build→run→release must be
  * ISOLATED — one thread's release can never destroy a broadcast or
  * cache another thread's in-flight query still reads. */
class ResourcesSpec extends SparkSpec {

  test("release() only tears down the calling thread's registrations") {
    val pool = Executors.newFixedThreadPool(2)
    try {
      val registered = new CountDownLatch(2)
      val releasedOnA = new CountDownLatch(1)
      @volatile var bcA: org.apache.spark.broadcast.Broadcast[Array[Int]] = null
      @volatile var bcB: org.apache.spark.broadcast.Broadcast[Array[Int]] = null
      @volatile var bValueAfterARelease: Seq[Int] = null

      pool.submit(new Runnable {
        def run(): Unit = {
          bcA = Resources.broadcast(spark, Array(1, 2, 3))
          registered.countDown()
          Resources.release() // thread A tears down ITS registry
          releasedOnA.countDown()
        }
      })
      pool.submit(new Runnable {
        def run(): Unit = {
          bcB = Resources.broadcast(spark, Array(4, 5, 6))
          registered.countDown()
          // wait until A has released, then prove B's broadcast survived
          assert(releasedOnA.await(30, TimeUnit.SECONDS))
          bValueAfterARelease = bcB.value.toSeq
          Resources.release() // B cleans up its own
        }
      })
      pool.shutdown()
      assert(pool.awaitTermination(60, TimeUnit.SECONDS))
      assert(registered.await(1, TimeUnit.SECONDS))
      assert(bValueAfterARelease == Seq(4, 5, 6),
        "thread B's broadcast must survive thread A's release")
      // A's broadcast was destroyed by A's release
      intercept[org.apache.spark.SparkException](bcA.value)
    } finally pool.shutdownNow()
  }

  test("concurrent register+release cycles never cross-destroy (stress)") {
    import scala.jdk.CollectionConverters._
    val pool = Executors.newFixedThreadPool(4)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    try {
      val tasks = (0 until 4).map { t =>
        new Runnable {
          def run(): Unit =
            try {
              for (i <- 0 until 10) {
                val bc = Resources.broadcast(spark, Array.fill(64)(t * 1000 + i))
                val ds = Resources.persist(
                  spark.range(t * 1000 + i, t * 1000 + i + 10))
                // the "query" reads its own resources mid-cycle
                if (bc.value(0) != t * 1000 + i) errors.add(s"t$t i$i bc corrupted")
                if (ds.count() != 10) errors.add(s"t$t i$i ds corrupted")
                Resources.release()
              }
            } catch { case e: Throwable => errors.add(s"t$t: $e") }
        }
      }
      tasks.foreach(pool.submit)
      pool.shutdown()
      assert(pool.awaitTermination(120, TimeUnit.SECONDS))
      assert(errors.isEmpty, errors.asScala.mkString("; "))
    } finally pool.shutdownNow()
  }

  test("release() is idempotent and safe on an empty registry") {
    Resources.release()
    Resources.release()
    val bc = Resources.broadcast(spark, 42)
    Resources.release()
    Resources.release() // second release after teardown: no throw
    intercept[org.apache.spark.SparkException](bc.value)
  }
}
