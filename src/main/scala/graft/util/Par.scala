package graft.util

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Run INDEPENDENT Spark action legs of one query concurrently
  * (optimization guide §2.6 "overlap independent jobs"): Spark's
  * scheduler happily runs several jobs at once inside one application —
  * a contrast query that measures two pipelines sequentially leaves the
  * cluster idle through every job tail, while submitting both lets the
  * second leg's tasks back-fill executors the first leg's stragglers
  * freed. Results and determinism are untouched: each leg is the same
  * lazily-defined computation, only the SUBMISSION overlaps.
  *
  * A tiny dedicated pool (not the global EC): Spark driver threads may
  * block in `collect`, and the legs must start even when the caller's
  * pool is saturated. Threads are daemon and idle out, and failures
  * propagate to the caller exactly as in the sequential form (Await
  * rethrows the first leg's exception).
  */
object Par {

  private lazy val ec: ExecutionContext = ExecutionContext.fromExecutorService(
    Executors.newCachedThreadPool(r => {
      val t = new Thread(r, "graft-par")
      t.setDaemon(true)
      t
    }))

  def par2[A, B](a: => A, b: => B): (A, B) = {
    val fb = Future(b)(ec)
    val ra = a
    (ra, Await.result(fb, Duration.Inf))
  }

  def par3[A, B, C](a: => A, b: => B, c: => C): (A, B, C) = {
    val fb = Future(b)(ec)
    val fc = Future(c)(ec)
    val ra = a
    (ra, Await.result(fb, Duration.Inf), Await.result(fc, Duration.Inf))
  }
}
