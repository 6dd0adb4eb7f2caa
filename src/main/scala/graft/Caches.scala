package graft

import org.apache.spark.sql.DataFrame

/** Lifecycle registry for the library's internally-persisted tables
  * (dedup shingle sets, the PPJoin order index, the shared simhash
  * signature table). Those persists are deliberate — each is the
  * in-session analogue of a materialized corpus artifact every consumer
  * reads at scale — but a long-running session processing corpus after
  * corpus would otherwise accumulate one cache entry per distinct input
  * plan with no way to let go. Every internal `.persist` registers its
  * handle here; `Caches.release()` unpersists and forgets them all.
  *
  * Spark's CacheManager dedupes identical plans, so several tracked
  * handles may point at one physical cache entry; `unpersist` is
  * idempotent and blocking=false, making release cheap and safe to call
  * between pipeline runs (Bench calls it between queries).
  */
object Caches {
  private val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  private val built =
    scala.collection.mutable.HashSet.empty[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]
  private val inFlight = scala.collection.mutable.HashMap
    .empty[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      java.util.concurrent.CountDownLatch]

  /** Register an already-persisted frame; returns it for chaining. */
  def track(df: DataFrame): DataFrame = synchronized { frames += df; df }

  /** Register AND eagerly build a persisted frame, once per distinct
    * plan per release() epoch. Lazy cache builds race when a query's
    * broadcast-exchange futures and its main job all hit the cold entry
    * concurrently: the per-block locks serialize the build but every
    * waiting task bills lock-wait as run time, and the first consumer's
    * partitioning decides the build's width (observed as multi-second
    * lock-wait stages and an occasional 1-task build in the dedup
    * heads). One explicit count() materializes the artifact at ITS OWN
    * width before any consumer plans against it — the in-session
    * analogue of writing the corpus artifact before readers start. */
  def materialize(df: DataFrame): DataFrame = {
    val key = df.queryExecution.logical.canonicalized
    // Concurrent callers with the same plan must WAIT for the in-flight
    // build, not sail past it (returning early re-opens the lazy-build
    // race this method exists to close); and a failed count() must not
    // mark the key built, or the eager build is skipped for the epoch.
    val (latch, isBuilder) = synchronized {
      frames += df
      if (built.contains(key)) (null, false)
      else inFlight.get(key) match {
        case Some(l) => (l, false)
        case None =>
          val l = new java.util.concurrent.CountDownLatch(1)
          inFlight(key) = l
          (l, true)
      }
    }
    if (isBuilder) {
      try {
        df.count()
        synchronized { built += key }
      } finally {
        synchronized { inFlight.remove(key) }
        latch.countDown()
      }
    } else if (latch != null) latch.await()
    df
  }

  /** Number of tracked handles (may exceed distinct cache entries). */
  def size: Int = synchronized(frames.size)

  /** Number of DISTINCT artifacts eagerly built this release() epoch —
    * one per canonicalized plan. The cache-reuse invariant specs assert
    * on this: if two pipelines that should share one persisted artifact
    * drift to different plans, the build count exposes it. */
  def builtCount: Int = synchronized(built.size)

  /** Unpersist every tracked frame and clear the registry. In-flight
    * build markers are left alone: their builders' finally blocks remove
    * them and release their waiters regardless of epoch. */
  def release(): Unit = synchronized {
    frames.foreach(_.unpersist(false))
    frames.clear()
    built.clear()
  }
}
