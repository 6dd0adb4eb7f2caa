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

  /** Register an already-persisted frame; returns it for chaining. */
  def track(df: DataFrame): DataFrame = synchronized { frames += df; df }

  /** Number of tracked handles (may exceed distinct cache entries). */
  def size: Int = synchronized(frames.size)

  /** Unpersist every tracked frame and clear the registry. */
  def release(): Unit = synchronized {
    frames.foreach(_.unpersist(false))
    frames.clear()
  }
}
