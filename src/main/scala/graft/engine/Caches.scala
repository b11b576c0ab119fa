package graft.engine

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Dataset

/** Registry of plan-internal persisted tables.
  *
  * Several operators persist an intermediate read more than once by the
  * plan they return (RangeRank's sorted table, Dedup's shingle /
  * fingerprint / line tables). Those persists cannot self-release: the
  * returned plan is lazy, so the cached table is only consumed when the
  * CALLER runs an action. Every such site registers here, and
  * [[release]] unpersists the lot — a bench/driver process never needs
  * to call it (process exit reclaims everything), a long-lived session
  * calls it between bursts of work. Releasing is always safe: an
  * unpersisted plan recomputes instead of reading cache.
  */
object Caches {
  private val live = new ConcurrentLinkedQueue[Dataset[_]]()

  /** Register a persisted intermediate for later [[release]]. */
  private[graft] def track[T <: Dataset[_]](df: T): T = { live.add(df); df }

  /** Unpersist every tracked intermediate and forget it. */
  def release(): Unit = {
    var d = live.poll()
    while (d != null) { d.unpersist(blocking = false); d = live.poll() }
  }
}
