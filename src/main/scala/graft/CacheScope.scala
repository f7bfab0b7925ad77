package graft

import org.apache.spark.sql.Dataset

import scala.collection.mutable.ArrayBuffer

/** Scoped lifecycle for builder-persisted intermediates (r20, VERDICT r19
  * #3 and the r19 advisor cache-contract note).
  *
  * Query builders persist multi-consumer intermediates (the content-dedup
  * layer's `ids`, band frames, posting arrays …) and CANNOT unpersist them
  * before returning — the returned plan references them, and releasing
  * early would defeat the reuse the persist exists for. The repo's mains
  * (Bench / Verify / BenchScale / Profile) therefore `clearCache()`
  * between queries — but an API user embedding these builders in a
  * long-lived session would accumulate one content-sized cache entry per
  * invocation with no marked release point.
  *
  * [[scoped]] makes the release mechanical: every `persistTracked()` a
  * builder executes on the current thread inside the block is registered,
  * and when the block exits (the consuming action having run inside it)
  * all registered frames are unpersisted — success or failure. Outside a
  * scope, `persistTracked()` is exactly `persist()` and the session-owner
  * convention applies unchanged, so the mains keep their behavior.
  *
  * Contract: consume the query INSIDE the block (collect/write/force) —
  * a lazy DataFrame escaping the scope recomputes its persisted
  * dependencies from scratch if forced later (correct, just uncached).
  * Scopes nest: each block releases exactly the frames its own builders
  * persisted (inner registrations do not leak to the outer buffer).
  * Thread-bound by design — builders run on the caller's thread; the
  * Spark actions they dispatch internally (eager fills, threshold
  * collects) happen before the builder returns, so registration order is
  * deterministic.
  */
object CacheScope {
  private val active = new ThreadLocal[ArrayBuffer[Dataset[_]]]

  /** Register an already-persisted frame with the enclosing scope; no-op
    * without one (the mains' clearCache-between-queries convention).
    */
  def track[T](ds: Dataset[T]): Dataset[T] = {
    val buf = active.get()
    if (buf != null) buf += ds
    ds
  }

  /** Run `body`, then unpersist every frame its builders registered on
    * this thread (non-blocking; failures during release are swallowed —
    * a dropped executor must not mask the body's result).
    */
  def scoped[T](body: => T): T = {
    val outer = active.get()
    val buf = new ArrayBuffer[Dataset[_]]
    active.set(buf)
    try body
    finally {
      if (outer == null) active.remove() else active.set(outer)
      buf.foreach { ds =>
        try ds.unpersist(blocking = false)
        catch { case _: Throwable => () }
      }
    }
  }

  /** `persist()` + scope registration in one call — the spelling every
    * builder-internal persist site uses.
    */
  implicit final class PersistTracked[T](private val ds: Dataset[T])
      extends AnyVal {
    def persistTracked(): Dataset[T] = track(ds.persist())
  }
}
