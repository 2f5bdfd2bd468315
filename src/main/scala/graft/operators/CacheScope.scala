package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Deterministic lifecycle for the intermediate frames operators persist.
  *
  * Dedup pipelines cache a shared projection because both sides of a
  * self-join consume it (Spark gives self-joins no subplan reuse). Caches
  * are a pure optimization — an unpersisted plan recomputes correctly — so
  * releasing is always safe; what a long-lived session must avoid is
  * accumulating cached blocks until LRU pressure. Operators register every
  * persist here; callers release after the terminal action:
  *
  * {{{
  *   implicit val scope = new CacheScope
  *   val pairs = Dedup.minHashLsh(docs, "text", "doc_id", 0.8)
  *   pairs.write.parquet(out)   // terminal action
  *   scope.release()            // drop the shingle/signature caches
  * }}}
  *
  * Callers that don't pass a scope get [[CacheScope.global]]; `Verify`,
  * `Bench`, and the test suites release it between queries.
  *
  * CONCURRENCY: [[CacheScope.global]] is shared mutable state — one
  * caller's `release()` unpersists another concurrent caller's in-flight
  * caches, silently forcing both self-join sides to recompute (correctness
  * is unaffected; the cache is a pure optimization). Any multi-threaded or
  * service use of the Dedup/Similarity operators should pass a per-pipeline
  * `new CacheScope` implicitly and release it when that pipeline's terminal
  * action completes.
  */
final class CacheScope {
  private val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` (MEMORY_AND_DISK — spills rather than OOMs) and track it
    * for release. */
  private[graft] def cache(df: DataFrame): DataFrame = synchronized {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    frames += p
    p
  }

  /** Unpersist every frame this scope cached. Idempotent. Non-blocking by
    * default; pass `blocking = true` when the caller needs the blocks gone
    * before its next query starts (e.g. benchmarking — async eviction
    * otherwise steals cycles from the next timed window). */
  def release(blocking: Boolean = false): Unit = synchronized {
    frames.foreach(_.unpersist(blocking))
    frames.clear()
  }
}

object CacheScope {
  /** Shared default for callers that don't manage cache lifecycles. */
  val global: CacheScope = new CacheScope
}
