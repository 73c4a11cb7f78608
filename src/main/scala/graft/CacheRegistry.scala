package graft

import org.apache.spark.sql.Dataset

/** Session-wide registry of operator-persisted DataFrames — the cache
  * lifecycle the round-4 review flagged: eight operators persist shared
  * subtrees (shingle postings, LSH bands, BM25 staging, pipeline stage
  * outputs) and, without a release point, a long suite accumulates executor
  * storage unboundedly; Spark's LRU eviction then churns exactly when memory
  * is tightest, taxing even queries that cache nothing.
  *
  * Contract: operators call [[persist]] instead of `Dataset.persist()`;
  * harnesses (Bench / Verify / a long-lived [[GraftEngine]] session) call
  * [[release]] at family boundaries — after the queries sharing a subtree
  * have run — so each cached table lives exactly as long as its reuse
  * window. Registering the same analyzed plan twice is safe (the second
  * `persist` is a no-op on an already-cached plan) and so is a double
  * `unpersist`. Production pipelines replace persist with write-then-read
  * to the lake; this registry is the in-session equivalent with the same
  * bounded lifetime.
  */
object CacheRegistry {

  private val registered = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]

  /** Persist (MEMORY_AND_DISK) and track for the next [[release]]. */
  def persist[T](ds: Dataset[T]): Dataset[T] = synchronized {
    ds.persist()
    registered += ds
    ds
  }

  /** Unpersist everything registered since the last release (non-blocking —
    * block eviction proceeds in the background). No-op when empty. */
  def release(): Unit = synchronized {
    registered.foreach(_.unpersist(blocking = false))
    registered.clear()
  }

  /** Number of currently-tracked cache entries (tests / introspection). */
  def trackedCount: Int = synchronized(registered.size)
}
