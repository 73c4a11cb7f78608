package graft.sources

import scala.collection.concurrent.TrieMap

/** Shared memo posture for the once-per-corpus-version lake artifacts
  * ([[VerifiedPairs]], [[FrameSketchLake]], [[IncrementalHistory]] —
  * ADVICE r16): `TrieMap.getOrElseUpdate` evaluates its builder OUTSIDE any
  * lock, so two concurrent first readers could both run the overwrite
  * parquet write into the same artifact directory and interleave to a
  * corrupt table. Double-checked per-key synchronization makes the build
  * at-most-once per JVM (the lock is the interned key string — keys are a
  * handful of `(artifact, sfDir)` pairs, so interning is bounded).
  *
  * In-JVM staleness is a DECLARED assumption, not a defect: the memo keys
  * on `(artifact, sfDir)` only, so a `documents.parquet` regenerated within
  * the same JVM would serve a stale artifact — the production analog is a
  * corpus-version roll, which invalidates via each object's `reset()` hook
  * (the artifact-rebuild drill exercises exactly that). */
private[sources] object ArtifactMemo {
  def getOrBuild(cache: TrieMap[String, String], key: String)
      (build: => String): String =
    cache.get(key) match {
      case Some(d) => d
      case None => key.intern.synchronized {
        cache.getOrElseUpdate(key, build)
      }
    }
}
