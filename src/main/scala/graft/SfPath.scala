package graft

/** THE filesystem-safe key for an sfDir — the one sanitizer every per-sfDir
  * artifact path (IVF/PQ/SQ8/LSH exports, sorted/scrubbed lakes, probe
  * artifacts) derives from. Keyed-oracle correctness rests on "the build
  * writes where the render reads": with a single definition, adjusting the
  * sanitization (or fixing a collision) cannot silently split the two
  * (review r11 — the regex had grown eight textually-identical copies). */
object SfPath {

  /** Raw inputs seen per safe name in this JVM — the collision guard's
    * evidence (ADVICE r11: two distinct raw sfDirs that sanitize to one safe
    * name would silently share every keyed artifact directory, so the second
    * build overwrites the first caller's artifacts while both memo entries
    * stay live). */
  private val seen = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Collision identity: path-normalized, so two SPELLINGS of one directory
    * (`//root/x`, `/root/./x`, a relative form) never trip the guard —
    * only genuinely different directories colliding on one safe name do
    * (review r12: the raw-string compare threw a spurious ambiguity for
    * equivalent spellings). Falls back to the raw string for inputs the
    * path API rejects. */
  private def identity(sfDir: String): String =
    try java.nio.file.Paths.get(sfDir).toAbsolutePath.normalize.toString
    catch { case _: java.nio.file.InvalidPathException => sfDir }

  def safe(sfDir: String): String = {
    val s = sfDir.replaceAll("^[^A-Za-z0-9.]+", "").replaceAll("[^A-Za-z0-9.]", "_")
    val id = identity(sfDir)
    val prior = seen.putIfAbsent(s, id)
    prior.foreach { p =>
      if (p != id) throw new IllegalArgumentException(
        s"ambiguous artifact key: sfDirs '$p' and '$id' both sanitize to " +
          s"'$s' — their keyed artifact paths would collide; disambiguate " +
          "the directory names (fail-loud convention for ambiguous artifacts)")
    }
    s
  }
}
