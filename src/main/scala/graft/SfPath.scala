package graft

/** THE filesystem-safe key for an sfDir — the one sanitizer every per-sfDir
  * artifact path (IVF/PQ/SQ8/LSH exports, sorted/scrubbed lakes, probe
  * artifacts) derives from. Keyed-oracle correctness rests on "the build
  * writes where the render reads": with a single definition, adjusting the
  * sanitization (or fixing a collision) cannot silently split the two
  * (review r11 — the regex had grown eight textually-identical copies). */
object SfPath {
  def safe(sfDir: String): String =
    sfDir.replaceAll("^[^A-Za-z0-9.]+", "").replaceAll("[^A-Za-z0-9.]", "_")
}
