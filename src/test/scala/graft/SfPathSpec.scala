package graft

import org.scalatest.funsuite.AnyFunSuite

/** ADVICE r11: [[SfPath.safe]] is the single sanitizer every keyed artifact
  * path derives from, so two DISTINCT raw sfDirs collapsing to one safe name
  * would silently share (and overwrite) each other's artifact directories.
  * The guard turns that silent collision into the repo's fail-loud
  * convention for ambiguous artifacts. */
class SfPathSpec extends AnyFunSuite {

  test("safe is stable for one raw input and strips the leading separator") {
    val s1 = SfPath.safe("/tmp/x/sfpathspec-a0.01")
    assert(s1 == "tmp_x_sfpathspec_a0.01") // no leading _, dots preserved
    assert(SfPath.safe("/tmp/x/sfpathspec-a0.01") == s1) // re-entry is fine
  }

  test("two spellings of the SAME directory never trip the guard") {
    // review r12: the raw-string compare threw a spurious ambiguity for
    // equivalent spellings; the collision identity is the normalized path.
    // '//tmp/...' collides on the safe name with '/tmp/...' but is the same
    // directory — it must return the same key, not throw.
    val s1 = SfPath.safe("/tmp/sfpathspec/samedir0.1")
    assert(SfPath.safe("//tmp/sfpathspec/samedir0.1") == s1)
  }

  test("two distinct raws mapping to one safe name fail loudly") {
    SfPath.safe("/tmp/sfpathspec/collide0.1")
    val e = intercept[IllegalArgumentException](
      SfPath.safe("_tmp_sfpathspec_collide0.1"))
    assert(e.getMessage.contains("collide"))
  }

  test("collisions across JVMs fail loudly via the on-disk registry") {
    // ADVICE r12: the in-JVM TrieMap cannot see a collision from a SEPARATE
    // process or an earlier run. Simulate the other process by pre-seeding
    // its marker file, then call safe() with a DIFFERENT directory that
    // sanitizes to the same name — the registry, not the map, must catch it.
    import java.nio.file.{Files, Paths}
    import java.nio.charset.StandardCharsets.UTF_8
    val registry = Paths.get("target", ".sfpath-keys")
    Files.createDirectories(registry)
    val marker = registry.resolve("tmp_sfpathspec_xproc0.1")
    Files.write(marker, "/claimed/by/another/process".getBytes(UTF_8))
    try {
      val e = intercept[IllegalArgumentException](
        SfPath.safe("/tmp/sfpathspec/xproc0.1"))
      assert(e.getMessage.contains("collide"))
    } finally Files.deleteIfExists(marker)
  }

  test("safe() persists its identity marker for future processes") {
    import java.nio.file.{Files, Paths}
    import java.nio.charset.StandardCharsets.UTF_8
    val s = SfPath.safe("/tmp/sfpathspec/persist0.1")
    val marker = Paths.get("target", ".sfpath-keys").resolve(s)
    assert(Files.exists(marker))
    assert(new String(Files.readAllBytes(marker), UTF_8).trim ==
      "/tmp/sfpathspec/persist0.1")
  }
}
