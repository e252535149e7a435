package graft.analytics

import graft.SparkSpec

/** Scratch-dir lifecycle for the container queries: a long-lived driver
  * (a bench pass re-runs each query many times) must not accrete one
  * shard layout — or one JVM shutdown hook — per invocation. The registry
  * contract: same-prefix re-runs eagerly reclaim the PREVIOUS layout;
  * exit cleanup is ONE shared hook over the registry. */
class ScratchDirSpec extends SparkSpec {

  test("same-prefix re-run reclaims the previous invocation's layout") {
    val d1 = PrepQueries.scratchTempDir("graft_scratchspec_")
    val marker = java.nio.file.Paths.get(d1, "layout.bin")
    java.nio.file.Files.write(marker, Array[Byte](1, 2, 3))
    val d2 = PrepQueries.scratchTempDir("graft_scratchspec_")
    assert(d1 != d2)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(d1)),
      s"prior scratch layout must be reclaimed on re-run: $d1 still exists")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(d2)))
    // different prefixes never reclaim each other
    val other = PrepQueries.scratchTempDir("graft_scratchspec_other_")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(d2)),
      "a different prefix must not reclaim this one's live dir")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(other)))
  }

  test("repeated invocations register ONE shutdown hook, not one per call") {
    // the hook set is JVM-global: count the delta across N invocations.
    // (ApplicationShutdownHooks is the JDK's registry for
    // Runtime.addShutdownHook threads.)
    def hookCount(): Int = {
      val cls = Class.forName("java.lang.ApplicationShutdownHooks")
      val f = cls.getDeclaredField("hooks")
      f.setAccessible(true)
      f.get(null).asInstanceOf[java.util.Map[Thread, Thread]].size()
    }
    PrepQueries.scratchTempDir("graft_hookspec_") // ensure the lazy hook exists
    val before = hookCount()
    (1 to 5).foreach(i => PrepQueries.scratchTempDir(s"graft_hookspec_$i"))
    val after = hookCount()
    assert(after == before,
      s"scratchTempDir must not add hooks per invocation: $before -> $after")
  }
}
