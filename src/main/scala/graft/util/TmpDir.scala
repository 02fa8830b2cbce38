package graft.util

import java.util.concurrent.atomic.AtomicInteger

/** Per-JVM unique scratch base for query-demo sinks. Round 1 used fixed
  * `target/qtmp/...` paths, so concurrent Verify/Bench/test JVMs could
  * clobber each other's sink output mid-read; every JVM now gets its own
  * UUID-suffixed base (override the root with `-Dgraft.tmp.dir=`), and
  * [[fresh]] additionally hands out a never-reused path for sinks that
  * must not see a prior run's files (streaming append sinks).
  */
object TmpDir {
  private def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** Default scratch root: RAM-backed `/dev/shm` when present (Linux),
    * else `target/qtmp`. Everything under TmpDir is ephemeral BY
    * CONSTRUCTION — demo sinks and stream checkpoints deleted at JVM
    * exit, never a durability surface (production streams pass a real
    * checkpoint root through `writeStream.option("checkpointLocation")`
    * on durable storage). The choice matters because a streaming
    * microbatch commit fsyncs its offset/commit/state-store logs: on
    * spinning/virtual disks that fsync dominates a small query's cost
    * (measured ~2× on the heavy streaming demos), on tmpfs it is free.
    */
  private def defaultRoot: String = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite)
      new java.io.File(shm, "graft-qtmp").getAbsolutePath
    else new java.io.File("target/qtmp").getAbsolutePath
  }

  lazy val base: String = {
    val root = sys.props.getOrElse("graft.tmp.dir", defaultRoot)
    val rootF = new java.io.File(root)
    // Repeated Bench/Verify/test JVMs would otherwise accumulate sink
    // output without bound: delete our own base on exit, and sweep
    // siblings a crashed JVM left behind. The sweep matches ONLY our
    // own 8-hex-char base names — the root is user-configurable and may
    // be a shared scratch dir holding unrelated data — and is age-gated
    // so a concurrently running JVM's live base is never touched.
    val staleMs = 6L * 3600 * 1000
    val now = System.currentTimeMillis()
    val stale = rootF.listFiles()
    if (stale != null)
      stale.filter(f => f.isDirectory &&
          f.getName.matches("[0-9a-f]{8}") &&
          now - f.lastModified() > staleMs)
        .foreach(deleteRecursively)
    val d = new java.io.File(rootF,
      java.util.UUID.randomUUID.toString.take(8))
    d.mkdirs()
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try deleteRecursively(d) catch { case _: Throwable => () }))
    d.getAbsolutePath
  }

  /** Keep the base's mtime current so a long-running JVM that created
    * all its sinks early is never mistaken for a crashed one by another
    * JVM's age-gated sweep.
    */
  private def touched(p: String): String = {
    new java.io.File(base).setLastModified(System.currentTimeMillis()): Unit
    p
  }

  /** Stable within the JVM — fine for overwrite-mode batch sinks. */
  def path(name: String): String = touched(s"$base/$name")

  private val ctr = new AtomicInteger(0)

  /** Unique per call — for append-mode streaming sinks/checkpoints. */
  def fresh(name: String): String =
    touched(s"$base/$name-${ctr.incrementAndGet()}")
}
