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
  lazy val base: String = {
    val root = sys.props.getOrElse("graft.tmp.dir",
      new java.io.File("target/qtmp").getAbsolutePath)
    val d = new java.io.File(root,
      java.util.UUID.randomUUID.toString.take(8))
    d.mkdirs()
    d.getAbsolutePath
  }

  /** Stable within the JVM — fine for overwrite-mode batch sinks. */
  def path(name: String): String = s"$base/$name"

  private val ctr = new AtomicInteger(0)

  /** Unique per call — for append-mode streaming sinks/checkpoints. */
  def fresh(name: String): String = s"$base/$name-${ctr.incrementAndGet()}"
}
