package graft

/** Per-process scratch roots under /tmp with self-cleaning lifecycle —
  * shared by every operator that needs local working directories (the
  * streaming file-source symlink farm, q119's persisted signature index).
  *
  * Each root is `/tmp/<prefix>_<pid>`: pid-suffixed so concurrent JVMs
  * (sbt forks one per test/bench run) can never delete a directory out
  * from under each other's running queries. Two-sided cleanup:
  *  - a shutdown hook removes this JVM's root on normal exit;
  *  - on first use, roots left by DEAD processes (SIGKILL/crash — their
  *    hook never ran, and no later run would reuse the pid-unique name)
  *    are best-effort swept after a liveness check.
  */
object TempRoots {
  private val pid = ProcessHandle.current().pid()
  private val registered = scala.collection.mutable.Set[String]()

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    val walk = java.nio.file.Files.walk(p)
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala.toSeq
        .sortBy(-_.getNameCount) // children before parents
        .foreach(q => java.nio.file.Files.deleteIfExists(q))
    } finally walk.close()
  }

  /** The calling JVM's root for `prefix`, created on first call; sweeps
    * dead siblings and registers the exit hook once per prefix. */
  def root(prefix: String): java.nio.file.Path = rootIn("/tmp", prefix)

  /** Like [[root]] but on the RAM-backed filesystem when one is writable
    * (/dev/shm on Linux) — for EPHEMERAL artifacts whose fsyncs dominate
    * their consumer's wall time, most of all streaming checkpoints: a
    * micro-batch's offset-WAL + per-partition state-store commits are
    * small synchronous writes, and on ext4 they cost more than the
    * batch's actual work (measured ~0.9 s of a 1.0 s single-batch drain
    * at sf0.1). Single-node test harness only — a cluster checkpoints to
    * HDFS/S3 for fault tolerance, which is exactly the durability a
    * local memory-sink drain does not need. Same pid-scoped lifecycle +
    * dead-sibling sweep as [[root]]. */
  def fastRoot(prefix: String): java.nio.file.Path = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val base =
      if (java.nio.file.Files.isDirectory(shm) &&
        java.nio.file.Files.isWritable(shm)) "/dev/shm" else "/tmp"
    rootIn(base, prefix)
  }

  private def rootIn(base: String, prefix: String): java.nio.file.Path =
    synchronized {
    require(prefix.nonEmpty && prefix.forall(c => c.isLetterOrDigit || c == '_'),
      s"prefix must be a bare dir-name fragment, got '$prefix'")
    val mine = java.nio.file.Paths.get(s"$base/${prefix}_$pid")
    if (registered.add(s"$base/$prefix")) {
      try {
        val ls = java.nio.file.Files.list(mine.getParent)
        try {
          import scala.jdk.CollectionConverters._
          ls.iterator().asScala
            .filter(_.getFileName.toString.startsWith(s"${prefix}_"))
            .filter { p =>
              val owner = p.getFileName.toString.stripPrefix(s"${prefix}_")
              owner.nonEmpty && owner.forall(_.isDigit) &&
                scala.util.Try(!ProcessHandle.of(owner.toLong).isPresent)
                  .getOrElse(false) // pid reuse at worst defers the sweep
            }
            .toSeq.foreach(dead => try deleteRecursively(dead)
            catch { case _: Exception => () })
        } finally ls.close()
      } catch { case _: Exception => () } // sweep is best-effort only
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        try deleteRecursively(mine)
        catch { case _: Exception => () } // best-effort cleanup only
      ))
    }
    java.nio.file.Files.createDirectories(mine)
    mine
  }

  /** A per-sf-dir subdirectory of `root(prefix)` (sanitized path key). */
  def forDir(prefix: String, dir: String): java.nio.file.Path =
    root(prefix).resolve(dir.replaceAll("[^A-Za-z0-9]", "_"))

  /** [[forDir]] cleared of any previous run's content — for outputs that
    * append across micro-batches within one run but must start empty on
    * the next (bench runs every query twice). */
  def freshForDir(prefix: String, dir: String): java.nio.file.Path =
    fresh(forDir(prefix, dir))

  /** [[freshForDir]] on the RAM-backed [[fastRoot]] — ephemeral streaming
    * checkpoints. */
  def freshFastForDir(prefix: String, dir: String): java.nio.file.Path =
    fresh(fastRoot(prefix).resolve(dir.replaceAll("[^A-Za-z0-9]", "_")))

  private def fresh(p: java.nio.file.Path): java.nio.file.Path = {
    if (java.nio.file.Files.exists(p)) deleteRecursively(p)
    java.nio.file.Files.createDirectories(p)
    p
  }
}
