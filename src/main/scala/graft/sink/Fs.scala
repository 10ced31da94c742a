package graft.sink

import org.apache.spark.sql.SparkSession

/** The storage layer's filesystem seam — every existence probe, atomic
  * claim, listing, and directory swap the persisted indexes and the
  * snapshot store perform goes through the path's OWN Hadoop
  * [[org.apache.hadoop.fs.FileSystem]], resolved from the session's
  * Hadoop configuration.
  *
  * Why not `java.nio.file`: a `Files.exists` probe sees only the LOCAL
  * filesystem, so against a cluster root (`hdfs://…`, `s3a://…`) it
  * always answers false — a populated tombstone store would silently
  * read as empty and every delete would be ignored, a correctness bug
  * that never fires in local testing. Routing through the Hadoop
  * FileSystem makes the same one-line probe scheme-correct everywhere.
  * It also replaces the try/catch-AnalysisException "no manifest yet"
  * probes, whose failed reads spam benign PATH_NOT_FOUND ERROR stacks
  * through the ExecutionListenerBus into otherwise-clean logs.
  *
  * [[claim]] is the one-winner primitive the snapshot store's
  * concurrent version mint builds on (q427): rename-if-absent. HDFS
  * rename is atomic at the NameNode but follows mv semantics when the
  * destination exists (moves src INTO it), so the destination check and
  * the rename execute under a JVM-wide lock — within one driver the
  * claim is exactly-one-winner; across drivers HDFS's atomic rename
  * arbitrates (object stores without atomic rename need their own
  * committer, as every lakehouse documents). The claimed payload is a
  * fully-written directory, so the winner's destination is complete the
  * instant the rename lands — never a partially-visible commit.
  */
object Fs {

  private val claimLock = new Object

  private def fsp(s: SparkSession, path: String)
      : (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(s.sparkContext.hadoopConfiguration), p)
  }

  def exists(s: SparkSession, path: String): Boolean = {
    val (fs, p) = fsp(s, path)
    fs.exists(p)
  }

  /** Rename-if-absent: true iff THIS call moved `src` into `dst`.
    * False when another claimant already owns `dst` — the caller's cue
    * to retry with the next slot. See the object docstring for the
    * atomicity layering. */
  def claim(s: SparkSession, src: String, dst: String): Boolean =
    claim(s, src, dst, guard = None)

  /** [[claim]] with a precondition evaluated under the SAME lock as
    * the rename: the claim succeeds only if `guard` still exists at
    * claim time. This is how a commit claim and a concurrent vacuum's
    * delete serialize within one driver (the snapshot store's
    * expire-vs-live-writer seam): the vacuum deletes under
    * [[locked]], so the guard check and the rename are atomic with
    * respect to it — a vacuumed data slot can never gain a commit
    * row. Throws when the guard is gone (a loud abort, never a
    * silent half-commit). */
  def claim(s: SparkSession, src: String, dst: String,
      guard: Option[String]): Boolean =
    claimLock.synchronized {
      guard.foreach { g =>
        require(exists(s, g),
          s"claim guard $g vanished (vacuumed mid-commit?) — aborting")
      }
      val (fs, d) = fsp(s, dst)
      if (fs.exists(d)) false
      else {
        val parent = d.getParent
        if (parent != null) fs.mkdirs(parent)
        fs.rename(new org.apache.hadoop.fs.Path(src), d)
      }
    }

  /** Run `f` under the claim lock — pairs a maintenance delete with
    * the claims it must serialize against (same-JVM guarantee; across
    * drivers the maintenance-window caveat on expireVersions holds). */
  def locked[T](f: => T): T = claimLock.synchronized(f)

  /** Unconditional move (the compaction swap — destination known
    * absent). */
  def move(s: SparkSession, src: String, dst: String): Unit = {
    val (fs, d) = fsp(s, dst)
    require(fs.rename(new org.apache.hadoop.fs.Path(src), d),
      s"rename $src -> $dst failed")
  }

  /** Recursive delete; absent path is a no-op (idempotent GC). */
  def delete(s: SparkSession, path: String): Unit = {
    val (fs, p) = fsp(s, path)
    fs.delete(p, true): Unit
  }

  /** Names of the immediate child DIRECTORIES of `path` (empty when the
    * path is absent) — the batch-subdirectory listing the index
    * compactions fold. */
  def listDirNames(s: SparkSession, path: String): Seq[String] = {
    val (fs, p) = fsp(s, path)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).sorted
  }

  /** Names of ALL immediate children of `path` (files and directories;
    * empty when absent) — includes underscore-prefixed entries the
    * parquet reader hides, which is how commit markers carried inside
    * a data directory are enumerated. */
  def listNames(s: SparkSession, path: String): Seq[String] = {
    val (fs, p) = fsp(s, path)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.map(_.getPath.getName).sorted
  }

  /** Create an empty marker file (parents included). */
  def touch(s: SparkSession, path: String): Unit = {
    val (fs, p) = fsp(s, path)
    fs.create(p, true).close()
  }

  /** Count of files under `path` (recursive) whose name ends with
    * `suffix` — the physical-file audit the compaction queries grade. */
  def countFiles(s: SparkSession, path: String, suffix: String): Long = {
    val (fs, p) = fsp(s, path)
    if (!fs.exists(p)) 0L
    else {
      val it = fs.listFiles(p, true)
      var n = 0L
      while (it.hasNext) if (it.next().getPath.getName.endsWith(suffix)) n += 1
      n
    }
  }
}
