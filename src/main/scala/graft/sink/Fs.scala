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
  * concurrent version mint builds on (q427): rename-if-absent through
  * [[org.apache.hadoop.fs.FileContext]], whose no-overwrite rename
  * FAILS atomically when the destination exists — unlike
  * `FileSystem.rename`, whose mv semantics move src INTO an existing
  * destination and report success, which would let two drivers nest
  * one writer's data inside the other's version directory. With the
  * FileContext primitive the one-winner property holds ACROSS drivers
  * on any filesystem with atomic rename (HDFS; object stores without
  * it need their own committer, as every lakehouse documents). The
  * JVM-wide lock remains only to pair a claim's `guard` precondition
  * with the vacuum's deletes within one driver; cross-driver
  * commit-vs-vacuum serializes through [[withLease]]. The claimed
  * payload is a fully-written directory, so the winner's destination
  * is complete the instant the rename lands — never a
  * partially-visible commit.
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
      claimRaw(s, src, dst)
    }

  /** The unlocked atomic primitive under [[claim]] — exposed for the
    * cross-driver race spec (two threads sharing no lock model two
    * drivers; the filesystem alone must arbitrate). Per scheme:
    *
    *  - `file://`: the JDK's `Files.move` — its final arbiter is
    *    rename(2), which atomically refuses a non-empty existing
    *    destination (ENOTEMPTY) even when two racers pass every
    *    userspace pre-check simultaneously. Hadoop's own local
    *    rename paths (FileSystem AND FileContext/RawLocalFs) are
    *    check-then-act and can report two winners under a
    *    photo-finish — measured, not theorized: the FsSpec race
    *    caught FileContext double-winning on tmpfs.
    *  - everything else: FileContext's no-overwrite rename, which
    *    HDFS executes atomically at the NameNode (object stores
    *    without atomic rename need their own committer, as every
    *    lakehouse documents).
    *
    * Claimed payloads are always non-empty directories — rename(2)
    * silently REPLACES an empty destination directory, so an
    * empty-dir payload would weaken the one-winner property. */
  private[graft] def claimRaw(s: SparkSession, src: String,
      dst: String): Boolean = {
    val (fs, d) = fsp(s, dst)
    val parent = d.getParent
    if (parent != null) fs.mkdirs(parent)
    if (fs.getScheme == "file") {
      val sp = java.nio.file.Paths.get(
        new org.apache.hadoop.fs.Path(src).toUri.getPath)
      val dp = java.nio.file.Paths.get(d.toUri.getPath)
      try { java.nio.file.Files.move(sp, dp); true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: java.nio.file.DirectoryNotEmptyException => false
        case e: java.io.IOException =>
          // rename(2) lost a photo-finish (ENOTEMPTY can surface as a
          // generic FileSystemException): losing is only legitimate
          // when the slot is now owned — anything else is real
          if (fs.exists(d)) false else throw e
      }
    } else {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        fs.getUri, s.sparkContext.hadoopConfiguration)
      try {
        fc.rename(new org.apache.hadoop.fs.Path(src), d)
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: org.apache.hadoop.fs.ParentNotDirectoryException => false
        case e: java.io.IOException =>
          if (fs.exists(d)) false else throw e
      }
    }
  }

  /** Run `f` under the claim lock — pairs a maintenance delete with
    * the claims it must serialize against (same-JVM guarantee; across
    * drivers, maintenance takes [[withLease]]). */
  def locked[T](f: => T): T = claimLock.synchronized(f)

  /** CROSS-DRIVER mutual exclusion: run `f` while holding a lease
    * DIRECTORY acquired with the same one-winner primitive as
    * [[claimRaw]] — a privately-staged non-empty directory renamed
    * into the lease path with no-overwrite semantics (HDFS serializes
    * the rename at the NameNode; the local filesystem's final arbiter
    * is rename(2), which refuses a non-empty existing destination).
    * NOT `create(overwrite=false)`: RawLocalFileSystem implements that
    * as a non-atomic exists-check-then-open, so two local "drivers"
    * can both win it — the rename claim is the primitive that is
    * atomic everywhere this engine's claims already rely on. A second
    * driver's acquire spins until the holder releases, so
    * commit-vs-vacuum serializes across drivers, not just across this
    * JVM's threads. A crashed holder's stale lease is broken after
    * `staleMs` (the breaker deletes and retries the claim rather than
    * assuming ownership). Object stores without atomic rename keep
    * the documented maintenance-window caveat instead.
    *
    * `f` MUST complete well under `staleMs`: past it, a breaker may
    * legitimately take the lease over. Ownership is carried by a
    * holder TOKEN file inside the lease directory. The release is a
    * one-winner CAPTURE, never a blind delete: the holder renames the
    * lease to a private path, verifies the captured directory carries
    * its OWN token, and only then deletes it — a capture that turns
    * out to hold a SUCCESSOR's lease (this holder overstayed, was
    * broken, and a successor claimed between the ownership check and
    * the capture) is put straight back, so an overstayed holder can
    * never destroy its successor's live lease (the old
    * listNames-then-delete was check-then-act and kept exactly that
    * window). The lease's age is refreshed at every claim ATTEMPT —
    * not just at staging time — so a claimant that spun through a
    * long contention period still acquires a lease born at age ~0
    * (unrefreshed, a lease could be breakable the instant it landed).
    * The breaker re-checks the renamed-aside lease's age before
    * discarding it and returns a fresh lease it raced by mistake,
    * retrying the put-back briefly if a third claim landed in the
    * window. Residual physical race (unavoidable with rename-only
    * primitives): a breaker that measures a stale age can capture a
    * lease released-and-reclaimed in the same instant — kept harmless
    * in practice by the f ≪ staleMs contract above. */
  def withLease[T](s: SparkSession, leasePath: String,
      staleMs: Long = 600000L, timeoutMs: Long = 120000L)(f: => T): T = {
    val (fs, p) = fsp(s, leasePath)
    val tok = java.util.UUID.randomUUID().toString.take(12)
    val staged = new org.apache.hadoop.fs.Path(
      p.getParent, s"_lease_staging_$tok")
    fs.mkdirs(staged)
    fs.create(new org.apache.hadoop.fs.Path(staged, s"holder_$tok"), true)
      .close()
    // refresh the staged dir's mtime so the lease, whenever its claim
    // finally lands, is born at age ~0 (setTimes where supported; a
    // marker-file rotation updates the dir mtime everywhere else)
    def refreshAge(): Unit =
      try fs.setTimes(staged, System.currentTimeMillis(), -1L)
      catch {
        case _: Exception =>
          val m = new org.apache.hadoop.fs.Path(staged, s"ts_$tok")
          fs.delete(m, false)
          fs.create(m, true).close()
      }
    val deadline = System.currentTimeMillis() + timeoutMs
    try {
      var held = false
      while (!held) {
        refreshAge()
        held = claimRaw(s, staged.toString, leasePath)
        if (!held) {
          // lease taken: break it if stale, else wait and retry. The
          // break itself must be ONE-WINNER: a bare delete would let a
          // second breaker queue behind the first and delete the
          // first's freshly-ACQUIRED live lease (two holders — the
          // exact race the lease prevents). Renaming the stale lease
          // aside is arbitrated like every other claim: exactly one
          // breaker's rename succeeds, the loser's throws on the
          // vanished source and simply retries.
          val age = modTime(s, leasePath) match {
            case -1L => -1L
            case t => System.currentTimeMillis() - t
          }
          if (age > staleMs) {
            val aside = new org.apache.hadoop.fs.Path(p.getParent,
              s"_lease_broken_$tok")
            try {
              if (claimRaw(s, leasePath, aside.toString)) {
                // TOCTOU re-check: between measuring the age and the
                // rename, the stale holder may have released and a
                // FRESH holder claimed — the rename then stole a live
                // lease. The renamed-aside dir kept its mtime, so
                // staleness is re-measurable: a genuinely stale lease
                // is discarded; a fresh one is put BACK (the victim
                // never observed the round trip — its token is still
                // inside).
                val asideAge = modTime(s, aside.toString) match {
                  case -1L => Long.MaxValue
                  case t => System.currentTimeMillis() - t
                }
                if (asideAge > staleMs) fs.delete(aside, true): Unit
                else {
                  // a FRESH lease was captured by mistake — put it
                  // back. A third claim may transiently hold the path;
                  // retry briefly rather than destroying the victim's
                  // live lease on the first failure.
                  var returned = false
                  val until = System.currentTimeMillis() + 2000L
                  while (!returned && System.currentTimeMillis() < until) {
                    returned = claimRaw(s, aside.toString, leasePath)
                    if (!returned) Thread.sleep(10)
                  }
                  if (!returned) fs.delete(aside, true): Unit
                }
              }
            } catch {
              case _: java.io.IOException => () // lost the break race
            }
          } else Thread.sleep(20)
          require(System.currentTimeMillis() < deadline,
            s"could not acquire lease $leasePath within ${timeoutMs}ms")
        }
      }
      try f finally {
        // release by one-winner CAPTURE: rename the lease to a private
        // path, verify the captured dir carries OUR token, delete only
        // then. The capture-then-verify closes the old
        // listNames-then-delete race — if between the ownership check
        // and the delete a breaker replaced us with a successor, the
        // capture holds the SUCCESSOR's lease, the token mismatch is
        // detected, and the lease goes straight back (brief retry if a
        // third claim landed inside the put-back window).
        val rel = new org.apache.hadoop.fs.Path(
          p.getParent, s"_lease_released_$tok")
        try {
          if (listNames(s, leasePath).contains(s"holder_$tok") &&
              claimRaw(s, leasePath, rel.toString)) {
            if (listNames(s, rel.toString).contains(s"holder_$tok"))
              fs.delete(rel, true): Unit
            else {
              var returned = false
              val until = System.currentTimeMillis() + 2000L
              while (!returned && System.currentTimeMillis() < until) {
                returned = claimRaw(s, rel.toString, leasePath)
                if (!returned) Thread.sleep(10)
              }
              if (!returned) fs.delete(rel, true): Unit
            }
          } // token already gone: a breaker (rightly) took over — no-op
        } catch { case _: java.io.IOException => () }
      }
    } finally fs.delete(staged, true): Unit
  }

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

  /** Modification time of `path` in epoch millis (-1 when absent) —
    * the age gate the staging vacuum uses to spare a LIVE cross-driver
    * writer's in-flight build, and the stale probe in [[withLease]].
    * Absence is detected by CATCHING the stat's not-found, never by an
    * exists pre-check: the probed path is often another thread's lease
    * or staging directory, which can be released between a pre-check
    * and the stat — the claim-storm race caught exactly that TOCTOU
    * as a dead writer thread. */
  def modTime(s: SparkSession, path: String): Long = {
    val (fs, p) = fsp(s, path)
    try fs.getFileStatus(p).getModificationTime
    catch { case _: java.io.FileNotFoundException => -1L }
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
