package graft.tools

import org.apache.spark.sql.SparkSession

/** The SECOND DRIVER for CrossDriverSpec: a real separate JVM — its own
  * claim lock, its own metadata caches, its own Hadoop FileSystem
  * instances — contending the storage seam's cross-driver primitives
  * ([[graft.sink.Fs.claim]] / [[graft.sink.Fs.withLease]]) against the
  * test JVM on a shared root. FsSpec races lock-free THREADS to model
  * two drivers; this is the un-modeled case: two kernels' worth of
  * nothing shared but the filesystem, where rename(2) (local) or the
  * NameNode (HDFS) is the only arbiter the one-winner property can
  * possibly rest on.
  *
  * Protocol: the probe touches `<root>/_ready_<id>`, then spins until
  * `<root>/_go` appears — so the spec can line BOTH drivers up before
  * either enters the contended loop (without the barrier the probe's
  * ~15 s SparkSession startup would let the spec finish uncontended).
  *
  * Modes:
  *  - `lease`: N critical sections under `<root>/_lease`, each writing
  *    its wall-clock [enter, exit] interval to `intervals_<id>.log`
  *    (same host => directly comparable across the JVMs; the 15 ms
  *    hold dwarfs clock granularity).
  *  - `claim`: N one-winner claims of `<root>/slot_<i>` from privately
  *    staged dirs carrying an `owner_<id>` marker; win/loss per slot
  *    to `claims_<id>.log`. */
object CrossDriverProbe {
  def main(args: Array[String]): Unit = {
    val Array(mode, root, id, itS, staleS) = args
    val s = SparkSession.builder().master("local[2]")
      .appName(s"graft-xdriver-probe-$id")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val n = itS.toInt
    graft.sink.Fs.touch(s, s"$root/_ready_$id")
    val deadline = System.currentTimeMillis() + 120000L
    while (!graft.sink.Fs.exists(s, s"$root/_go")) {
      require(System.currentTimeMillis() < deadline, "no _go marker")
      Thread.sleep(10)
    }
    mode match {
      case "lease" =>
        val out = new java.io.PrintWriter(s"$root/intervals_$id.log")
        (1 to n).foreach { _ =>
          graft.sink.Fs.withLease(s, s"$root/_lease",
            staleMs = staleS.toLong) {
            val t0 = System.currentTimeMillis()
            Thread.sleep(15)
            out.println(s"$t0 ${System.currentTimeMillis()}")
          }
        }
        out.close()
      case "claim" =>
        val out = new java.io.PrintWriter(s"$root/claims_$id.log")
        (1 to n).foreach { i =>
          val staged = s"$root/_staging_${id}_$i"
          graft.sink.Fs.touch(s, s"$staged/owner_$id")
          val won = graft.sink.Fs.claim(s, staged, s"$root/slot_$i")
          out.println(s"$i $won")
        }
        out.close()
      case "merge" =>
        // optimistic multi-writer CDC: N single-key inserts against
        // the SHARED CowSnapshots store at <root>/store, each retried
        // when the lost-update guard aborts a publish derived from a
        // parent the other driver advanced past (the retry re-derives
        // against the new latest — the Delta/Iceberg commit loop)
        import s.implicits._
        val out = new java.io.PrintWriter(s"$root/merge_$id.log")
        val base = if (id == "b") 2000000L else 1000000L
        (1 to n).foreach { i =>
          val ch = Seq(("insert", base + i, base + i))
            .toDF("op", "doc_id", "cents")
          var v = -1
          while (v < 0) {
            try v = graft.sink.CowSnapshots.mergeVersion(
              s, s"$root/store", ch, "doc_id", "s", 4)
            catch {
              case e: IllegalArgumentException
                if e.getMessage.contains("lost update") => ()
            }
          }
          out.println(s"$i $v")
        }
        out.close()
    }
    s.stop()
  }
}
