package graft

import org.apache.spark.sql.SparkSession

/** Scoped session-conf override: set for the duration of `body`, restore
  * the prior value (or unset) afterward — the save/set/try/finally dance
  * shared by q229's dynamic partition overwrite, its spec replay, and
  * the planning-evidence specs. One definition so a future edit cannot
  * diverge the query's restore semantics from the test harness's.
  *
  * The whole save/run/restore window serializes on the session monitor
  * (the same lock `StreamingOps.runToMemory` uses for ITS conf window):
  * session conf is session-global, so two concurrent overrides of the
  * same key would otherwise race the restore and leak one caller's value
  * into the other's queries — e.g. q229's partitionOverwriteMode=dynamic
  * bleeding into a concurrent static overwrite. */
object Confs {
  def withConf[A](s: SparkSession, key: String, value: String)
      (body: => A): A = s.synchronized {
    val prev = s.conf.getOption(key)
    s.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }
}
