package graft

import org.apache.spark.sql.SparkSession

/** Scoped session-conf override: set for the duration of `body`, restore
  * the prior value (or unset) afterward — the save/set/try/finally dance
  * shared by q229's dynamic partition overwrite, its spec replay, and
  * the planning-evidence specs. One definition so a future edit cannot
  * diverge the query's restore semantics from the test harness's. */
object Confs {
  def withConf[A](s: SparkSession, key: String, value: String)
      (body: => A): A = {
    val prev = s.conf.getOption(key)
    s.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }
}
