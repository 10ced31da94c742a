package graft

import graft.config.{DatabasesConfig, IngestConfig, PluginSpec}
import graft.sink.JdbcSink
import graft.sources.OpenSky
import graft.streaming.{PollingIngest, SyntheticOpenSkySource}
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end JDBC delivery (SURVEY §2A A8-A10) against embedded Derby —
  * a real SQL database over a real JDBC wire: DDL bootstrap, batched
  * appends per target, JSON serialization of the sensors array at the
  * boundary, and the JDBC batch-read path back into Spark.
  */
class JdbcSinkSpec extends AnyFunSuite {
  import TestSession._

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val props = new java.util.Properties()

  /** Derby rendering of the flights DDL: schema instead of database,
    * BIGINT epochs, REAL floats, VARCHAR for the JSON column. */
  private def derbyDdl(db: String, table: String, ddl: String): Seq[String] = {
    val types = OpenSky.mysqlTypes.map { case (n, t) =>
      val derbyT = t match {
        case "INT" => "BIGINT" // epochs arrive as LongType
        case "FLOAT" => "REAL"
        // Spark's Derby dialect binds StringType (incl. NULLs) as CLOB
        case "JSON" => "CLOB"
        case v if v.startsWith("VARCHAR") => "CLOB"
        case other => other
      }
      // position_source is IntegerType in Spark → INTEGER in Derby
      if (n == "position_source") s"$n INTEGER" else s"$n $derbyT"
    }
    Seq(
      s"CREATE SCHEMA $db",
      types.mkString(s"CREATE TABLE $db.$table (\n", ",\n", "\n)"))
  }

  test("ingest tick fans out over JDBC; rows and sensors JSON round-trip") {
    val sink = new JdbcSink(url, props, numPartitions = 2, ddlFor = derbyDdl)
    val cfg = IngestConfig(
      plugin = PluginSpec(intervalSec = 1),
      databases = DatabasesConfig(prefix = "ga", copies = 2, extra = Map.empty),
      runForSec = 0)
    val h = PollingIngest.run(spark, new SyntheticOpenSkySource(30), cfg,
      sink, maxTicks = 2, sleepFn = _ => ())
    assert(h.ticks === 2)

    // read back through Spark's JDBC source (§2B "JDBC batch read")
    val back = spark.read.jdbc(url, "ga1.flights", props)
    assert(back.count() === 60)
    assert(back.columns.toSeq.map(_.toLowerCase) ===
      ("time" +: OpenSky.stateColumns.map(_._1)))
    // sensors serialized as JSON text at the boundary
    val sensors = back.select("sensors").where("sensors IS NOT NULL")
      .collect().map(_.getString(0)).toSet
    assert(sensors === Set("[1,2]"))
    // both copies got identical row counts
    assert(spark.read.jdbc(url, "ga2.flights", props).count() === 60)
  }

  test("idempotent JDBC sink: replayed batch replaces itself, new batch appends") {
    import graft.sink.IdempotentJdbcSink
    import spark.implicits._
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      st.execute("CREATE SCHEMA idem")
      st.execute("CREATE TABLE idem.t (k BIGINT, v CLOB, batch_id BIGINT)")
      st.close()
    } finally conn.close()
    val sink = new IdempotentJdbcSink(url, props, numPartitions = 1)
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    sink.append(df, "idem", "t", batchId = 0)
    sink.append(df, "idem", "t", batchId = 0) // replay: replaces, no dupes
    assert(spark.read.jdbc(url, "idem.t", props).count() === 2)
    sink.append(df, "idem", "t", batchId = 1) // new batch: appends
    val back = spark.read.jdbc(url, "idem.t", props)
    assert(back.count() === 4)
    assert(back.select("batch_id").distinct().count() === 2)
  }

  test("idempotent JDBC ensure() splices batch_id through a REGENERATING ddl dialect") {
    import graft.sink.IdempotentJdbcSink
    // derbyDdl ignores its ddl argument and rebuilds from OpenSky.mysqlTypes
    // — the splice must run on the dialect OUTPUT to survive that
    val sink = new IdempotentJdbcSink(url, props, numPartitions = 1, ddlFor = derbyDdl)
    sink.ensure("idem2", "flights", OpenSky.createTableDdl("flights"))
    val cols = spark.read.jdbc(url, "idem2.flights", props).columns.map(_.toLowerCase)
    assert(cols.contains("batch_id"), cols.mkString(","))
  }

  test("idempotent JDBC sink: staging tables swept, unsafe identifiers rejected") {
    import graft.sink.IdempotentJdbcSink
    import spark.implicits._
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      st.execute("CREATE SCHEMA idem3")
      st.execute("CREATE TABLE idem3.t (k BIGINT, batch_id BIGINT)")
      st.close()
    } finally conn.close()
    val sink = new IdempotentJdbcSink(url, props, numPartitions = 1)
    sink.append(Seq(1L, 2L, 3L).toDF("k"), "idem3", "t", batchId = 7)
    assert(spark.read.jdbc(url, "idem3.t", props).count() === 3)
    // the swap's staging table must not outlive the append
    val leftovers = spark.read.jdbc(url,
      "(SELECT tablename FROM sys.systables WHERE tablename LIKE '%_STG_%') s", props)
    assert(leftovers.count() === 0, leftovers.collect().mkString(","))
    // injection-carrying names rejected loudly, before any SQL runs
    intercept[IllegalArgumentException] {
      sink.append(Seq(1L).toDF("k"), "idem3", "t WHERE 1=1; DROP TABLE idem3.t", 8)
    }
    intercept[IllegalArgumentException] { sink.ensure("bad-db", "t", "CREATE TABLE t (k BIGINT)") }
    // a name whose charset is fine but whose length would overflow MySQL's
    // 64-char identifier limit once the staging suffix lands is rejected
    // up front, not at staging-CREATE time
    intercept[IllegalArgumentException] {
      sink.append(Seq(1L).toDF("k"), "idem3", "t" * 40, 9)
    }
    graft.sink.JdbcSink.requireSafeIdent("a" * 34) // at the bound: accepted
  }

  test("idempotent JDBC swap rolls back on failure: previous delivery survives") {
    import graft.sink.IdempotentJdbcSink
    import spark.implicits._
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      st.execute("CREATE SCHEMA idem4")
      st.execute("CREATE TABLE idem4.t (k BIGINT NOT NULL, batch_id BIGINT)")
      st.close()
    } finally conn.close()
    val sink = new IdempotentJdbcSink(url, props, numPartitions = 1)
    sink.append(Seq(1L, 2L).toDF("k"), "idem4", "t", batchId = 3)
    assert(spark.read.jdbc(url, "idem4.t", props).count() === 2)
    // replayed batch carries a NULL key: the staging write succeeds (the
    // Spark-created staging table is nullable) but the swap INSERT
    // violates the target's NOT NULL — the transaction must roll back,
    // NOT commit the half-applied DELETE
    val bad = Seq(Option(5L), Option.empty[Long]).toDF("k")
    intercept[Exception] { sink.append(bad, "idem4", "t", batchId = 3) }
    assert(spark.read.jdbc(url, "idem4.t", props).count() === 2,
      "previous delivery of batch 3 must survive a failed replay swap")
  }

  test("withBatchColumn: word-boundary detection, depth-matched splice point") {
    import graft.sink.IdempotentJdbcSink.withBatchColumn
    val declared = "CREATE TABLE t (k BIGINT, batch_id BIGINT)"
    assert(withBatchColumn(declared) === declared) // already present: no-op
    // rebatch_id must NOT suppress the splice (word boundary)
    assert(withBatchColumn("CREATE TABLE t (k BIGINT, rebatch_id BIGINT)")
      === "CREATE TABLE t (k BIGINT, rebatch_id BIGINT, batch_id BIGINT)")
    // splice lands in the COLUMN list, not a trailing option clause's parens
    assert(withBatchColumn("CREATE TABLE t (v VARCHAR(20)) COMMENT 'x (y)'")
      === "CREATE TABLE t (v VARCHAR(20), batch_id BIGINT) COMMENT 'x (y)'")
  }

  test("JDBC read pushes filters to the database") {
    val back = spark.read.jdbc(url, "ga1.flights", props)
      .filter("on_ground = true").select("icao24", "on_ground")
    assert(back.count() > 0)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.toLowerCase.contains("on_ground"),
      plan.take(400))
  }
}
