package graft

import org.apache.spark.sql.SparkSession

/** One place for session tuning so Verify / Bench / tests agree.
  *
  * Local mode stands in for a 1000-executor cluster: shuffle partitions are
  * sized to cores (not the 200 default), AQE is on (runtime coalescing,
  * skew-join splitting, dynamic broadcast), and timestamps are pinned to
  * UTC µs for oracle parity.
  */
object GraftSession {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // events.parquet carries TIMESTAMP(NANOS) which Spark has no native
      // type for; read as LongType nanos (converted in Tables.t).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Default checkpoint root for streaming queries that start
      // WITHOUT an explicit checkpointLocation (the foreachBatch
      // maintenance loops): unnamed queries get a fresh random child
      // under this root per start, so bench reruns still replay from
      // scratch — but the offset-WAL / commit-log fsyncs land on the
      // RAM-backed root instead of ext4 /tmp (the runToMemory
      // measurement: those small synchronous writes cost more than a
      // micro-batch's actual work at fixture scale). Explicit
      // checkpointLocation options override this conf untouched.
      // Pid-scoped + dead-sibling-swept like every TempRoots dir; a
      // production deployment checkpoints to durable storage, which
      // is exactly what a drained test-harness loop does not need.
      .config("spark.sql.streaming.checkpointLocation",
        TempRoots.fastRoot("graft_stream_ckpt").toString)
      .config("spark.ui.enabled", "false")

  def create(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
