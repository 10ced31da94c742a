package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** One-off phase profiler for the streaming harness's fixed cost (round-11
  * VERDICT item: ~25 streaming queries x 2-3.6 s of the quiet total is
  * micro-batch setup, not operator work). Times each phase of a minimal
  * tumbling-window stream — construction, start, drain, stop — so the
  * floor's composition is measured, not guessed. Run:
  * `sbt "runMain graft.tools.StreamProfile /root/testdata/sf0.1"`. */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.create()
    import spark.implicits._
    def ms[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFILE $label ${(System.nanoTime() - t0) / 1e6}%.0f ms")
      r
    }
    // batch twin for reference
    ms("batch_twin") {
      graft.Tables.t(spark, dir, "events")
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1))).count()
    }
    (1 to 3).foreach { i =>
      val src = ms(s"construct_$i") {
        graft.streaming.StreamingOps.eventsStream(spark, dir)
          .groupBy(window($"ts", "1 hour"), $"event_type")
          .agg(count(lit(1)).as("n"))
      }
      val q = ms(s"start_$i") {
        spark.synchronized {
          val prev = spark.conf.getOption("spark.sql.shuffle.partitions")
          spark.conf.set("spark.sql.shuffle.partitions", "8")
          try src.writeStream.outputMode("complete").format("memory")
            .queryName(s"prof_$i").start()
          finally prev.foreach(spark.conf.set("spark.sql.shuffle.partitions", _))
        }
      }
      ms(s"drain_$i") { q.processAllAvailable() }
      ms(s"stop_$i") { q.stop() }
      println(s"PROFILE batches_$i " +
        q.recentProgress.map(p => s"${p.batchId}:${p.numInputRows}rows:" +
          f"${p.batchDuration}ms").mkString(" "))
      q.recentProgress.foreach { p =>
        import scala.jdk.CollectionConverters._
        println(s"PROFILE durations_${i}_b${p.batchId} " +
          p.durationMs.asScala.toSeq.sortBy(-_._2).map {
            case (k, v) => s"$k=$v" }.mkString(" "))
        p.stateOperators.foreach(so =>
          println(s"PROFILE state_${i}_b${p.batchId} rows=${so.numRowsTotal} " +
            s"commitMs=${so.allUpdatesTimeMs}+${so.commitTimeMs}"))
      }
    }
    // the production harness path (RAM-backed checkpoint) for comparison
    (1 to 3).foreach { i =>
      val src = graft.streaming.StreamingOps.eventsStream(spark, dir)
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"))
      ms(s"runToMemory8_$i") {
        graft.streaming.StreamingOps.runToMemory(spark, src,
          s"prof_rtm8_$i", "complete", shufflePartitions = Some(8))
      }
      val src2 = graft.streaming.StreamingOps.eventsStream(spark, dir)
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"))
      ms(s"runToMemory2_$i") {
        graft.streaming.StreamingOps.runToMemory(spark, src2,
          s"prof_rtm2_$i", "complete", shufflePartitions = Some(2))
      }
    }
    spark.stop()
  }
}
