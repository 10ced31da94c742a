package graft.tools

import graft._
import org.apache.spark.sql.streaming.Trigger

/** One-JVM A/B of drained-stream mechanics: the same 2-file feed +
  * foreachBatch body timed under (a) start + processAllAvailable +
  * stop (the corpus's drain idiom) and (b) Trigger.AvailableNow +
  * awaitTermination — the VERDICT-16 item-5 measurement. Each form
  * runs `reps` times alternating, fresh checkpoint per run. */
object DrainBench {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 5
    val s = GraftSession.create()
    import s.implicits._
    val feed = TempRoots.root("graft_drainbench").resolve("feed").toString
    (1L to 200L).map(i => (i, i % 7)).toDF("id", "k")
      .coalesce(1).write.mode("overwrite").parquet(feed)
    (201L to 400L).map(i => (i, i % 7)).toDF("id", "k")
      .coalesce(1).write.mode("append").parquet(feed)
    val sch = s.read.parquet(feed).schema
    def body(b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
        id: Long): Unit = {
      b.groupBy("k").count().collect(): Unit
    }
    def src = s.readStream.schema(sch)
      .option("maxFilesPerTrigger", 1).parquet(feed)
    def paa(): Double = {
      val t0 = System.nanoTime()
      val q = src.writeStream.foreachBatch(body _).start()
      try q.processAllAvailable() finally q.stop()
      (System.nanoTime() - t0) / 1e9
    }
    def avn(): Double = {
      val t0 = System.nanoTime()
      val q = src.writeStream.foreachBatch(body _)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both paths once
    paa(); avn()
    val a = (1 to reps).map(_ => paa())
    val b = (1 to reps).map(_ => avn())
    println(f"DRAINBENCH paa min=${a.min}%.3f med=${a.sorted.apply(reps / 2)}%.3f all=${a.map(x => f"$x%.3f").mkString(",")}")
    println(f"DRAINBENCH avn min=${b.min}%.3f med=${b.sorted.apply(reps / 2)}%.3f all=${b.map(x => f"$x%.3f").mkString(",")}")
    s.stop()
  }
}
