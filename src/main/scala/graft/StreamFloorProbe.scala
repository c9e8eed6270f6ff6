package graft

import org.apache.spark.sql.functions._

/** Scratch main (r13): decompose the streaming twins' fixed cost —
  * where do the ~1-2 s per stream query go? Prints each micro-batch's
  * durationMs breakdown (queryPlanning, walCommit, addBatch, state
  * commit) from the query's progress events. Not part of the driver
  * contract. */
object StreamFloorProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-stream-floor-probe")
    import graft.streaming.StreamOps

    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    def runOnce(label: String, df: org.apache.spark.sql.DataFrame,
                mode: String): Unit = {
      val key = "spark.sql.shuffle.partitions"
      val prev = spark.conf.get(key)
      spark.conf.set(key, "4")
      try {
        val name = "probe_" + java.util.UUID.randomUUID().toString.replace("-", "")
        var q: org.apache.spark.sql.streaming.StreamingQuery = null
        timed(s"$label start") {
          q = df.writeStream.format("memory").queryName(name)
            .outputMode(mode).start()
        }
        timed(s"$label processAllAvailable") { q.processAllAvailable() }
        q.recentProgress.foreach { p =>
          println(s"[probe] $label batch ${p.batchId}: rows=${p.numInputRows} " +
            s"durations=${p.durationMs}")
        }
        timed(s"$label stop") { q.stop() }
      } finally spark.conf.set(key, prev)
    }

    // warm codegen/stream machinery once
    runOnce("warmup", StreamOps.tumblingCounts(
      StreamOps.eventsStream(spark, dir)), "complete")

    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      runOnce("tumbling", StreamOps.tumblingCounts(
        StreamOps.eventsStream(spark, dir)), "complete")
      runOnce("dedup", StreamOps.dedupedStream(
        StreamOps.eventsStream(spark, dir))
        .select(col("event_id"), col("user_id")), "append")
      timed("full events_stream_tumbling query") {
        StreamOps.streamTumblingQuery(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
