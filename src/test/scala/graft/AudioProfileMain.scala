package graft

import org.apache.spark.sql.functions._

/** Scratch profiler for the audio near-dup stages (not a spec). */
object AudioProfileMain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("audio-profile")
    import graft.operators.{Dedup, Multimodal}
    def t(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm
    Multimodal.audioShingleSets(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    t("sets pass")(Multimodal.audioShingleSets(spark, dir))
    val sets = Multimodal.audioShingleSets(spark, dir).localCheckpoint(true)
    val fps = sets.select(col("doc_id"), explode(col("fparr")).as("fp"))
    println("fps rows: " + fps.count())
    t("sig")(Dedup.sigFromFps(fps, 8))
    val sig = Dedup.sigFromFps(fps, 8)
    val cands = Dedup.bandJoinCandidates(sig, 8, 2)
    val t0 = System.nanoTime()
    println("cands: " + cands.count() +
      f" (${(System.nanoTime() - t0) / 1e9}%.2f s)")
    t("full")(Multimodal.audioNearDupPairs(spark, dir))
    spark.stop()
  }
}
