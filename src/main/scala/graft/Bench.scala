package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-bench")
    // JVM/codegen warmup so the first timed query isn't charged ~30s of
    // JIT + classloading: run one representative query untimed.
    try SparkEntry.queries.headOption.foreach(_._2(spark, sfDir).count())
    catch { case _: Throwable => () }
    // noop sink: count() lets Catalyst prune pure projections (a
    // narrow query would time as a row-count scan); noop executes the
    // full physical plan without writing anything.
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // failures surface as negative time + stderr, never as a silent
      // fake-fast success
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false }
      val t = (System.nanoTime() - t0) / 1e9
      // operators may persist() intermediates (retry loop, LSH sigs);
      // drop them so queries are timed independently
      spark.catalog.clearCache()
      name -> (if (ok) t else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
