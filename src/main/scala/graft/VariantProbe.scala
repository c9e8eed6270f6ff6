package graft

import org.apache.spark.sql.functions._

/** Micro-probe behind Events.propsExtractVariant's numbers: VariantType
  * parse-once + shredded variant_get reads vs get_json_object's
  * per-field text re-parse, on a 21-field object with 8 extractions.
  * Measured at sf0.1 (min of 3 noop-sink runs, idle box): variant
  * ~0.19-0.22 s vs text ~0.22-0.25 s (~1.2×); at the fixture's real
  * 1-field props the two are at the plan floor and tie. */
object VariantProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("variant-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // 20-field object, extraction of 8 — the shape where parse cost and
    // per-field re-parse actually separate
    val fields = (0 until 20).flatMap(i => Seq(
      lit(s"""${if (i == 0) "" else ","}"f$i": """),
      (col("user_id") * (i + 1) + col("event_id") % 97).cast("string")))
    val j = concat((lit("""{"p": """) +: col("props") +: lit(",") +: fields :+ lit("}")): _*)
    val e = Tables.loadWide(spark, dir, "events").select(col("event_type"), j.as("js"))
    e.cache().count()

    def time(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      // warm
      df.write.format("noop").mode("overwrite").save()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name min=${times.min}%.3f s runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }

    val paths = "$.p.k" +: (0 until 7).map(i => s"$$.f${i * 2}")
    val vv = parse_json(col("js"))
    time("variant")(e.select(vv.as("v"))
      .select(paths.zipWithIndex.map { case (p, i) =>
        variant_get(col("v"), p, "long").as(s"x$i") }: _*))
    time("text-reparse")(e.select(paths.zipWithIndex.map { case (p, i) =>
      get_json_object(col("js"), p).cast("long").as(s"x$i") }: _*))
    spark.stop()
  }
}
