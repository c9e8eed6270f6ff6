package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** 1-minute system load average — recorded into the bench JSON so a
    * reader can tell an idle-phase run from a co-tenant-load one (this
    * box's background workload swings totals 2-4x; round-2 lesson). */
  private def loadAvg: Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .getSystemLoadAverage

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-bench")
    val loadStart = loadAvg
    // noop sink: count() lets Catalyst prune pure projections (a
    // narrow query would time as a row-count scan); noop executes the
    // full physical plan without writing anything.
    // Optional comma-separated subset for local perf iteration, e.g.
    //   SPARK_GRAFT_BENCH_ONLY=json_repair,jaccard_pairs
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { set =>
      val unknown = set.diff(SparkEntry.queries.keySet)
      if (unknown.nonEmpty)
        System.err.println(
          s"[bench] WARNING: unknown query names in SPARK_GRAFT_BENCH_ONLY: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    val selected = (only match {
      case Some(set) => SparkEntry.queries.filter { case (k, _) => set(k) }
      case None => SparkEntry.queries
    }).toSeq.sortBy(_._1) // deterministic order: per-query times reproduce
    // Codegen/JIT warmup: run every selected query once at the SMALLEST
    // fixture (sf0.001) untimed, so timed numbers measure data work, not
    // first-compile of each query's generated code. This mirrors the
    // oracle's methodology — tools/oracle_times.py reports min-of-3,
    // i.e. warm DuckDB times.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    selected.foreach { case (_, fn) =>
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    spark.catalog.clearCache()
    // min-of-N per query, mirroring the oracle's min-of-3 methodology
    // (tools/oracle_times.py) — a single co-tenant load phase hitting one
    // query no longer distorts its recorded time
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS").map(_.toInt).getOrElse(2)
    // co-tenant-phase guard: when the base reps of a non-trivial query
    // disagree by >60%, one of them straddled a load spike — keep adding
    // reps (to a small cap) until the min is corroborated. Cheap queries
    // (sub-half-second, inside the plan/codegen floor) never re-measure,
    // so the added wall cost is a few reps on exactly the queries whose
    // recorded time would otherwise be noise (round-5 pipeline_envelope
    // lesson: 3.87 s recorded for a 1.36 s-idle query).
    val maxReps = sys.env.get("SPARK_GRAFT_BENCH_MAX_REPS").map(_.toInt)
      .getOrElse(math.max(reps, 4))
    // Contention probe: a fixed 32-way CPU burn whose wall time directly
    // measures the cores THIS JVM can actually get. The 1-min loadavg
    // cannot play this role — our own 32-thread queries dominate it —
    // but the probe is ours alone: at idle it runs in ~baseline; when
    // the co-tenant phase owns the box it stretches 2-5x. Needed because
    // min-of-N with a disagreement guard still records garbage when ALL
    // reps fall inside one sustained phase and agree with each other
    // (round-6 lesson: lang_top_words 47 s recorded for a 2 s query).
    // probeBase is a RUNNING MINIMUM over every probe() observation, not
    // a once-at-startup sample: if the whole startup window sits inside a
    // sustained co-tenant phase, a frozen baseline is inflated 2-5x and
    // contended() never fires for the entire run. Tracking the min lets
    // the baseline self-correct the first time any calm window is seen.
    var probeBase = Double.MaxValue
    def probe(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 200000000L, 1, 32).selectExpr("sum(id * 3 + 1)")
        .write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      if (t < probeBase) probeBase = t
      t
    }
    probe() // codegen warm
    (1 to 3).foreach(_ => probe()) // seed the baseline
    // shared calm-wait budget for the whole run: bounded stall even if
    // the co-tenant never yields (then behavior degrades to min-of-N)
    var calmBudgetNs = sys.env.get("SPARK_GRAFT_BENCH_CALM_BUDGET_S")
      .map(_.toLong).getOrElse(600L) * 1000000000L
    def contended(): Boolean = probe() > 1.5 * probeBase
    def waitForCalm(): Unit = {
      var p = probe()
      while (p > 1.5 * probeBase && calmBudgetNs > 0) {
        val t0 = System.nanoTime()
        Thread.sleep(5000)
        calmBudgetNs -= (System.nanoTime() - t0)
        p = probe()
      }
    }
    val results = selected.map { case (name, fn) =>
      def rep(): Double = {
        val t0 = System.nanoTime()
        // failures surface as negative time + stderr, never as a silent
        // fake-fast success
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false }
        val t = (System.nanoTime() - t0) / 1e9
        // operators may persist() intermediates (prefix-Jaccard index, LSH
        // sigs); drop them so queries are timed independently
        spark.catalog.clearCache()
        if (ok) t else -1.0
      }
      var attempts = reps
      var times = (1 to reps).map(_ => rep()).filter(_ >= 0)
      // guard 1: reps disagree -> one straddled a spike, corroborate
      while (times.nonEmpty && attempts < maxReps &&
             times.min > 0.5 && times.max > 1.6 * times.min) {
        attempts += 1
        times = (times :+ rep()).filter(_ >= 0)
      }
      // guard 2: reps AGREE but the box is contended right now -> the
      // whole measurement sat inside a phase; wait it out (bounded by
      // the shared budget) and re-measure. The extra rep runs even with
      // the budget exhausted — one more time-spaced sample can still
      // land in a gap, and min() never gets worse.
      if (times.nonEmpty && times.min > 0.5 && contended()) {
        waitForCalm()
        times = (times :+ rep()).filter(_ >= 0)
      }
      name -> (if (times.nonEmpty) times.min else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // a partial run is self-identifying ("only" key) so a typo'd subset
    // can never masquerade as the canonical full bench
    val onlyField = only
      .map(s => s""","only":${s.toSeq.sorted.mkString("[\"", "\",\"", "\"]")}""")
      .getOrElse("")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"""" +
        s""","n_queries":${results.size},"reps":$reps,"load_start":$loadStart""" +
        s""","load_end":$loadAvg$onlyField}"""
    println(json)
    // Belt and braces: the round-1 driver failed to parse the JSON out of
    // sbt-prefixed stdout ("parsed": null), so also persist it to a file
    // (env-overridable path) that survives the run.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}") }
    spark.stop()
  }
}
