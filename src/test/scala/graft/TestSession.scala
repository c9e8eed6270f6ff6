package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole forked test JVM. */
object TestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .appName("graft-test")
      .master("local[4, 2]") // 2 task attempts: lets specs exercise task retry
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sfDir = "/root/testdata/sf0.001"

  /** Count the Spark jobs `body` submits — the shared helper for the
    * "marginal driver cost per superstep/round" specs. Counting is a
    * SparkListener keyed on a unique job group; a MARKER job in a
    * second group fences the (FIFO) listener bus, so when the marker's
    * start event arrives every counted job's event has already been
    * processed — no sleep-polling of the lagging statusTracker. */
  def countJobs(body: => Unit): Int = {
    val sc = spark.sparkContext
    val group = "jobcount-" + java.util.UUID.randomUUID()
    val marker = group + "-marker"
    val count = new java.util.concurrent.atomic.AtomicInteger(0)
    val markerSeen = new java.util.concurrent.CountDownLatch(1)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val g = Option(js.properties)
          .map(_.getProperty("spark.jobGroup.id")).orNull
        if (g == group) count.incrementAndGet()
        else if (g == marker) markerSeen.countDown()
      }
    }
    sc.addSparkListener(listener)
    try {
      sc.setJobGroup(group, group)
      try body finally sc.clearJobGroup()
      sc.setJobGroup(marker, marker)
      try spark.range(1).count() finally sc.clearJobGroup()
      assert(markerSeen.await(30, java.util.concurrent.TimeUnit.SECONDS),
        "listener bus never delivered the fence job")
      count.get()
    } finally sc.removeSparkListener(listener)
  }
}
