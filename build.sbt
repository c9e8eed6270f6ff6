ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "multiagentdocumentetlsystemspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// If a DuckDB JDBC driver jar is already pre-warmed in the local
// coursier cache, put it on the classpath so the K2 relational sink's
// real `df.write.jdbc` path is exercisable (no new resolution —
// COURSIER_MODE=offline is respected; found by glob, not coordinates).
// Absent jar: everything still compiles and the JDBC spec self-skips.
Compile / unmanagedJars ++= {
  val cache = file(sys.props("user.home")) / ".cache" / "coursier"
  val jars = if (cache.exists) (cache ** "duckdb_jdbc-*.jar").get() else Seq.empty
  jars.take(1).map(Attributed.blank(_))
}
Test / fork := true
run / fork := true
// Forked program output passes straight to stdout (no "[info]" logger
// prefix) so the driver can parse Bench's single JSON line.
run / outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // single-JVM local mode: driver heap IS the executor heap; 32 threads
  // shuffling 100M-row joins thrash GC on a small heap
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)
