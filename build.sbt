ThisBuild / scalaVersion := "2.13.17"
ThisBuild / scalacOptions += "-deprecation"
ThisBuild / version := "0.1.0"
name := "projektdata_engineering_iubhspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Live-Postgres integration (PostgresIntegrationSpec, guarded on PG_URL)
// additionally needs the public PostgreSQL JDBC driver on the test
// classpath; point PG_DRIVER_JAR at a local copy of the jar. Inert when
// unset — no dependency is resolved, keeping the build zero-egress.
Test / unmanagedJars ++=
  sys.env.get("PG_DRIVER_JAR").map(p => Attributed.blank(file(p))).toSeq
run / fork := true
// The driver tail-parses the bench digest line from captured output; the
// default fork logger prefixes every forked stdout line with "[info] ",
// which breaks a JSON parse of the line (BENCH_r08–r11 all captured
// "parsed": null). StdoutOutput passes the forked process's stdout
// through verbatim.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
