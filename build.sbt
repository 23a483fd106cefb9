ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "osmpbfinputformatspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// r16 (VERDICT r15 ask #1): forked `run` output passes through UNPREFIXED.
// The default LoggedOutput strategy prepends "[info] " to every stdout
// line, so graft.Bench's one-line JSON reached the driver as
// "[info] {...}" — not a bare JSON line — and the driver's parser
// recorded `parsed: null` on EVERY round's BENCH artifact (r1–r15).
// StdoutOutput hands the forked process the parent's streams directly:
// the bench line is now a bare `{"metric":...}` line. Test output is
// unaffected (Test logging is framework-driven, not outputStrategy).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// r16 (VERDICT r15 ask #3): a MACHINE-READABLE one-line success marker
// at the very end of `sbt test`. Round 15's driver recorded
// tests_ok:false on a suite whose 78 XML reports aggregate 0 failures —
// its success detection never saw an unambiguous marker in the output
// tail. The override runs the real test task (which THROWS on any
// failure, so the marker line structurally cannot print on a red
// suite) and then prints one bare JSON line from the sbt JVM itself
// (no logger prefix), mirroring the bench-line contract.
Test / test := {
  (Test / test).value
  println("""{"tests_ok":true}""")
}
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
