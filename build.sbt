ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "osmairflowspark"
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
  // 122 distinct queries in one JVM generate a janino class per codegen
  // stage; the default 240 MB JIT code cache fills late in the run and
  // the JIT silently stops compiling — observed in round 2 as 10-50x
  // slowdowns on trivial plans at the END of the bench. Headroom + class
  // unloading (Bench calls System.gc periodically) keeps the JIT alive.
  "-XX:ReservedCodeCacheSize=512m",
)
// forked `run` output goes straight through, without sbt's "[info] "
// log prefix — Bench/Verify print machine-parsed JSON lines to stdout.
run / outputStrategy := Some(StdoutOutput)

// Two-tier test invocation (VERDICT r17 #7): the per-commit lane skips
// the `graft.Heavy`-tagged whole-registry sweeps / tri-scale probes /
// streaming soaks; the full matrix still runs with plain `sbt test` at
// round close. See TestBase.scala for the tagging rule.
addCommandAlias("quickTest", "Test / testOnly * -- -l graft.Heavy")
