ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "projetosetlspark"
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
// Pass the forked JVM's stdout/stderr through un-decorated: sbt's
// default LoggedOutput prefixes every line with "[info] ", which
// breaks consumers that parse the final stdout line as bare JSON
// (graft.Bench's totals line).
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
  // Pin the initial heap to the max (standard benching practice, made
  // load-bearing in r15): G1 SHRINKS the heap once the drain harness
  // unloads dead state-store providers, and the next stateful run
  // pays re-expansion (commit + zeroing) — measured at sf0.1:
  // q_stream_join_outer steady state 13-27 s with a floating heap vs
  // 9-13 s pinned. Xms = Xmx makes allocation cost independent of
  // what ran before, the same determinism goal as the provider
  // unload itself. Override with SPARK_DRIVER_XMS for A/B.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_XMS",
    sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))}",
)
