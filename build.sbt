ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "timeseriesdatapipelinespark"
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
// Pass the forked program's stdout/stderr through VERBATIM: sbt's default
// logger prefixes every child line with [info]/[error], which mangles the
// one-line JSON contract of graft.Bench (the driver greps stdout for it).
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
// Forward graft.* system props into FORKED JVMs (Test / fork above):
// `sbt -Dgraft.gas.stress.dir=...` otherwise stops at the sbt launcher
// JVM and a "stress rung" spec invocation silently runs at CI scale —
// exactly what happened to CrashReplaySpec's documented 28 Hz run until
// round 13 caught it with a prop-echo probe.
// USAGE CONTRACT (round-13 ADVICE): launch a FRESH `sbt -Dgraft...` per
// stress invocation. `javaOptions` is a task, so sys.props is re-read
// each `test` run — but a -D can only enter sys.props at JVM launch, so
// a long-lived sbt shell (or an sbtn client talking to an old server)
// keeps whatever -Ds it was born with; `set` inside the shell changes
// javaOptions directly and bypasses this forwarding entirely. Every
// stress-rung spec also echoes the props it resolved (the round-13
// probe), so a stale shell is visible in the spec output, not silent.
javaOptions ++= sys.props.collect {
  case (k, v) if k.startsWith("graft.") => s"-D$k=$v"
}.toSeq
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // spark-submit/spark-shell set this via JavaModuleOptions; without it,
  // JDK 17 falls back to slow method-handle reflection in hot paths.
  "-Djdk.reflect.useDirectMethodHandleAccessor=false",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
