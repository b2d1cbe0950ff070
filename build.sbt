ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "lazyframespark"
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
// The bench/verify drivers parse the process's LAST stdout line as JSON.
// Two sbt behaviors used to break that: forked-run output was routed
// through the logger (prefixing every line with "[info] "), and sbt
// appended "[success] Total time: …" as the true final line. Pass the
// forked JVM's stdout through raw, and drop the success trailer, so the
// summary JSON printed by graft.Bench/graft.Verify is genuinely the last
// line of the process's stdout.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command engine, not another setting —
// exclude it from the unused-key lint so the warning can't land in stdout.
Global / excludeLintKeys += showSuccess
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
  // Hard-pinned at 48g (host has 128 GiB): the official r7 bench ran with
  // a small default heap and the official r8 run inherited an 89 GB env
  // override, so no two rounds were same-heap comparable. -Xmx is a
  // ceiling, not an upfront allocation, so tests and small runs are
  // unaffected. Deliberately NOT env-overridable: every artifact (official
  // bench, ladder rung, local retake) must measure the same configuration.
  "-Xmx48g",
  // -Xms pinned to -Xmx (r17): without it ParallelGC starts at ~2 GB and
  // adaptively grows toward 48 GB across the FIRST full-registry bench
  // loop — measured as 78–136 s of GC on the first loop vs 9–26 s on the
  // retry in the same (grown, stabilized) JVM, on 4 of 6 otherwise-quiet
  // r17 legs. Pinning the initial heap removes the growth/resizing churn
  // so the first measured loop runs the same heap the retry does. Linux
  // commits the pages lazily (no AlwaysPreTouch), so small runs and tests
  // still only touch what they use.
  "-Xms48g",
  // ParallelGC over the JDK-17 default G1 for all forked runs: SCALE.md
  // measured G1 young-gen shrinkage under 32-thread allocation bursts
  // doubling the x64 index build (18.6–195 s bimodal); ParallelGC holds a
  // stable young gen and halved it. Throughput GC is the right default for
  // a batch engine — there are no latency SLOs in a bench/test JVM.
  "-XX:+UseParallelGC",
)
