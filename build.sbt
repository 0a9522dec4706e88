ThisBuild / scalaVersion := "2.13.17"
// Zero-egress resilience: if the compiled-bridge cache (~/.sbt/1.0/zinc)
// is ever cleared, sbt falls back to compiling the bridge from a
// -sources jar that the offline coursier cache does not hold. Pin the
// PRECOMPILED scala2-sbt-bridge from the warmed cache instead so a
// wiped zinc dir can never brick the build.
ThisBuild / scalaCompilerBridgeBinaryJar := {
  // Host-agnostic: locate the precompiled bridge anywhere under the
  // local coursier cache (layout v1/<scheme>/<host>/<repo-path>/...),
  // so no mirror hostname is ever embedded in the build.
  val cache = file(sys.props("user.home")) / ".cache" / "coursier" / "v1"
  (cache ** "scala2-sbt-bridge-2.13.17.jar").get().headOption
}
ThisBuild / version := "0.1.0"
name := "dataengineeringetlpipelinespark"
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
// Forked mains (Bench/Verify) print driver-contract JSON lines on stdout;
// sbt's default output strategy wraps them in "[info] " log prefixes,
// which broke the driver's bench parser in r13. Pass stdout/stderr through
// verbatim instead.
run / outputStrategy := Some(StdoutOutput)
Compile / run / outputStrategy := Some(StdoutOutput)
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
// Pinned measurement JVM: fixed heap, explicit G1, generous code cache
// (whole-stage codegen emits many large classes), and — critically —
// AlwaysPreTouch. Without pre-touch, the first allocation-heavy
// executions fault the heap's untouched pages in; kernel page-zeroing
// then burns 10+ cores across all task threads and a 1-second query
// measures 20-70 s for the first few repetitions of a fresh JVM
// (diagnosed by elimination: persisted with AQE off, codegen off,
// C2 off, capped compiler threads; vanished with pre-touch). Pre-touch
// moves that one-time cost to JVM startup. Builder and driver both fork
// through sbt, so both measure under the same flags.
javaOptions ++= jdk17AddOpens ++ Seq(
  // lets forked mains (Bench tee) resolve repo-rooted paths regardless of cwd
  s"-Dgraft.repo.root=${baseDirectory.value.getAbsolutePath}",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  "-XX:+UseG1GC",
  "-XX:ReservedCodeCacheSize=512m",
  "-XX:+AlwaysPreTouch",
)
