ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dataetlshlianjiaspark"
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
// The driver parses Bench's single JSON stdout line; sbt's default logger
// prefixes every forked-process line with [info]/[error], which breaks
// that parse (BENCH_r01.json recorded "parsed": null). StdoutOutput pipes
// the forked JVM's stdout/stderr through verbatim.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// sun.jnu.encoding (filesystem path encoding) is derived from the process
// locale at JVM start — -D flags alone don't stick; Chinese partition
// directories (状态=成交/) need a UTF-8 locale in the forked JVMs
Test / envVars ++= Map("LANG" -> "C.UTF-8", "LC_ALL" -> "C.UTF-8")
run / envVars ++= Map("LANG" -> "C.UTF-8", "LC_ALL" -> "C.UTF-8")
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
  // Chinese column values as partition directory names (状态=成交/) need a
  // UTF-8 filesystem encoding; the container default is POSIX/ASCII
  "-Dfile.encoding=UTF-8",
  "-Dsun.jnu.encoding=UTF-8",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // -Xms pinned to -Xmx (standard fixed-heap sizing for Spark JVMs):
  // without it, every inter-query System.gc() full-compacts AND
  // SHRINKS the committed G1 heap to ~300-500 MB, so the next query
  // pays heap re-expansion plus a storm of IHOP-triggered concurrent
  // mark cycles (measured r16: 2116 "Concurrent Start" young GCs and
  // 85.7 s of concurrent marking inside timed windows across one
  // bench; with -Xms=-Xmx: 8 young GCs, 0.1 s). Full-suite bench
  // 172.3 s -> 129.9 s on the same box, methodology unchanged.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++ sys.env.get("SPARK_GRAFT_JAVA_OPTS").map(_.split(" ").toSeq).getOrElse(Seq.empty)
