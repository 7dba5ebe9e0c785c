ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datawarehouseandbidashboardsforiowaalcoholicbeveragesdivisionspark"
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
  // local[32] runs driver + all 32 executor threads in ONE heap; at 8g
  // the unified pool (~4.6g) thrashes under an 82-query suite — heavy
  // queries measured 2-3× their isolated times purely from GC pressure.
  // Size like a real 32-core executor instead (host has 128 GiB).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // Pin the initial heap to the max: a stop-the-world full GC (the
  // bench's between-query drain) otherwise UNCOMMITS heap back toward
  // the small default -Xms, and every allocation-heavy query after it
  // pays a re-expansion GC storm (measured: q23 gc_ms 0.5 s → 7.8 s,
  // median 4.9 s → 20.8 s, purely from heap shrink/regrow cycles).
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // NOTE: the bench's between-query System.gc() drain must stay
  // stop-the-world (no -XX:+ExplicitGCInvokesConcurrent): a concurrent
  // drain cycle steals executor cores INSIDE the next query's timed
  // region — measured as scattered 3-6× per-query outliers with near-zero
  // recorded pause time. The full GC is untimed and fast (small live set).
  //
  // An 82-query suite × 4 runs of whole-stage codegen emits thousands of
  // generated classes; at the JVM's 240 MB default the JIT code cache
  // fills mid-suite, C2 stops compiling, and every query AFTER that point
  // runs partly interpreted — observed as 3-6× inflation of whichever
  // queries happen to follow the fill point (run-to-run nondeterministic).
  "-XX:ReservedCodeCacheSize=1g",
)
