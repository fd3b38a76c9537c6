ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sales_agent_graphdbspark"
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
// Heap is PINNED (-Xms = -Xmx) and pre-touched (r12, measured): with a
// growable heap, G1's adaptive commit/uncommit churn on this kernel
// generates hundreds of millions of minor page faults that serialize
// every executor thread on in-kernel mmu work (observed 97% SYSTEM cpu,
// 230M minflt in 2 min) — allocation-heavy queries ran 4-30× slow with
// wild variance (sf10 q1: 14-126 s unpinned vs 3.7 s pinned). Pre-touch
// pays a one-time startup cost proportional to the heap and keeps
// first-touch faults out of the measurements.
javaOptions ++= jdk17AddOpens ++ {
  val mem = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")
  Seq(
    "-Dspark.ui.enabled=false",
    "-Dspark.sql.session.timeZone=UTC",
    s"-Xms$mem", s"-Xmx$mem", "-XX:+AlwaysPreTouch",
  )
}
