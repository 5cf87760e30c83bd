ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "flinkconnectorhttpspark"
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
// Heap sizing: cap at 31g even when SPARK_DRIVER_MEM asks for more — above
// ~31g the JVM loses compressed oops (every reference doubles) and this
// workload's working set never approaches that; and commit the whole heap
// up front (-Xms=-Xmx + AlwaysPreTouch). A lazily committed large heap
// stalls mutator threads on first-touch page faults as G1 grows/shrinks the
// committed region — measured on BENCH_r04: random queries absorbed
// multi-second stalls at a 96g heap (q04 22.9s vs 1s steady-state), GC logs
// showed <3.5s total pauses, and pre-touching removed the stalls entirely.
val graftHeap: String = {
  val req = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g").trim.toLowerCase
  val m = "^(\\d+)([gm])$".r
  req match {
    case m(n, "g") if n.toLong > 31 => "31g"
    case m(_, _) => req
    case _ => "8g"
  }
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$graftHeap",
  s"-Xms$graftHeap",
  "-XX:+AlwaysPreTouch",
  // This sandbox's guest memory is demand-paged by the host (measured
  // r7: first-touch 0.03-0.8 GB/s vs 13 GB/s resident; bench JVMs show
  // sys > user). THP-madvised pages fault ~2.3x faster here (measured
  // 0.80 -> 1.86 GB/s), and with AlwaysPreTouch the hugepage setup cost
  // lands in untimed startup. Harmless on hosts with THP=never.
  "-XX:+UseTransparentHugePages",
)
