ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "elastiknnspark"
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
// local mode = driver-only JVM: the heap is the whole cluster's memory.
// SPARK_DRIVER_MEM may be set very large by the invoking harness — CAP it:
// round 3 combined that (~90g) with -Xms + AlwaysPreTouch, which made the
// entire heap resident at JVM start and got the bench run OOM-killed (exit
// 137) before it recorded anything. 24g is ample for every surface here
// (the sf0.1 query sweep ran inside 16g in rounds 1-2), heap pages are
// committed lazily, and the bench's measured pipeline runs happen in child
// JVMs that manage their own (per-core-scaled, lazily grown) heaps.
val forkHeapGb: Int = {
  // accepts every spelling -Xmx does: t/g/m/k suffix, or a plain number
  // of BYTES (a suffix-less JVM memory operand is bytes — treating it as
  // GB would Int-wrap and clamp a 16 GiB request to the 4g floor)
  val req = sys.env.getOrElse("SPARK_DRIVER_MEM", "16g").trim.toLowerCase
  val suffixless = req.nonEmpty && !"tgmk".contains(req.last)
  val gb = scala.util.Try {
    if (req.endsWith("t")) req.dropRight(1).toDouble * 1024.0
    else if (req.endsWith("g")) req.dropRight(1).toDouble
    else if (req.endsWith("m")) req.dropRight(1).toDouble / 1024.0
    else if (req.endsWith("k")) req.dropRight(1).toDouble / (1024.0 * 1024.0)
    else req.toDouble / (1024.0 * 1024.0 * 1024.0)
  }.getOrElse(16.0)
  // a suffix-less value like "16" means 16 BYTES (JVM memory-operand
  // semantics), which lands on the 4g floor — almost certainly the caller
  // meant "16g"; warn loudly instead of silently under-provisioning
  if (suffixless && gb < 4.0)
    System.err.println(
      s"[build.sbt] SPARK_DRIVER_MEM='$req' is suffix-less and therefore BYTES " +
        f"(= $gb%.2g GiB) — clamping to the 4g floor. If you meant gigabytes, pass '${req}g'.")
  math.max(4, math.min(24.0, gb.ceil).toInt)
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${forkHeapGb}g",
  "-Xms2g",
)
