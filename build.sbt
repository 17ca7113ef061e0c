ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "rdfcityjsonspark"
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
// Forked `run` output goes straight to this process's stdout instead of the
// sbt logger: the Bench/Verify JSON contract lines must arrive WITHOUT an
// `[info] ` prefix or the driver's line-wise json parse misses them
// (BENCH_r01.json had "parsed": null for exactly this reason).
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
  // local-mode Spark = one JVM: the heap must absorb the allocation rate of
  // all executor threads. 8g is GC-bound at 32 cores (measured 3.7x slower
  // on the KG pipeline than 24g); the box has 125g. ParallelGC sustains the
  // pipeline's allocation rate far better than G1 on long runs (20M pages:
  // 94.6s G1/24g -> 20.3s ParallelGC/64g at 32 cores).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
) ++ {
  val extra = sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq.flatMap(_.split(" ").filter(_.nonEmpty))
  // default to the throughput collector unless the caller picked a GC
  (if (extra.exists(_.contains("GC"))) Seq.empty else Seq("-XX:+UseParallelGC")) ++ extra
}
