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
  // Shuffle writer selection (r7, guide §2.1/§7): with R reduce partitions
  // at or below this threshold and no map-side combine, Spark picks the
  // bypass-merge writer, which opens R partition files PER MAP TASK before
  // concatenating them. At shuffle.partitions=32 that is ~35 file
  // creates/commits per mapper — jstack-profiled at >90% of executor time
  // on the 128-mapper narrow stages (write0/open0/map0), ~200ms/task
  // against <5ms of real shuffle bytes. Above the threshold the serialized
  // (tungsten-sort) writer writes ONE data+index file per mapper. Keep
  // bypass only for single-partition exchanges (count/collect funnels,
  // R=1, where it is a single append stream and the serialized writer's
  // per-task page allocation is pure overhead). Cluster scale: R > 200
  // disables bypass by default anyway, so this is a no-op there — the
  // setting only corrects the small-R local regime the driver benches.
  "-Dspark.shuffle.sort.bypassMergeThreshold=2",
  // AQE coalescing floor (r7, guide §2.2/§2.5): coalescing is BYTES-based,
  // but several contract stages are CPU-dense over narrow fixed-width rows
  // (LSH bucket pair expansion + hamming/jaccard verify, window ranking) —
  // a 0.5 MB shuffle can carry 10⁵ rows each fanning into C(k,2) work, and
  // the default 1 MB floor collapses exactly those stages to ONE task
  // (measured: doc_simhash_pairs' verify stage 403 ms serial, 32 cores
  // idle). 64k keeps byte-tiny reduces coalesced (a 10 KB agg still folds
  // to one task) while letting row-dense stages keep parallelism. Scale:
  // this only LOWERS the coalesce floor — at cluster scale partitions are
  // sized by advisoryPartitionSizeInBytes/skew handling and sit far above
  // either floor, so the setting is inert there; it corrects the
  // bytes-as-cost-proxy error only where bytes are small.
  "-Dspark.sql.adaptive.coalescePartitions.minPartitionSize=64k",
) ++ {
  val extra = sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq.flatMap(_.split(" ").filter(_.nonEmpty))
  // default to the throughput collector unless the caller picked a GC
  (if (extra.exists(_.contains("GC"))) Seq.empty else Seq("-XX:+UseParallelGC")) ++ extra
}
