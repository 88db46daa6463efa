ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "creekspark"
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
// r17: the driver's verification gate killed `sbt test` after ~65 min in
// round 16 (14 suites run SEQUENTIALLY in one forked JVM) and the oracle
// gate never ran. Group the suites into independent forked JVMs and run
// the groups concurrently: same tests, same per-JVM isolation (each group
// gets its own SparkSession at local[4]; temp dirs are per-test, the
// Thrift suite picks a free port, no Hive/derby metastore is used), a
// fraction of the wall time on this 32-core box. The two monster suites
// (PipelineSpec 3.2k lines, RelationalSpec 2.4k lines) each get a
// dedicated JVM; small/pure suites share one.
val testGroupOf: String => Int = Map(
  "graft.PipelineSpec"   -> 0,
  "graft.RelationalSpec" -> 1,
  "graft.CdcSpec"        -> 2,
  "graft.StreamingSpec"  -> 3,
  "graft.SourcesSpec"    -> 4,
  "graft.CodecPropertySpec" -> 2,
  "graft.ApplyPropertySpec" -> 3,
  "graft.JdbcNetSpec"    -> 4,
).withDefaultValue(5)
Test / testGrouping := {
  val opts = (Test / javaOptions).value.toVector
  (Test / definedTests).value
    .groupBy(t => testGroupOf(t.name))
    .toSeq.sortBy(_._1)
    .map { case (g, ts) =>
      Tests.Group(s"group$g", ts,
        Tests.SubProcess(ForkOptions().withRunJVMOptions(opts)))
    }
}
// sbt's default restriction caps concurrent forked test groups at ONE;
// lift it so the groups actually run in parallel (6 JVMs x local[4]
// threads + 8g heap each fits the 32-core / 128 GiB box comfortably).
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 6),
  Tags.limitAll(12),
)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
