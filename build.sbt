ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "promhousespark"
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
// Suites run PARALLEL in the forked JVM on purpose: serializing them
// (Test/parallelExecution := false) would roughly double the ~35 min
// wall time to dodge flakes that were really shared-global asserts.
// The contract instead: suites share one SparkContext, so a test may
// only assert on state it OWNS (its temp dir, its cache entry, its
// frame's storageLevel) — never on global counts like
// getPersistentRDDs.size (the r15 flake class, fixed r16). Genuinely
// timing-based asserts use min-of-3.
// Durable per-run test reports: the default target/test-reports is
// clobbered by every run — which is how the name of a 1-in-269 failing
// test was lost in r14 (the isolated rerun overwrote the failing run's
// XML before anyone read it). The archive dir is picked in doInit —
// PER TEST EXECUTION, not at sbt load time — so two runs inside one
// interactive sbt session land in two dirs and a rerun can never
// overwrite the failing run's XML (r15 ADVICE: a load-time timestamp
// only protected fresh sbt processes). Prune
// target/test-reports-archive manually.
Test / testListeners += new sbt.TestsListener {
  // The delegate is constructed LAZILY on first use (not only in doInit):
  // an sbt path that skips doInit would otherwise drop every event
  // silently — an empty report archive with no error, the exact
  // evidence-loss mode this listener exists to close (r16 ADVICE).
  // doComplete clears it so the next execution in the same sbt session
  // still gets its own timestamped dir.
  private var delegate: Option[sbt.JUnitXmlTestsListener] = None
  private def get(): sbt.JUnitXmlTestsListener = synchronized {
    delegate.getOrElse {
      val d = new sbt.JUnitXmlTestsListener(
        "target/test-reports-archive/" +
          java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd-HHmmss")
            .format(java.time.LocalDateTime.now()))
      d.doInit()
      delegate = Some(d)
      d
    }
  }
  def doInit(): Unit = { get(); () }
  def doComplete(finalResult: sbt.protocol.testing.TestResult): Unit =
    synchronized { delegate.foreach(_.doComplete(finalResult)); delegate = None }
  def startGroup(name: String): Unit = get().startGroup(name)
  def testEvent(event: sbt.TestEvent): Unit = get().testEvent(event)
  def endGroup(name: String, t: Throwable): Unit = get().endGroup(name, t)
  def endGroup(name: String, result: sbt.protocol.testing.TestResult): Unit =
    get().endGroup(name, result)
}
// Pass the forked program's stdout through unprefixed: the bench/verify
// drivers parse the process output (one JSON line), and sbt's default
// logger strategy wraps every line in "[info] " which breaks that.
run / outputStrategy := Some(StdoutOutput)
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
