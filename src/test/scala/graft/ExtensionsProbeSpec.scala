package graft

import org.scalatest.funsuite.AnyFunSuite

/** Builder-time `spark.sql.extensions` injection, verified in a
  * DEDICATED JVM (the config only applies at session creation, so the
  * suites' shared session cannot exercise it). Reuses this test JVM's
  * classpath and --add-opens flags for the child. */
class ExtensionsProbeSpec extends AnyFunSuite {

  test("GraftExtensions registers every SQL function at session creation") {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    // --add-opens may arrive as one "--add-opens=..." token or as a
    // ("--add-opens", "pkg=ALL-UNNAMED") pair — keep the pair intact
    val raw = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString).toSeq
    val jvmArgs = raw.zipWithIndex.flatMap { case (a, i) =>
      if (a == "--add-opens" || a == "--add-exports") Seq(a, raw(i + 1))
      else if (a.startsWith("--add-opens=") || a.startsWith("--add-exports=")) Seq(a)
      else Nil
    }
    val cp = System.getProperty("java.class.path")
    val cmd = Seq(javaBin) ++ jvmArgs ++ Seq("-cp", cp, "graft.ExtensionsProbe")
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val rc = proc.waitFor()
    assert(rc === 0, s"probe JVM failed (rc=$rc):\n${out.takeRight(4000)}")
    assert(out.contains("EXTENSIONS_OK"), s"probe output:\n${out.takeRight(4000)}")
  }
}
