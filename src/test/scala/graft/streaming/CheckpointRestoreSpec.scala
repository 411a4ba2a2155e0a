package graft.streaming

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite

/** O-15/O-16 across a REAL process boundary: two separate JVM lifetimes
  * share one checkpoint directory. SupervisionSpec covers in-JVM query
  * restart; this proves the durable half of the contract — a recreated
  * engine process resumes from committed offsets (no reprocessing) with its
  * aggregation state intact (no data loss), which is exactly what the
  * reference's supervisor + consumer-group offsets provide across process
  * deaths (queue/runner.go:11-35, queue/cdc.go:62-92).
  */
class CheckpointRestoreSpec extends AnyFunSuite {

  /** Same JDK-17 module opens the outer test JVM runs with (build.sbt). */
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def launchChild(inputDir: Path, ckptDir: Path, outFile: Path): Unit = {
    val java = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val cmd = Seq(java) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-cp", cp, "graft.streaming.CheckpointRestoreMain",
      inputDir.toString, ckptDir.toString, outFile.toString)
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
    val p = pb.start()
    val log = new String(p.getInputStream.readAllBytes())
    val code = p.waitFor()
    assert(code == 0, s"child JVM exited $code:\n${log.takeRight(3000)}")
    assert(Files.exists(outFile), s"child wrote no output:\n${log.takeRight(3000)}")
  }

  private def parse(outFile: Path): (Long, Map[String, Long]) = {
    val s = Files.readString(outFile)
    val inputRows = """"inputRows":\s*(\d+)""".r.findFirstMatchIn(s).get.group(1).toLong
    val totals = """"([a-z]+)":\s*(\d+)""".r.findAllMatchIn(s)
      .filter(_.group(1) != "inputRows")
      .map(m => m.group(1) -> m.group(2).toLong).toMap
    (inputRows, totals)
  }

  test("offsets and aggregation state survive a full JVM restart") {
    val root = Files.createTempDirectory("graft-ckpt-restore")
    val input = Files.createDirectory(root.resolve("input"))
    val ckpt = root.resolve("ckpt")

    // Lifetime 1: two files, keys a and b.
    Files.writeString(input.resolve("batch1.json"),
      """{"key":"a","value":1}
        |{"key":"a","value":2}
        |{"key":"b","value":10}
        |""".stripMargin)
    Files.writeString(input.resolve("batch2.json"),
      """{"key":"b","value":20}
        |{"key":"a","value":4}
        |""".stripMargin)
    val out1 = root.resolve("out1.json")
    launchChild(input, ckpt, out1)
    val (rows1, totals1) = parse(out1)
    assert(rows1 == 5, s"lifetime 1 should read all 5 rows, got $rows1")
    assert(totals1 == Map("a" -> 7L, "b" -> 30L), s"got $totals1")

    // Between lifetimes: one new file touching existing key a + new key c.
    Files.writeString(input.resolve("batch3.json"),
      """{"key":"a","value":100}
        |{"key":"c","value":5}
        |""".stripMargin)

    // Lifetime 2: brand-new JVM, same checkpoint.
    val out2 = root.resolve("out2.json")
    launchChild(input, ckpt, out2)
    val (rows2, totals2) = parse(out2)
    // Offset resume: ONLY the new file's rows are read — nothing reprocessed.
    assert(rows2 == 2, s"lifetime 2 must read only the 2 new rows, got $rows2")
    // State resume: a's total includes lifetime-1 contributions (7 + 100).
    assert(totals2.get("a").contains(107L), s"state lost across restart: $totals2")
    assert(totals2.get("c").contains(5L), s"new key missing: $totals2")
    // b untouched in lifetime 2 ⇒ not in update-mode output (state intact but not re-emitted).
    assert(!totals2.contains("b"), s"untouched key re-emitted (state reprocessed?): $totals2")
  }
}
