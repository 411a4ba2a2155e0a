package graft

import java.nio.file.{Files, Path}
import graft.api.{CdcEngine, SinnerPatch}
import graft.store.{MiniRespServer, RedisStore}

/** One-command acceptance path for the full CDC → invalidate → rebuild
  * loop against a REAL RESP2 cache tier, including a forked-JVM restart
  * mid-stream — the end-to-end shape the reference runs as
  * app + Redis + Kafka consumer under a supervisor (`main.go`,
  * `queue/runner.go:11-35`), compressed into `sbt "runMain
  * graft.AcceptanceDemo"`:
  *
  *  1. engine CRUD with read-through fills and CDC invalidation, every
  *     SET/GET/DEL crossing a real socket (RESP2 wire protocol);
  *  2. the streaming invalidation consumer run as TWO child JVM
  *     lifetimes sharing one checkpoint — the second lifetime resumes
  *     from committed offsets and must not re-DEL keys the cache
  *     re-filled in between (the no-reprocessing half of O-15/O-16).
  *
  * Exits non-zero (require) on any contract violation, so this doubles
  * as a CI acceptance gate.
  */
object AcceptanceDemo {

  /** Same JDK-17 module opens the parent runs with (build.sbt). */
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def runLifetime(input: Path, ckpt: Path, host: String, port: Int): Long = {
    val java = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val cmd = Seq(java) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false", "-cp", cp,
      "graft.streaming.InvalidationRestartMain",
      input.toString, ckpt.toString, host, port.toString)
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val log = new String(p.getInputStream.readAllBytes())
    val code = p.waitFor()
    require(code == 0, s"child JVM exited $code:\n${log.takeRight(3000)}")
    """"inputRows":\s*(\d+)""".r.findFirstMatchIn(log)
      .map(_.group(1).toLong)
      .getOrElse(sys.error(s"child wrote no inputRows line:\n${log.takeRight(3000)}"))
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(cpus = "4", logLevel = "ERROR")
    val resp = new MiniRespServer
    val store = new RedisStore("127.0.0.1", resp.port)
    try {
      // ---- [A] engine loop over the RESP2 wire ----
      val engine = new CdcEngine(store)
      engine.createOne(14, "Deren", "S", Some("Fraud"), Some("Fury"))
      engine.createOne(17, "Shalom", "S", Some("Sloth"), Some("Reticle"))
      require(engine.readOne(14).isRight && store.size == 1,
        "read-through fill must SET exactly the read key")
      println(s"[A1] cache miss -> read-through SET over RESP2; DBSIZE=${store.size}")
      engine.updateOne(14, SinnerPatch(tendency = Some("Wrath")))
      val n = engine.processCdc(spark)
      require(n == 1 && store.size == 0, s"CDC pass must DEL the updated key (deleted=$n)")
      println(s"[A2] update -> CDC invalidation DELs over RESP2; DBSIZE=${store.size}")
      val rebuilt = engine.readOne(14)
      require(rebuilt.exists(_.tendency.contains("Wrath")) && store.size == 1,
        s"rebuild-on-read must refill the fresh row: $rebuilt")
      println(s"[A3] rebuild on read refills the cache; tendency=${rebuilt.toOption.flatMap(_.tendency).get}")

      // ---- [B] streaming consumer across a forked-JVM restart ----
      val root = Files.createTempDirectory("graft-acceptance")
      val input = Files.createDirectory(root.resolve("input"))
      val ckpt = root.resolve("ckpt")
      // lifetime-1 workload: the engine's own change log for updates to
      // keys 14 and 17 (real envelopes, same schema the reference emits);
      // drain first so phase A's envelopes don't leak into the stream
      engine.createOne(5, "Augustus", "S", Some("War"), Some("Reticle"))
      engine.drainChangeLog()
      engine.updateOne(14, SinnerPatch(`class` = Some("A")))
      engine.updateOne(17, SinnerPatch(`class` = Some("A")))
      Files.writeString(input.resolve("batch1.jsonl"),
        engine.drainChangeLog().mkString("", "\n", "\n"))
      store.put("14", "stale-14"); store.put("17", "stale-17"); store.put("5", "fresh-5")
      val rows1 = runLifetime(input, ckpt, "127.0.0.1", resp.port)
      require(store.get("14").isEmpty && store.get("17").isEmpty,
        "lifetime 1 must DEL both updated keys")
      require(store.get("5").contains("fresh-5"), "untouched key must survive lifetime 1")
      println(s"[B1] lifetime 1 consumed $rows1 envelope(s), DEL'd keys 14,17; 5 survives")

      // cache refills between process lifetimes (rebuild-on-read)
      store.put("14", "rebuilt-14"); store.put("17", "rebuilt-17")
      engine.updateOne(5, SinnerPatch(tendency = Some("Gloom")))
      Files.writeString(input.resolve("batch2.jsonl"),
        engine.drainChangeLog().mkString("", "\n", "\n"))
      val rows2 = runLifetime(input, ckpt, "127.0.0.1", resp.port)
      require(store.get("5").isEmpty, "lifetime 2 must DEL the newly updated key")
      require(store.get("14").contains("rebuilt-14") && store.get("17").contains("rebuilt-17"),
        "lifetime 2 resumed from committed offsets and must NOT re-DEL rebuilt keys")
      require(rows2 < rows1 + 2, s"lifetime 2 must consume only the new batch (got $rows2)")
      println(s"[B2] restarted JVM consumed $rows2 new envelope(s); rebuilt keys survive " +
        "(offsets committed, no reprocessing)")
      println("[OK] acceptance path green: CRUD read-through, CDC invalidation, " +
        "rebuild, and a checkpointed restart over a live RESP2 socket")
    } finally {
      store.close(); resp.close(); spark.stop()
    }
  }
}
