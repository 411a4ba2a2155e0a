package graft

import org.apache.spark.sql.SparkSession

/** Benchmark harness (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line
  * `{"metric":...,"value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Timing protocol (BASELINE.md): median of 3 warm-JVM runs per query after
  * one untimed warm-up pass of the whole suite (JIT + parquet footer cache).
  * Each run fully materializes the result through the noop sink — count()
  * would let Spark skip projections.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // driver heap comes from build.sbt's -Xmx${SPARK_DRIVER_MEM} javaOption;
    // setting spark.driver.memory here would be a no-op in local mode
    val spark = Sessions.localFromEnv(defaultCpus = "32", logLevel = "ERROR")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      // each invocation builds fresh DataFrames, so persists from earlier
      // runs are unreachable — drop them (in finally: a FAILING query's
      // blocks would otherwise stay pinned for every later run) or the
      // 4x55 runs accumulate dead cached blocks and late queries measure
      // memory pressure, not work
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      } finally spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach(runOnce) // warm-up pass, untimed
    val results = names.map { n =>
      val ts = (1 to 3).map(_ => runOnce(n)).sorted
      n -> ts(1) // median
    }
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // stdout is the driver contract (bare line — build.sbt routes forked run
    // output through StdoutOutput so sbt adds no "[info] " prefix); the file
    // copy is a fallback the driver (or a human) can read if stdout is ever
    // mangled by the launcher. Fixed name on purpose: interpreting a stray
    // positional arg as the write target would silently clobber that path.
    println(line)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_out.json"), line + "\n")
    spark.stop()
  }
}
