package graft

import org.apache.spark.sql.SparkSession

/** Per-query timing probe: `runMain graft.TimeQuery <name> [sfDir] [runs]`.
  * Prints each run's wall time (run 1 = cold JVM+cache, later runs warm),
  * which the aggregate Bench medians hide — useful when chasing one query.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = Sessions.localFromEnv(defaultCpus = "32", logLevel = "ERROR")
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
