package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.store.RedisStoreFactory

/** One "engine process lifetime" of the CDC invalidation consumer, as a
  * forked child JVM: read envelope records from a file stream, run
  * [[Pipeline.invalidationQuery]] (parse → keys → DEL) against a REAL
  * RESP2 cache tier, drain everything currently available, exit. The
  * parent (`graft.AcceptanceDemo`) launches this twice against one
  * checkpoint dir to prove the restart contract the reference's
  * supervisor + consumer-group offsets provide across process deaths
  * (`queue/runner.go:11-35`, `queue/cdc.go:62-92`): lifetime 2 resumes
  * from committed offsets and never re-DELs lifetime 1's keys.
  *
  * stdout contract: one line `{"inputRows": N}` — rows consumed THIS
  * lifetime.
  */
object InvalidationRestartMain {
  def main(args: Array[String]): Unit = {
    require(args.length == 4, s"usage: inputDir ckptDir host port (got ${args.mkString(" ")})")
    val Array(inputDir, ckptDir, host, portS) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-invalidation-lifetime")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val records = spark.readStream.text(inputDir).select(col("value"))
      val q = Pipeline.invalidationQuery(records,
        RedisStoreFactory(host, portS.toInt), ckptDir)
      q.processAllAvailable()
      val rows = q.recentProgress.map(_.numInputRows).sum
      q.stop()
      println(s"""{"inputRows": $rows}""")
    } finally spark.stop()
  }
}
