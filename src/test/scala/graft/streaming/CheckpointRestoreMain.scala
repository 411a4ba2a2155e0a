package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** Child-process entrypoint for [[CheckpointRestoreSpec]]: one JVM = one
  * "engine process lifetime". Runs a checkpointed streaming aggregation over
  * a JSON file source with Trigger.AvailableNow, then exits — the spec
  * launches it twice against the same checkpoint dir to prove offsets AND
  * state survive a real process restart (the level the reference's
  * supervisor actually operates at: runner.go restarts a dead consumer
  * process, queue/cdc.go:62-92 resumes from committed offsets).
  *
  * Writes `outFile` as one JSON object:
  * `{"inputRows": <rows read this lifetime>, "totals": {"<key>": <sum>}}`
  * where totals are the keys UPDATED this lifetime (update output mode) with
  * their full state-backed running sums.
  */
object CheckpointRestoreMain {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, s"usage: inputDir checkpointDir outFile (got ${args.mkString(" ")})")
    val Array(inputDir, ckptDir, outFile) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ckpt-restore-child")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try {
      val schema = new StructType().add("key", StringType).add("value", LongType)
      val in = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1") // several micro-batches per lifetime
        .json(inputDir)
      val agg = in.groupBy("key").agg(sum("value").as("total"))

      val totals = scala.collection.mutable.Map[String, Long]()
      var inputRows = 0L
      val q = agg.writeStream
        .outputMode("update")
        .option("checkpointLocation", ckptDir)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          batch.collect().foreach(r => totals(r.getString(0)) = r.getLong(1))
        }
        .start()
      q.awaitTermination()
      inputRows = q.recentProgress.map(_.numInputRows).sum

      val json = totals.toSeq.sorted
        .map { case (k, v) => s""""$k": $v""" }
        .mkString(s"""{"inputRows": $inputRows, "totals": {""", ", ", "}}")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json)
    } finally spark.stop()
  }
}
