package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession recipe for every driver-contract main (Verify, Bench,
  * TimeQuery, Explain, Demo). The mains must agree on session config for
  * their dumps/timings to be comparable — three hand-copied builder blocks
  * had already drifted on defaults before this existed.
  */
object Sessions {
  def local(cpus: String, logLevel: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // first session of the JVM exercises the extensions injection path
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel(logLevel)
    spark
  }

  /** cpus from SPARK_GRAFT_CPUS with a per-main default. */
  def localFromEnv(defaultCpus: String, logLevel: String): SparkSession =
    local(sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus), logLevel)
}
