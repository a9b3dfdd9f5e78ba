package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the BloomJoinRule envelope on its TARGET workload: an inner
  * equi-join whose build side survives its filters just over the
  * broadcast threshold (so Spark shuffles BOTH sides in full) and whose
  * probe side is wide and mostly non-matching — the shape where the
  * injected might_contain pre-filter cuts the probe exchange to
  * ~matching rows. Same query timed with the rule enabled and disabled
  * (the kill switch), min of `runs`, interleaved A/B so box drift hits
  * both legs equally.
  *
  * Usage: runMain graft.BloomRuleBench [probeRows] [buildRows] [runs]
  */
object BloomRuleBench {
  def main(args: Array[String]): Unit = {
    val probeRows = if (args.length > 0) args(0).toLong else 20000000L
    val buildRows = if (args.length > 1) args(1).toLong else 400000L
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // build side must be OVER the broadcast threshold: 512 KB forces
      // the shuffled-join regime the rule exists for
      .config("spark.sql.autoBroadcastJoinThreshold", (512 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftExtensions.register(spark)

    // ~1% of probe keys match a build key; a ~200-byte payload makes the
    // probe exchange the dominant cost, which is the claim under test
    val keySpace = buildRows * 100
    def probe = spark.range(probeRows).select(
      (col("id") % keySpace).as("k"),
      concat_ws("-", (0 until 12).map(i =>
        md5((col("id") + lit(i)).cast("string"))): _*).as("payload"))
    def build = spark.range(buildRows).select(
      (col("id") * 100).as("k"), md5(col("id").cast("string")).as("attr"))
    // sum(length(payload)) keeps the wide column ALIVE through the join's
    // exchange — a bare count would let Catalyst prune it and understate
    // the shuffled volume the pre-filter saves
    def query = probe.join(build, "k")
      .groupBy().agg(count(lit(1)).as("n"),
        sum(length(col("payload"))).as("payload_bytes"), count(col("attr")).as("m"))

    def timeLeg(enabled: Boolean): Double = {
      spark.conf.set("spark.graft.bloomJoinRule.enabled", enabled.toString)
      val t0 = System.nanoTime()
      query.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // interleave legs so machine drift lands on both equally
    val (on, off) = (Array.fill(runs)(0.0), Array.fill(runs)(0.0))
    timeLeg(true); timeLeg(false) // warm-up both paths, untimed
    for (r <- 0 until runs) { on(r) = timeLeg(true); off(r) = timeLeg(false) }
    spark.conf.set("spark.graft.bloomJoinRule.enabled", "true")
    val fires = query.queryExecution.optimizedPlan.toString.contains("might_contain")
    println(f"[bloomrulebench] probe=$probeRows%d build=$buildRows%d fires=$fires " +
      f"ruleOn=${on.min}%.2f s ruleOff=${off.min}%.2f s speedup=${off.min / on.min}%.2fx")
    spark.stop()
  }
}
