package graft

import graft.sources.SalesFeed
import graft.streaming.ErrorChannel

/** S2 producer entry point — the reference's `csv_to_kafka.py` as a Spark
  * job: read the CSV feed (sorted glob, BOM/multiline tolerant), serialize
  * one JSON message per row, and send to Kafka — or, with no broker
  * configured, write the Kafka-shaped messages as JSON-lines files so the
  * rest of the pipeline (and the sandbox) can consume the identical
  * payload (reference: producer/csv_to_kafka.py:14-39).
  *
  * Usage: runMain graft.RunProducer <csvGlob> <topicOrOutDir>
  *   GRAFT_KAFKA_BOOTSTRAP set   → kafka topic <topicOrOutDir>
  *   GRAFT_KAFKA_BOOTSTRAP unset → JSONL files under <topicOrOutDir>
  */
object RunProducer {
  def main(args: Array[String]): Unit = {
    val Array(glob, dest) = args.take(2)
    val spark = GraftSession.local("graft-producer")
    val feed = SalesFeed.readCsv(spark, glob)
      .drop("_seq", ErrorChannel.corruptCol)
    val n = feed.count()
    sys.env.get("GRAFT_KAFKA_BOOTSTRAP") match {
      case Some(bootstrap) =>
        SalesFeed.writeToKafka(feed, bootstrap, dest)
        println(s"[producer] sent $n messages to kafka topic '$dest'")
      case None =>
        SalesFeed.toKafkaMessages(feed)
          .write.mode("overwrite").text(dest)
        println(s"[producer] wrote $n JSON messages to $dest")
    }
    spark.stop()
  }
}
