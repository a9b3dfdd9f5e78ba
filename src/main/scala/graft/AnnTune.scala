package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Recall tuner for the IVF index: measures recall@k of candidate
  * (nCells, nProbe, lloydIters) configurations against the brute-force
  * oracle at a FIXED candidate budget (nProbe/nCells = constant fraction of
  * the corpus scanned per query). Used to pick q33's configuration; the
  * AnnRecallSpec thresholds come from these numbers.
  *
  * Usage: runMain graft.AnnTune [sfDir]
  */
object AnnTune {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.local("graft-ann-tune")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 32)
    val k = 10

    def sets(df: DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }

    val exact = sets(Similarity.knnBruteForce(queries, emb, k))
    def recall(approx: Map[Long, Set[Long]]): Double = {
      val per = exact.map { case (q, truth) =>
        approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
      }
      per.sum / per.size
    }

    // granularity sweep at fixed budget: nProbe/nCells = 1/8 per query
    for ((cells, probe) <- Seq((16, 2), (32, 4), (64, 8), (128, 16))) {
      val seeded = recall(sets(Similarity.annIvf(queries, emb, k, cells, probe)))
      val cents = Similarity.trainIvfCentroids(emb, cells, iters = 2)
      val lloyd = recall(sets(Similarity.annIvfWith(cents, queries, emb, k, probe)))
      println(f"[anntune] cells=$cells%4d probe=$probe%3d budget=1/8  seeded=$seeded%.3f lloyd2=$lloyd%.3f")
    }
    // budget sweep at the best granularity (32 cells): what does 0.9 cost?
    val cents5 = Similarity.trainIvfCentroids(emb, 32, iters = 5)
    for (probe <- Seq(4, 6, 8, 10, 12)) {
      val seeded = recall(sets(Similarity.annIvf(queries, emb, k, 32, probe)))
      val lloyd = recall(sets(Similarity.annIvfWith(cents5, queries, emb, k, probe)))
      println(f"[anntune] cells=  32 probe=$probe%3d budget=$probe%d/32 seeded=$seeded%.3f lloyd5=$lloyd%.3f")
    }
    spark.stop()
  }
}
