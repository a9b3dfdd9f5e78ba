package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** TextAnalysis.logisticTrainHashed / logisticScore / logisticGateAudit:
  * learning behavior and fixture-gate geometry the q292/q293 oracles
  * replay but do not interpret. */
class LogisticSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    TextAnalysis.synthQualityDocs((0L until 64L).toDF("doc_id"), "doc_id")

  test("fixture gate geometry: pass/fail by mode exactly as designed") {
    val g = docs.select(col("doc_id"),
        (TextAnalysis.qualityScore(col("text"), length(col("text"))) >= 50)
          .cast("long").as("gate"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 64L).foreach { id =>
      val expect = (id % 4) match {
        case 0 => 1L; case 1 => 0L; case 2 => 0L; case _ => 1L
      }
      assert(g(id) === expect, s"id $id mode ${id % 4}")
    }
  }

  test("5 GD rounds separate the vocabularies: full accuracy, gate blind spot caught") {
    val w = TextAnalysis.logisticTrainHashed(docs, "label", dims = 64)
    val scored = TextAnalysis.logisticScore(docs, w, dims = 64)
      .join(docs.select(col("doc_id"), col("label")), Seq("doc_id"))
    val n = scored.count()
    val correct = scored.filter(col("lr_pred") === col("label")).count()
    assert(n === 64L)
    assert(correct === 64L, s"accuracy ${correct}/64 — vocabularies separate")
    // the m3 lottery spam the GATE passes must be mostly caught by the
    // supervised model (the reason it exists)
    val m3 = scored.filter(pmod(col("doc_id"), lit(4)) === 3)
    val m3Caught = m3.filter(col("lr_pred") === 0).count()
    assert(m3Caught >= 12L, s"$m3Caught/16 lottery docs classified bad")
  }

  test("weights frame: bias at -1, observed buckets only, zeros never minted") {
    val w = TextAnalysis.logisticTrainHashed(docs, "label", dims = 64)
    assert(w.filter(col("feature_ix") === -1L).count() === 1L)
    assert(w.count() <= 65L, "bounded by dims + bias")
    // determinism: a second train is bit-identical
    val w2 = TextAnalysis.logisticTrainHashed(docs, "label", dims = 64)
    assert(w.orderBy("feature_ix").collect().toSeq ===
      w2.orderBy("feature_ix").collect().toSeq)
  }

  test("audit cells partition the corpus and count it exactly") {
    val audit = TextAnalysis.logisticGateAudit(docs, "label", dims = 64)
      .collect()
    assert(audit.map(_.getAs[Long]("n_docs")).sum === 64L)
    assert(audit.forall(r => Set(0L, 1L)(r.getAs[Long]("label")) &&
      Set(0L, 1L)(r.getAs[Long]("lr_pred")) &&
      Set(0L, 1L)(r.getAs[Long]("gate_pred"))))
  }
}
