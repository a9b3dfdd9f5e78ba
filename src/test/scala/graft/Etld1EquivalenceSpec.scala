package graft

import org.apache.spark.sql.functions._
import graft.operators.Urls

/** The native Etld1 expression must be BYTE-IDENTICAL to the unrolled
  * CASE chain it replaced (q249/q253/q255/q261-q267's oracles replay the
  * chain's decision procedure in SQL, so any drift breaks those rows):
  * compared here over every PSL fixture shape, the crawl fixtures'
  * hosts, and the degenerate inputs the chain's guards handle. */
class Etld1EquivalenceSpec extends SparkSpec {
  import spark.implicits._

  // the pre-r15 path, forced: a COPY of TrimmedPsl is a different
  // reference, so etld1OfPsl takes the CASE-chain branch
  private val chainPsl = Urls.TrimmedPsl.copy()

  test("native ≡ unrolled chain on every fixture shape") {
    val fixture = Urls.synthPslHosts(spark.range(2000).toDF("event_id"))
    val both = fixture.select(col("host"),
        Urls.etld1Of(col("host")).as("native"),
        Urls.etld1OfPsl(col("host"), chainPsl).as("chain"))
    assert(both.filter(!(col("native") <=> col("chain"))).count() === 0L)
  }

  test("native ≡ chain on degenerate and adversarial hosts") {
    val hosts = Seq(
      "10.0.0.7", "10.0.0.7\n",        // IP-like incl. the \z newline case
      "", ".", "..", "a.", ".a",       // empty labels, trailing/leading dots
      "localhost", "ck", "www.ck",     // bare labels, exception host itself
      "shop.ck", "a.shop.ck",          // wildcard at and above suffix length
      "city.kawasaki.jp", "x.city.kawasaki.jp", "blog.kawasaki.jp",
      "kawasaki.jp", "jp",             // exception parents and bare TLDs
      "example.co.uk", "deep.sub.example.co.uk",
      "co.uk", "uk",                   // host IS a public suffix / bare TLD
      "x.np", "np", "a.b.c.d.e.f.g"    // bare wildcard ccTLD, deep chain
    ).toDF("host")
    val both = hosts.select(col("host"),
        Urls.etld1Of(col("host")).as("native"),
        Urls.etld1OfPsl(col("host"), chainPsl).as("chain"))
      .collect()
    both.foreach { r =>
      assert(Option(r.getString(1)) === Option(r.getString(2)),
        s"host '${r.getString(0).replace("\n", "\\n")}'")
    }
    // NULL propagates on both paths
    val n = spark.range(1).select(
      Urls.etld1Of(lit(null).cast("string")).as("native"),
      Urls.etld1OfPsl(lit(null).cast("string"), chainPsl).as("chain"))
      .collect().head
    assert(n.isNullAt(0) && n.isNullAt(1))
    // SQL registration
    assert(spark.sql("SELECT etld1('deep.sub.example.co.uk')")
      .collect().head.getString(0) === "example.co.uk")
  }

  test("the link-edge aggregate stage keeps whole-stage codegen (the r15 fix)") {
    // two walks fused into one aggregate stage — the shape that blew
    // janino with the unrolled chain; with the native expression the
    // executed plan must contain NO codegen-disabled fallback marker
    val docs = operators.Html.synthLinkedDocs(spark.range(500).toDF("doc_id"))
    val edges = operators.Html.linkEdges(docs)
    edges.collect() // execute so AQE finalizes and codegen decisions land
    val full = edges.queryExecution.executedPlan.toString
    assert(full.contains("isFinalPlan=true"), "inspect the EXECUTED plan")
    // AQE's toString appends the pre-execution "Initial Plan" section,
    // whose nodes are never starred — judge only the FINAL plan
    val plan = full.split("\\+- == Initial Plan ==")(0)
    assert(plan.contains("etld1"), "the native expression is in the plan")
    // the disabled marker is the bare (no-star) HashAggregate over the
    // etld1 projection; with codegen intact every aggregate is starred
    val aggLines = plan.split("\n").filter(_.contains("HashAggregate"))
    assert(aggLines.nonEmpty && aggLines.forall(_.contains("*")),
      s"every aggregate stage must stay inside whole-stage codegen:\n$plan")
  }
}
