package graft

import scala.collection.concurrent.TrieMap
import graft.plans.JdbcStarSink
import graft.plans.JdbcStarSink.{SqlExecutor, Upsert}

/** JDBC mirror semantics without a database: statement generation matches
  * the reference's ON CONFLICT shape, and pushes through an in-memory
  * executor (local-mode executors share the JVM) behave as idempotent
  * insert-or-update on the conflict key. */
object InMemoryMirror {
  // (table, key) -> attr values; shared across local executor threads
  val rows = new TrieMap[(String, String), Seq[Any]]()
  var batches = new java.util.concurrent.atomic.AtomicInteger(0)

  class Executor extends SqlExecutor {
    def executeBatch(sql: String, it: Iterator[Seq[Any]]): Unit = {
      InMemoryMirror.batches.incrementAndGet()
      val table = sql.split("\\s+")(2)
      val nKeys = JdbcStarSink.starUpserts.find(_.table == table).get.keyCols.size
      it.foreach { r =>
        val (k, attrs) = r.splitAt(nKeys)
        InMemoryMirror.rows.put((table, k.mkString("|")), attrs) // ON CONFLICT DO UPDATE
      }
    }
  }
}

class JdbcStarSinkSpec extends SparkSpec {
  import spark.implicits._

  test("upsert statements mirror the reference's ON CONFLICT DO UPDATE shape") {
    val cust = JdbcStarSink.starUpserts.find(_.table == "dw.dim_customer").get
    assert(JdbcStarSink.upsertSql(cust) ===
      "INSERT INTO dw.dim_customer (source_customer_id, customer_name, country, age, email) " +
        "VALUES (?, ?, ?, ?, ?) ON CONFLICT (source_customer_id) DO UPDATE SET " +
        "customer_name = EXCLUDED.customer_name, country = EXCLUDED.country, " +
        "age = EXCLUDED.age, email = EXCLUDED.email")
    val fact = JdbcStarSink.starUpserts.find(_.table == "dw.fact_sales").get
    assert(JdbcStarSink.upsertSql(fact).startsWith(
      "INSERT INTO dw.fact_sales (source_sale_id, customer_key"))
    assert(JdbcStarSink.upsertSql(fact).contains("ON CONFLICT (source_sale_id) DO UPDATE"))
  }

  test("push is a partition-batched idempotent upsert (insert then update)") {
    InMemoryMirror.rows.clear()
    InMemoryMirror.batches.set(0)
    val u = Upsert("dw.dim_store", Seq("store_name"), Seq("city", "country", "email"))

    val v1 = Seq(("S1", "Berlin", "DE", "a@x"), ("S2", "Paris", "FR", "b@x"))
      .toDF("store_name", "city", "country", "email").repartition(2)
    JdbcStarSink.push(v1, u, new InMemoryMirror.Executor)
    assert(InMemoryMirror.rows.size === 2)
    assert(InMemoryMirror.rows(("dw.dim_store", "S1")) === Seq("Berlin", "DE", "a@x"))
    // batching shape: one executor batch per non-empty partition, not per row
    assert(InMemoryMirror.batches.get() <= 2)

    // conflicting key -> update attrs; new key -> insert; replay converges
    val v2 = Seq(("S1", "Hamburg", "DE", "a@x"), ("S3", "Rome", "IT", "c@x"))
      .toDF("store_name", "city", "country", "email")
    JdbcStarSink.push(v2, u, new InMemoryMirror.Executor)
    JdbcStarSink.push(v2, u, new InMemoryMirror.Executor) // idempotent replay
    assert(InMemoryMirror.rows.size === 3)
    assert(InMemoryMirror.rows(("dw.dim_store", "S1")) === Seq("Hamburg", "DE", "a@x"))
    assert(InMemoryMirror.rows(("dw.dim_store", "S2")) === Seq("Paris", "FR", "b@x"))
    assert(InMemoryMirror.rows(("dw.dim_store", "S3")) === Seq("Rome", "IT", "c@x"))
  }
}
