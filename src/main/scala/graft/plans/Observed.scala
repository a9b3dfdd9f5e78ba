package graft.plans

import org.apache.spark.sql.Observation
import org.apache.spark.sql.graftbridge.Bridge

/** Bounded, non-blocking read of an [[Observation]]'s metrics.
  *
  * Observed metrics piggyback on an action the caller already ran (e.g. an
  * eager localCheckpoint), so driver-side facts — row counts, distinct
  * bucket sets — cost ZERO extra Spark jobs. Delivery rides the async
  * listener bus, so callers poll briefly; on timeout they fall back to an
  * explicit (cheap, in-memory) job rather than blocking forever like the
  * public `Observation.get`.
  */
object Observed {
  def poll(obs: Observation, timeoutMs: Int = 2000): Option[Map[String, Any]] = {
    var waited = 0
    var m = Bridge.observationResult(obs)
    while (m.isEmpty && waited < timeoutMs) {
      Thread.sleep(5); waited += 5
      m = Bridge.observationResult(obs)
    }
    if (m.isEmpty) None else Some(m)
  }
}
