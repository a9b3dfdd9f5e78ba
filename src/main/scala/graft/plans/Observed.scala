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
  /** The timeout is deliberately short: the caller's fallback job over an
    * already-checkpointed frame costs ~tens of ms, so if the listener bus
    * drops or delays the event (it sheds under queue overflow) we pay a
    * bounded 500 ms — not a silent multi-second stall per merge — and say
    * so on stderr, once per occurrence. */
  def poll(obs: Observation, timeoutMs: Int = 500): Option[Map[String, Any]] = {
    var waited = 0
    var m = Bridge.observationResult(obs)
    while (m.isEmpty && waited < timeoutMs) {
      Thread.sleep(5); waited += 5
      m = Bridge.observationResult(obs)
    }
    if (m.isEmpty) {
      System.err.println(
        s"[graft] observation '${obs.name}' not delivered in ${timeoutMs}ms — falling back to an explicit job")
      None
    } else Some(m)
  }
}
