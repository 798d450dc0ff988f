package graft.sources

/** Crash-point instrumentation for the stores' multi-step filesystem
  * transitions (GraphStore's generation commit, VectorStore's
  * rename-swaps). The recovery designs were argued window-by-window in
  * code comments; this hook lets a spec actually DIE at each window —
  * PropertySpecs' randomized sweep kills a store operation at ≥100
  * random steps and asserts `load()`/`collection()` always adopts a
  * complete copy (the committed one, or the attempted one when the
  * kill landed after the atomic commit step).
  *
  * Production cost: one volatile read + a no-op call per step. The
  * step NAMES are part of the spec surface — they enumerate the crash
  * windows the recovery contract claims to cover; adding a new
  * filesystem transition to a store without a named point here leaves
  * it un-swept (the sweep's step census makes that visible). */
object FaultPoints {
  /** Thrown by a spec-installed handler to model the process dying at
    * `point` — the store code never catches it, exactly like a kill. */
  final class SimulatedCrash(val point: String)
    extends RuntimeException(s"simulated crash at $point")

  @volatile private var handler: String => Unit = null

  /** Called by store code at each named crash window (the stores here
    * and streaming's CdcPendingStore sidecar, which shares the
    * generation-commit discipline). */
  private[graft] def hit(point: String): Unit = {
    val h = handler
    if (h != null) h(point)
  }

  /** Install a handler for the duration of `body` (specs only). Not
    * re-entrant across threads — the sweep runs store ops serially. */
  def withHandler[T](h: String => Unit)(body: => T): T = {
    val prev = handler
    handler = h
    try body finally handler = prev
  }
}
