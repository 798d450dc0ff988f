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

/** The ONE atomic pointer-file protocol shared by the generation
  * stores (GraphStore's `_CURRENT`, streaming's CdcPendingStore
  * sidecar): commit = write `<pointer>.tmp`, delete the old pointer,
  * rename the tmp over it (a one-line file rename — atomic on every
  * Hadoop FileSystem that matters). The delete→rename gap is the
  * callers' documented crash window; both recover by adopting the
  * newest COMPLETE artifact when the pointer is absent. Extracted so
  * a future protocol fix (fsync discipline, rename-over semantics on
  * a new filesystem) lands in one place — the two stores previously
  * hand-rolled identical copies. */
private[graft] object AtomicPointer {
  import org.apache.hadoop.fs.{FileSystem, Path}

  /** Crash-safely point `pointer` at `value`. `faultPrefix` names this
    * caller's crash windows for the randomized kill sweeps
    * (`<prefix>.tmp-written` / `.old-pointer-deleted` / `.done`). */
  def commit(fs: FileSystem, pointer: Path, value: String, faultPrefix: String): Unit = {
    val tmp = new Path(pointer.toString + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(value.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    FaultPoints.hit(faultPrefix + ".tmp-written")
    fs.delete(pointer, false)
    FaultPoints.hit(faultPrefix + ".old-pointer-deleted")
    require(fs.rename(tmp, pointer), s"commit failed: could not promote $pointer")
    FaultPoints.hit(faultPrefix + ".done")
  }

  /** The pointed value, or None when the pointer is absent (the
    * crash-window state the caller's adopt-newest-complete recovery
    * handles). */
  def read(fs: FileSystem, pointer: Path): Option[String] =
    if (!fs.exists(pointer)) None
    else {
      val in = fs.open(pointer)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
      finally in.close()
    }
}
