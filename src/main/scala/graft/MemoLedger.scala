package graft

/** Cross-entry memo telemetry for the bench line (VERDICT r14 ask #2).
  *
  * The query batches keep ~10 deliberate cross-entry memos (the
  * banded pair graph, the fitted k-means model/assignment, the BM25
  * stats, …): at production scale each memoized frame is computed once
  * and feeds every consumer, so an isolated-timing harness that
  * re-derived it per entry would mis-price the consumers' plans. The
  * flip side is a readability hazard in the bench artifact — p172
  * stamping 0.37 s atop p171's 6.5 s pair-graph build reads as a
  * 0.37 s contamination audit unless the line says otherwise. This
  * ledger is the `ext_cpu` self-labeling precedent applied to memos:
  * every accessor records build/hit events here, [[Bench]] drains the
  * ledger per timed window, and an entry whose window CONSUMED a memo
  * it did not build carries a `memo` marker in both the stdout line
  * and bench-full.json — the per-entry seconds stay honest without
  * giving up the shared-frame production shape.
  *
  * A hit on a memo built EARLIER IN THE SAME WINDOW is not flagged
  * (the build cost IS inside that window — e.g. the first consumer
  * calling an accessor twice), which is why builds are recorded too.
  *
  * Events accumulate in a lock-free queue; recording is O(1) and
  * driver-side only (accessors run in the planning path), so the
  * ledger adds nothing to a timed window but the two enqueues.
  */
object MemoLedger {
  private final case class Ev(memo: String, isBuild: Boolean)
  private val events = new java.util.concurrent.ConcurrentLinkedQueue[Ev]()

  /** An accessor served a caller from an ALREADY-BUILT memo. */
  def recordHit(memo: String): Unit = events.add(Ev(memo, isBuild = false))

  /** An accessor built (or rebuilt on key change) its memo. */
  def recordBuild(memo: String): Unit = events.add(Ev(memo, isBuild = true))

  /** Drain every event recorded since the last drain and return the
    * names of memos that were HIT without being BUILT in the drained
    * window — the "this window's seconds presuppose work priced
    * elsewhere" set. Distinct, insertion-ordered.
    */
  def drainForeignHits(): Seq[String] = {
    val built = scala.collection.mutable.HashSet.empty[String]
    val hits = scala.collection.mutable.LinkedHashSet.empty[String]
    var ev = events.poll()
    while (ev != null) {
      if (ev.isBuild) built += ev.memo else hits += ev.memo
      ev = events.poll()
    }
    hits.diff(built).toSeq
  }
}
