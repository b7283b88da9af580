package graft.sources

/** In-process read/write gate between SERVING reads and the
  * physically-rewriting window of store maintenance (round 13).
  *
  * The committed-epoch snapshot already makes every lexical read
  * request-consistent under LOGICAL mutations (append/delete commit
  * rows): each serving plan derives from one `epochsInfo` fold and every
  * scan filters to that pinned epoch set, so a commit landing mid-request
  * is invisible and the request serves the snapshot it STARTED on. What
  * that cannot cover is the PHYSICAL install window of compact / rebucket
  * / recell / cell-split / retention-sweep — a few hundred milliseconds
  * of directory renames (the multi-second retrain/rewrite work happens in
  * sibling directories while the store serves unchanged) during which a
  * racing request's planned-but-not-yet-opened files can vanish. Round 12
  * handled that with the optimistic physical-token bracket: detect the
  * straddle, recompute. Correct, but the recompute lands AFTER the
  * mutation — ServeMutation measured a 25.9 s tail for a request that
  * waited out a 9.5 s cell split it started before.
  *
  * This gate closes the straddle instead of detecting it: serving
  * requests hold the READ side for their compute; a mutation takes the
  * WRITE side around ONLY its install window (renames + tombstone clears
  * + vacuum — never the rebuild). A fair ReentrantReadWriteLock makes the
  * writer wait for in-flight readers (bounded by one request's compute)
  * and queues later readers behind it (bounded by the install window), so
  * every request serves either the full pre-install or full post-install
  * state and no request ever waits out a long mutation.
  *
  * Scope: ONE JVM — the architecture this repo serves and mutates from
  * (ServeMutation, EtlDaemon, the API server). Cross-process mutators are
  * still caught by the optimistic physical-token bracket, which stays in
  * place as the belt-and-braces layer; on a multi-writer deployment the
  * gate generalizes to the same leases a table format's commit protocol
  * provides. Advisory like [[StoreLock]]: writers opt in by wrapping
  * their install sections.
  */
object StoreGate {

  private val gates = scala.collection.concurrent.TrieMap
    .empty[String, java.util.concurrent.locks.ReentrantReadWriteLock]

  private def canon(path: String): String = path.stripSuffix("/")

  private def gate(path: String) =
    gates.getOrElseUpdate(canon(path),
      new java.util.concurrent.locks.ReentrantReadWriteLock(true))

  /** Run `body` holding the read side of every path's gate (sorted
    * acquisition order, so overlapping readers can never deadlock). */
  def readLocked[T](paths: Seq[String])(body: => T): T = {
    val ordered = paths.map(canon).distinct.sorted.map(gate)
    ordered.foreach(_.readLock().lock())
    try body
    finally ordered.reverse.foreach(_.readLock().unlock())
  }

  /** Run `body` — a store's physical INSTALL window only, never its
    * rebuild — holding the write side of the path's gate. */
  def writeLocked[T](path: String)(body: => T): T = {
    val g = gate(path)
    g.writeLock().lock()
    try body finally g.writeLock().unlock()
  }
}
