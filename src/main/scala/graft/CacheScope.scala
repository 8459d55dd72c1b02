package graft

import org.apache.spark.sql.DataFrame

/** Scoped ownership for DataFrames that operators persist INTERNALLY.
  *
  * Some operators (e.g. [[graft.operators.Dedup.dedupCorpus]]) must
  * materialize-and-persist their output before releasing their upstream
  * caches — the returned frame therefore references live cached state
  * that only the CALLER knows when to release (after its own action).
  * Left unreleased, those caches strand `InMemoryRelation` blocks for the
  * session's lifetime; across a 65-query bench sweep (or any long-lived
  * production session) they accumulate and pressure the storage pool —
  * round 3 measured q64 at 34.7 s in-bench vs 8.0 s in a fresh session,
  * almost entirely this effect.
  *
  * The contract:
  *  - operators register internally-persisted frames via [[register]];
  *  - callers wrap "build the frame + run my action" in [[scoped]], which
  *    unpersists every registered cache on exit (after the action, so
  *    nothing recomputes);
  *  - with NO active scope, [[register]] is a no-op and the operator's
  *    Scaladoc contract applies (caller unpersists manually) — existing
  *    call sites keep working unchanged.
  *
  * Scopes are thread-local (a scope owns only caches registered on its
  * own thread) and nest: registration binds to the innermost open scope.
  * `unpersist()` is an idempotent hint, so releasing a frame the caller
  * also unpersisted is safe.
  */
object CacheScope {

  private val stack =
    new ThreadLocal[List[scala.collection.mutable.ArrayBuffer[DataFrame]]] {
      override def initialValue():
          List[scala.collection.mutable.ArrayBuffer[DataFrame]] = Nil
    }

  /** Whether a scope is open on this thread — operators whose persisted
    * state would otherwise be unreachable to callers (e.g. buried under
    * derived frames, as in `CorpusPipeline.prepare`) use this to warn
    * when they are about to strand a cache.
    */
  def isActive: Boolean = stack.get().nonEmpty

  /** Hand ownership of an operator-persisted `df` to the innermost active
    * scope; no-op without one. Returns `df` for chaining.
    */
  def register(df: DataFrame): DataFrame = {
    stack.get() match {
      case head :: _ => head += df
      case Nil       => ()
    }
    df
  }

  /** Run `body`, then unpersist every cache operators registered during
    * it. Run the releasing ACTION inside the scope too — the caches must
    * outlive the job that reads them.
    *
    * Release is BLOCKING: scope exit means "this memory is free NOW",
    * not "eventually". The default async unpersist only enqueues block
    * removal — across a long sweep (the bench's 317 back-to-back
    * queries, or any production session chaining scoped stages) lagging
    * removals stack up and the storage pool evicts/GC-churns under
    * blocks that are semantically dead (round-11 bench: the q137–q195
    * band ran 2–16× slow with wild second reps — accumulated dead-block
    * pressure, not plan changes). The wait is bounded by block-removal
    * RPCs on frames the scope itself persisted.
    */
  def scoped[T](body: => T): T = {
    val owned = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    stack.set(owned :: stack.get())
    try body
    finally {
      stack.set(stack.get().tail)
      owned.foreach { df =>
        try df.unpersist(blocking = true) catch { case _: Throwable => () }
      }
    }
  }
}
