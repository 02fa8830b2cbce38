package graft.sources

/** COMMIT RETRY — the client half of optimistic concurrency. The
  * graftmem catalog DETECTS write conflicts at commit time (a scanned
  * group / tombstoned position changed after the operation's scan →
  * [[GraftMemCommitConflictException]]); a production lakehouse
  * catalog pairs that detection with an automatic RETRY FROM A FRESH
  * SNAPSHOT (Iceberg's commit retry loop, Delta's
  * OptimisticTransaction): the WHOLE operation re-runs — re-scan,
  * re-compute, re-validate — because the rejected attempt's write set
  * was computed from a stale snapshot and nothing short of a fresh
  * read can repair it.
  *
  * `body` must therefore be the COMPLETE operation (e.g. one
  * `spark.sql("MERGE INTO ...")`), not just its commit step, and must
  * be safe to re-run (the rejected commit left no trace — the
  * connector guarantees validation-before-mutation). The conflict may
  * surface wrapped (Spark rethrows task/commit failures), so the
  * cause chain is walked.
  *
  * At 100 TB the retry bound matters: under heavy contention a
  * copy-on-write full rewrite can starve (every interleaved commit
  * invalidates it) — the production answers are partitioned tables
  * (disjoint groups don't conflict, b77) or the merge-on-read flavor
  * (only same-row writes conflict, b80). The loud exhaustion error
  * names both.
  */
object GraftMemRetry {

  @annotation.tailrec
  private def isConflict(t: Throwable): Boolean = t match {
    case null                                => false
    case _: GraftMemCommitConflictException  => true
    case other                               => isConflict(other.getCause)
  }

  /** Run `body`, retrying up to `maxAttempts` times total when it
    * fails with a commit conflict (directly or anywhere in the cause
    * chain). Non-conflict failures propagate immediately.
    */
  def retryOnConflict[T](maxAttempts: Int = 3)(body: => T): T = {
    require(maxAttempts >= 1,
      s"retryOnConflict: maxAttempts must be >= 1, got $maxAttempts")
    var attempt = 0
    while (true) {
      attempt += 1
      try return body
      catch {
        case t: Throwable if isConflict(t) && attempt < maxAttempts => ()
        case t: Throwable if isConflict(t) =>
          throw new GraftMemCommitConflictException(
            s"commit conflict persisted through $maxAttempts attempts " +
              "(heavy contention on a full-rewrite table: consider a " +
              "partitioned table — disjoint groups don't conflict — or " +
              "the merge-on-read flavor, where only same-row writes " +
              s"conflict): ${t.getMessage}")
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
