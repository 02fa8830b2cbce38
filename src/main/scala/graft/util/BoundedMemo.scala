package graft.util

/** Tiny bounded memo for per-(session, corpus) one-off artifacts
  * (materialized indexes, demo source dirs). Past `max` entries the
  * whole map is evicted — these are per-JVM caches whose population is
  * one or two keys in every real run (Bench/Verify hold one corpus);
  * the bound only guards a pathological long-lived multi-corpus JVM.
  * `onEvict` releases resources deterministically (e.g. unpersisting
  * checkpoint blocks) instead of waiting for GC + ContextCleaner.
  *
  * The build runs under the memo's lock: concurrent callers of the
  * same key build once, and a concurrent caller of a different key
  * waits — acceptable because builds are rare one-offs and the
  * previous per-site `ConcurrentHashMap.computeIfAbsent` copies had
  * the same coarse blocking through bucket locks.
  */
final class BoundedMemo[K, V](max: Int = 8, onEvict: V => Unit = (_: V) => ()) {
  private val m = new java.util.LinkedHashMap[K, V]()

  def get(k: K)(mk: => V): V = m.synchronized {
    val hit = m.get(k)
    if (hit != null) hit
    else {
      if (m.size >= max) {
        m.values.forEach(v => onEvict(v))
        m.clear()
      }
      val v = mk
      m.put(k, v)
      v
    }
  }

  /** Test hook: number of live entries. */
  def size: Int = m.synchronized(m.size)
}
