package graft.queries

/** Session-scoped memo of persisted frame artifacts with true-LRU
  * eviction — the shared engine behind Curation.cachedShingleSets,
  * TextDedup.cachedMinhash and Similarity.annIndex (one tokenize/hash/
  * assignment pass per (session, dir), evict ONE eldest entry past the
  * cap, never a concurrent reader's frame wholesale).
  *
  * Concurrency contract (closes the ADVICE r11 race): `build` runs under
  * the ConcurrentHashMap's per-KEY lock, so the expensive corpus
  * materialize never holds the global recency monitor. Recency recording,
  * eviction AND the re-persist-if-externally-cleared step all run inside
  * ONE `lru.synchronized` block that first validates the map still holds
  * OUR entry. Without that validation, a thread racing an eviction of its
  * key would (a) re-insert an orphan LRU key whose later eviction
  * unpersists nothing, and (b) re-persist a frame no longer tracked by the
  * map — a persisted-frame leak nothing ever reclaims. When validation
  * fails (entry evicted in the gap) the loop simply re-runs
  * computeIfAbsent: the rebuilt entry is fresh-persisted and tracked.
  * `ensurePersisted` runs inside the lock for the same reason — only an
  * entry the evictor can still see may be (re-)persisted, so every
  * persisted frame has exactly one owner responsible for unpersisting it
  * (MemoRaceSpec pins the persist/unpersist balance under an 8-thread
  * eviction churn). The rare lock-held materialize (only after an
  * external `spark.catalog.clearCache()`) serializes against other memo
  * calls, which would otherwise be recomputing the same cleared state
  * anyway.
  *
  * One residual the memo deliberately does NOT chase (found while
  * stress-testing the fix): a CONSUMER action racing an eviction — a job
  * scanning a memoized frame while another thread's eviction unpersists
  * it — can re-materialize the already-planned InMemoryRelation after its
  * cache entry was dropped, leaving an orphan persisted RDD. That is
  * Spark-level behavior (the in-flight plan holds the relation node; its
  * CachedRDDBuilder rebuilds on demand), it cannot corrupt results (the
  * scan recomputes from source), and the ContextCleaner reclaims the
  * orphan as soon as the frame object is unreachable — verified in
  * MemoRaceSpec, where the persisted population settles to exactly the
  * cap once GC runs. Chasing it would need reference-counted pins around
  * every consumer action, a cost no read path here justifies. */
private[queries] final class LruFrameMemo[K, V <: AnyRef](
    max: Int,
    ensurePersisted: V => Unit,
    unpersist: V => Unit) {

  private val entries = new java.util.concurrent.ConcurrentHashMap[K, V]()
  private val lru = new java.util.LinkedHashMap[K, java.lang.Boolean](
    16, 0.75f, /*accessOrder=*/ true)
  private var gen = 0L // sweep generation; guarded by lru's monitor
  FrameMemos.register(this)

  /** Evict EVERY entry (unpersisting each frame). For cold-isolation
    * harnesses only (Bench's heal rerun, standalone cost probes): a memo
    * surviving `spark.catalog.clearCache()` would re-persist itself via
    * the validation arm and silently warm-subsidize the "cold" rerun —
    * the BENCH_SKEW100 r12 pollution mode. Runs under the same recency
    * monitor as getOrBuild; the generation bump closes the third
    * interleaving (r13 review): a build IN FLIGHT inside computeIfAbsent
    * is invisible to this sweep and would otherwise insert-and-survive —
    * its getOrBuild now sees the generation change at validation, drops
    * its own entry (unpersisting the frame the build materialized) and
    * rebuilds cold. Returns entries evicted. */
  def clearAll(): Int = lru.synchronized {
    gen += 1
    val n = entries.size()
    val it = entries.entrySet().iterator()
    while (it.hasNext) { unpersist(it.next().getValue); it.remove() }
    lru.clear()
    n
  }

  def getOrBuild(key: K)(build: => V): V = {
    while (true) {
      val g0 = lru.synchronized(gen)
      val v = entries.computeIfAbsent(key, _ => build)
      lru.synchronized {
        if ((entries.get(key) eq v) && gen == g0) {
          lru.put(key, java.lang.Boolean.TRUE)
          while (lru.size > max) {
            val eldest = lru.entrySet().iterator().next().getKey
            lru.remove(eldest)
            val evicted = entries.remove(eldest)
            if (evicted != null) unpersist(evicted)
          }
          ensurePersisted(v)
          return v
        }
        // a sweep ran while our build was in flight: the entry (ours or a
        // successor's warm rebuild seeded by ours) must not survive a
        // clearAll whose caller was promised cold state — drop and retry
        if ((entries.get(key) eq v) && gen != g0) {
          entries.remove(key, v)
          lru.remove(key)
          unpersist(v)
        }
        // else: evicted between computeIfAbsent and the lock — retry
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** Process-wide registry of every LruFrameMemo instance (shingle, minhash,
  * pair-scores, ANN index, jcAgg — each registers itself at construction).
  * `clearAll()` is Bench's cold-isolation hook: `spark.catalog.clearCache()`
  * alone is NOT enough to make a heal rerun cold, because each memo's
  * re-persist arm detects the cleared frame and re-persists it on the next
  * access — the exact mechanism that published 0.0067 s "heal minima" into
  * BENCH_SKEW100 in round 12. Public (not `private[queries]`) so graft.Bench
  * and graft.RunQuery can call it. */
object FrameMemos {
  private val all =
    new java.util.concurrent.CopyOnWriteArrayList[LruFrameMemo[_, _]]()

  private[queries] def register(m: LruFrameMemo[_, _]): Unit = all.add(m)

  /** Evict every entry of every memo; returns total entries evicted. */
  def clearAll(): Int = {
    var n = 0
    val it = all.iterator()
    while (it.hasNext) n += it.next().clearAll()
    n
  }
}
