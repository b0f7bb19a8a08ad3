package graft

/** Registry of in-JVM memo caches that amortize deterministic derived
  * work (e.g. the BPE merge table) across the keys of one Verify pass.
  * The BENCH must not see them: a median-of-3 timed run with a warm
  * memo measures a map lookup instead of the operator, hiding
  * regressions. Bench resets every registered cache before each timed
  * run; Verify never resets (amortization is the point there).
  */
object RunCaches {
  private val hooks =
    scala.collection.concurrent.TrieMap.empty[String, () => Unit]

  def register(name: String)(f: () => Unit): Unit = hooks.put(name, f)

  def reset(): Unit = hooks.values.foreach(_())
}
