package graft

/** Cache lifecycle: every query that persists a shared subtree must
  * release it once its (small) result is materialized — a Verify pass
  * over the whole inventory must not accumulate corpus-sized cache
  * entries in the session's CacheManager. */
class CacheLifecycleSpec extends SparkSpec {

  // the queries that persist internally (TextOps pipelines and their
  // CorpusOps component consumers) — the leak candidates.
  private val cacheManaging = Seq("nlp_tfidf", "dedup_minhash",
    "dedup_ngram_jaccard", "dedup_fuzzy_pairs", "dedup_clusters",
    "dedup_keep_list",
    // round-7 additions that persist internally: pagerank's
    // loop-invariant edges/deg, ppl_bucket's shared NLL table, and the
    // PCA corpus / PQ subvector caches
    "graph_pagerank", "text_ppl_bucket", "embed_pca", "embed_pq")

  test("cache-managing queries leave the CacheManager empty") {
    // precondition: some other suite may have leaked entries into the
    // shared session — start clean so the assertion isolates this pass.
    spark.sharedState.cacheManager.clearCache()
    for (k <- cacheManaging) {
      val n = SparkEntry.queries(k)(spark, sf).count()
      assert(n >= 0, s"$k failed to materialize")
    }
    assert(spark.sharedState.cacheManager.isEmpty,
      "cache entries leaked after a verify-style pass over the " +
        s"persisting queries: ${cacheManaging.mkString(", ")}")
  }

  test("sql_cache_table reads the in-memory materialization, releasable") {
    spark.sharedState.cacheManager.clearCache()
    val df = SparkEntry.queries("sql_cache_table")(spark, sf)
    assert(df.collect().nonEmpty)
    // the cached subtree shows as InMemoryRelation in the optimized
    // logical plan (the physical rendering hides the cache stage
    // behind AQE query-stage wrappers)
    assert(df.queryExecution.optimizedPlan.toString
      .contains("InMemoryRelation"),
      s"consumer did not read the cache:\n${df.queryExecution.optimizedPlan}")
    // unlike internal persists, CACHE TABLE is a session-owned entity:
    // it MUST stay registered until the user releases it
    assert(!spark.sharedState.cacheManager.isEmpty,
      "CACHE TABLE did not register an entry")
    spark.sql("UNCACHE TABLE ct_nation_cached")
    assert(spark.sharedState.cacheManager.isEmpty,
      "UNCACHE did not release the entry")
  }
}
