package graft

/** Structural invariants for the event-funnel and PageRank ops that the
  * row-level oracle can't see: probability-mass conservation, hub
  * dominance, and funnel accounting. */
class FunnelGraphSpec extends SparkSpec {

  test("graph_pagerank conserves rank mass and ranks hubs on top") {
    val rows = SparkEntry.queries("graph_pagerank")(spark, sf).collect()
    val n = Tables(spark, sf, "documents").count()
    assert(rows.length == n, s"rank table has ${rows.length} of $n nodes")
    // no dangling nodes in the synthetic graph → total rank stays 1
    // (up to the per-round 1e-10 rounding)
    val mass = rows.map(_.getAs[Double]("pr")).sum
    assert(math.abs(mass - 1.0) < 1e-6, s"rank mass drifted to $mass")
    // every doc links to doc_id % 10, so the ten hubs must dominate
    val (hubs, rest) = rows.partition(_.getAs[Long]("node") < 10)
    assert(hubs.map(_.getAs[Double]("pr")).min >
      rest.map(_.getAs[Double]("pr")).max,
      "a non-hub node outranked a hub")
  }

  test("graph_triangles matches an independent brute-force count") {
    val n = Tables(spark, sf, "documents").count()
    // rebuild the edge set with plain Scala and count triangles by
    // adjacency intersection — no Spark joins, no shared code path
    val edges = (0L until n).flatMap { i =>
      Seq((i * 7 + 13) % n, (i * 31 + 5) % n, i % 10)
        .filter(_ != i).map(j => (math.min(i, j), math.max(i, j)))
    }.toSet
    val adj = {
      val m = collection.mutable.Map[Long, Set[Long]]()
        .withDefaultValue(Set.empty)
      edges.foreach { case (u, v) => m(u) += v; m(v) += u }
      m
    }
    // for each canonical edge (u < v), common neighbors w > v — each
    // triangle counted at exactly one of its three edges
    val brute = edges.toSeq.map { case (u, v) =>
      (adj(u) intersect adj(v)).count(_ > v)
    }.sum
    val got = SparkEntry.queries("graph_triangles")(spark, sf)
      .collect().head.getAs[Long]("n_triangles")
    assert(got == brute, s"degree-oriented count $got != brute-force $brute")
  }

  test("graph_jaccard_neighbors matches brute-force adjacency Jaccard") {
    val n = Tables(spark, sf, "documents").count()
    val edges = (0L until n).flatMap { i =>
      Seq((i * 7 + 13) % n, (i * 31 + 5) % n, i % 10)
        .filter(_ != i).map(j => (math.min(i, j), math.max(i, j)))
    }.toSet
    val adj = {
      val m = collection.mutable.Map[Long, Set[Long]]()
        .withDefaultValue(Set.empty)
      edges.foreach { case (u, v) => m(u) += v; m(v) += u }
      m
    }
    // same τ = 16 informative-neighbor cap as the engine: only nodes
    // of degree ≤ τ count toward intersection and union
    val informative = adj.collect {
      case (x, ns) if ns.size <= 16 => x
    }.toSet
    val adjF = adj.map { case (x, ns) => x -> (ns intersect informative) }
      .withDefaultValue(Set.empty[Long])
    val nodes = adj.keys.toSeq.sorted
    val brute = (for {
      a <- nodes; b <- nodes if a < b
      inter = (adjF(a) intersect adjF(b)).size if inter >= 2
    } yield (a, b) -> BigDecimal(
      inter.toDouble / (adjF(a).size + adjF(b).size - inter))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
    val got = SparkEntry.queries("graph_jaccard_neighbors")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))
        -> r.getAs[Double]("jaccard")).toMap
    assert(got == brute,
      s"pair sets differ: extra=${got.keySet -- brute.keySet} " +
        s"missing=${brute.keySet -- got.keySet}")
  }

  test("graph_degree_hist satisfies the handshake lemma") {
    val n = Tables(spark, sf, "documents").count()
    val edges = (0L until n).flatMap { i =>
      Seq((i * 7 + 13) % n, (i * 31 + 5) % n, i % 10)
        .filter(_ != i).map(j => (math.min(i, j), math.max(i, j)))
    }.toSet
    val hist = SparkEntry.queries("graph_degree_hist")(spark, sf).collect()
    val endpointSum = hist
      .map(r => r.getAs[Long]("degree") * r.getAs[Long]("n_nodes")).sum
    assert(endpointSum == 2L * edges.size,
      s"Σ degree·count = $endpointSum != 2·|E| = ${2L * edges.size}")
    assert(hist.map(_.getAs[Long]("n_nodes")).sum <= n)
  }

  test("win_retention cells never exceed their cohort size") {
    val rows = SparkEntry.queries("win_retention")(spark, sf).collect()
    assert(rows.nonEmpty, "fixture produced no retention cells")
    assert(rows.forall(_.getAs[Long]("offset_dy") >= 0L))
    // cohort sizes recomputed independently from raw events
    val sizes = Tables(spark, sf, "events")
      .filter(org.apache.spark.sql.functions.col("event_type") === "signup")
      .select("user_id").distinct().count()
    rows.groupBy(_.getAs[Long]("cohort")).foreach { case (c, cells) =>
      val peak = cells.map(_.getAs[Long]("n_users")).max
      assert(peak <= sizes,
        s"cohort $c cell $peak exceeds the signup population $sizes")
    }
  }

  test("win_funnel accounts for every user exactly once") {
    val rows = SparkEntry.queries("win_funnel")(spark, sf).collect()
    val users = Tables(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == users,
      "funnel depth counts do not partition the user set")
    assert(rows.forall(r => (0 to 3).contains(r.getAs[Int]("depth"))))
    rows.foreach { r =>
      val conv = r.getAs[Long]("sum_convert_us")
      if (r.getAs[Int]("depth") == 3)
        assert(conv > 0, "depth-3 users must have positive view→purchase time")
      else assert(conv == 0, s"non-converting depth carries latency $conv")
    }
  }

  test("graph_shortest_path matches a plain-Scala BFS replay") {
    val got = SparkEntry.queries("graph_shortest_path")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // independent BFS over the same synthetic edge rule
    val n = Tables(spark, sf, "documents").count()
    val adj = (0L until n).map { v =>
      v -> Seq((v * 7 + 13) % n, (v * 31 + 5) % n, v % 10)
        .filter(_ != v).distinct
    }.toMap
    val dist = scala.collection.mutable.Map(0L -> 0)
    var frontier = Set(0L)
    for (k <- 1 to 6) {
      frontier = frontier.flatMap(adj)
        .filterNot(dist.contains)
      frontier.foreach(v => dist(v) = k)
    }
    assert(got == dist.toMap,
      s"BFS diverged: missing ${dist.keySet -- got.keySet}, " +
        s"extra ${got.keySet -- dist.keySet}, " +
        s"diffs ${got.collect { case (k, v) if dist.get(k).exists(_ != v) => (k, v, dist(k)) }.take(5)}")
  }
}
