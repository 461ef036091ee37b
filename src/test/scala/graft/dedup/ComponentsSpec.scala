package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ComponentsSpec extends SparkSpec {

  test("connected components: chains, cliques, singletons") {
    import spark.implicits._
    // components: {1,2,3,4} (chain), {10,11} (pair), {20,21,22} (triangle)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("id_a", "id_b")
    val comps = Components.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).map(comps) == Seq(1L, 1L, 1L, 1L))
    assert(Seq(10L, 11L).map(comps) == Seq(10L, 10L))
    assert(Seq(20L, 21L, 22L).map(comps) == Seq(20L, 20L, 20L))
  }

  test("distributed large-star/small-star path matches union-find (driverThreshold=0)") {
    import spark.implicits._
    // long chain (worst case for plain label propagation) + clique + pair
    val chain = (0L until 40L).map(i => (i, i + 1))
    val rest = Seq((100L, 101L), (101L, 102L), (100L, 102L), (200L, 201L))
    val pairs = (chain ++ rest).toDF("id_a", "id_b")
    val dist = Components.connectedComponents(pairs, driverThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = Components.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == local)
    assert((0L to 40L).forall(dist(_) == 0L))
    assert(Seq(100L, 101L, 102L).forall(dist(_) == 100L))
    assert(dist(201L) == 200L)
  }

  test("both paths eagerly free superseded checkpoint blocks") {
    import spark.implicits._
    // the contraction loop checkpoints every round (and the driver path
    // checkpoints its canonical edge set); superseded generations must be
    // freed eagerly, not left for GC + ContextCleaner (r15 ADVICE finding)
    def persisted() = spark.sparkContext.getPersistentRDDs.size
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val before = persisted()
    assert(Components.connectedComponents(chain, driverThreshold = 0L).count() == 41)
    assert(Components.connectedComponents(chain).count() == 41)
    // at most the distributed path's final round survives (the caller may
    // still read it); the driver path releases everything. Suites share
    // this SparkContext concurrently — delta bound, not exact count.
    assert(persisted() - before <= 1,
      s"superseded rounds not freed: $before -> ${persisted()}")
  }

  test("canonicalize marks non-canonical members as duplicates") {
    import spark.implicits._
    val docs = Seq(1L, 2L, 3L, 99L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = Components.canonicalize(docs, pairs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(1L) == ((1L, false)))
    assert(out(2L) == ((1L, true)))
    assert(out(3L) == ((1L, true)))
    assert(out(99L) == ((99L, false))) // unpaired → canonical of itself
  }

  test("end-to-end dedup: minhash pairs → components → canonical picks") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog while rain falls on green hills"
    val docs = Seq(
      (0L, base), (1L, base + " today"), (2L, base + " again"), // transitive near-dups
      (5L, "completely different words about spark engines and shuffles partitions wide")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashLshCandidates(docs, "doc_id", "text", shingleN = 3)
      .filter(col("estimated_jaccard") >= 0.5)
    val decisions = Components.canonicalize(docs.select(col("doc_id").as("id")), pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(decisions(0L) == 0L && decisions(1L) == 0L && decisions(2L) == 0L)
    assert(decisions(5L) == 5L)
  }
}
