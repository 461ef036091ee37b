package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {

  private lazy val clustered = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val dim = 16
    (for {
      c <- 0 until 10
      base = Array.fill(dim)(rnd.nextGaussian())
      m <- 0 until 20
    } yield ((c * 20 + m).toLong, base.map(x => (x + rnd.nextGaussian() * 0.05).toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("train produces nlist deterministic centroids") {
    val i1 = Ivf.train(clustered, nlist = 10, vecCol = "embedding")
    val i2 = Ivf.train(clustered, nlist = 10, vecCol = "embedding")
    assert(i1.nlist == 10)
    assert(i1.centroids.map(_.toSeq) == i2.centroids.map(_.toSeq))
  }

  test("cell assignment puts cluster-mates together") {
    val index = Ivf.train(clustered, nlist = 10)
    val cells = clustered.select(col("vec_id"),
        Ivf.assignCell(col("embedding"), index).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // most pairs within a planted cluster share a cell
    val agree = (0 until 10).count { c =>
      val members = (c * 20 until c * 20 + 20).map(i => cells(i.toLong))
      members.groupBy(identity).values.map(_.size).max >= 15
    }
    assert(agree >= 8, s"only $agree/10 clusters cohesive")
  }

  test("blind-sample fast path trains equivalently (no sizing count)") {
    // sampleFraction tuned up so the blind sample fills the cap on this
    // 200-row corpus, forcing the scale path (Ivf.train's first branch) that
    // every big-corpus run takes but the default-parameter specs never hit
    val blind = Ivf.train(clustered, nlist = 10, sampleCap = 100, sampleFraction = 0.9)
    assert(blind.nlist == 10)
    assert(blind.centroids.forall(_.length == 16))
    // the blind-path index still clusters the planted data coherently
    val cells = clustered.select(col("vec_id"),
        Ivf.assignCell(col("embedding"), blind).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // the bar is the code path, not k-means init luck: with only half the
    // tiny corpus sampled, random init can merge a few planted clusters
    val agree = (0 until 10).count { c =>
      val members = (c * 20 until c * 20 + 20).map(i => cells(i.toLong))
      members.groupBy(identity).values.map(_.size).max >= 15
    }
    assert(agree >= 5, s"only $agree/10 clusters cohesive via blind path")
    // determinism holds on the fast path too
    val again = Ivf.train(clustered, nlist = 10, sampleCap = 100, sampleFraction = 0.9)
    assert(blind.centroids.map(_.toSeq) == again.centroids.map(_.toSeq))
  }

  test("IVF top-1 recall vs brute force on clustered data") {
    val index = Ivf.train(clustered, nlist = 10)
    val queries = clustered.filter(col("vec_id") % 20 === 0)
    val exact = Similarity.bruteForceTopK(queries, clustered, k = 1).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = Ivf.topK(queries, clustered, index, k = 1, nprobe = 2).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall=$recall")
  }
}
