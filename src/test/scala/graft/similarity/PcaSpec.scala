package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("pcaPower recovers the (1,1) direction with full explained variance") {
    graft.Caches.release()
    // points on the diagonal: q = (1000,1000),(2000,2000),(3000,3000),(0,0)
    // C(i,j) = 4·14e6 − 36e6 = 2e7 for all pairs; the iteration fixes
    // (1e6, 1e6) and vᵀCv/(vᵀv·tr C) = 1 exactly.
    val emb = Seq(
      (1L, Array(1f, 1f)), (2L, Array(2f, 2f)),
      (3L, Array(3f, 3f)), (4L, Array(0f, 0f))).toDF("vec_id", "embedding")
    val out = Vectors.pcaPower(emb, "embedding").orderBy(col("dim"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0, 1000000L, 1000L), (1, 1000000L, 1000L)))
    graft.Caches.release()
  }

  test("pcaPower finds an anti-correlated direction (the symmetry-broken start)") {
    graft.Caches.release()
    // q = (1000,-1000),(2000,-2000),(-1000,1000): the dominant direction
    // (1,-1) is orthogonal to the all-ones vector — the v0(i) = 1e6 + i
    // start breaks the tie and the iteration lands on ±(1e6, -1e6).
    val emb = Seq(
      (1L, Array(1f, -1f)), (2L, Array(2f, -2f)), (3L, Array(-1f, 1f)))
      .toDF("vec_id", "embedding")
    val out = Vectors.pcaPower(emb, "embedding").orderBy(col("dim"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((-1000000L, 1000L), (1000000L, 1000L)))
    graft.Caches.release()
  }

  test("pcaProject centers exactly on the hand example") {
    graft.Caches.release()
    // q = (1000,1000),(3000,3000): v = (1e6,1e6), dots (2e9, 6e9),
    // K = 8e9, n = 2 → mean 4e9 → pc1 = (−2e9, 2e9).
    val emb = Seq((1L, Array(1f, 1f)), (2L, Array(3f, 3f)))
      .toDF("vec_id", "embedding")
    val out = Vectors.pcaProject(emb, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, -2000000000L), (2L, 2000000000L)))
    graft.Caches.release()
  }

  test("pcaPower aligns with a planted dominant direction and is partition-invariant") {
    graft.Caches.release()
    val rng = new scala.util.Random(11)
    val d = 8
    val dir = Array.fill(d)(rng.nextGaussian())
    val dn = math.sqrt(dir.map(x => x * x).sum)
    // strong signal along `dir`, weak isotropic noise
    val data = (1 to 300).map { i =>
      val t = rng.nextGaussian() * 5.0
      (i.toLong, Array.tabulate(d)(k =>
        (t * dir(k) / dn + rng.nextGaussian() * 0.05).toFloat))
    }
    val emb = data.toDF("vec_id", "embedding")
    val v = Vectors.pcaPower(emb, "embedding").orderBy(col("dim"))
      .collect().map(_.getLong(1).toDouble)
    val cos = {
      val num = v.zip(dir).map { case (a, b) => a * b }.sum
      val na = math.sqrt(v.map(x => x * x).sum)
      num / (na * dn)
    }
    assert(math.abs(cos) > 0.99, s"cosine to planted direction was $cos")
    graft.Caches.release()
    // partition-invariance: identical output at a different width
    val v2 = Vectors.pcaPower(emb.repartition(7), "embedding")
      .orderBy(col("dim")).collect().map(_.getLong(1))
    assert(v2.toSeq == v.map(_.toLong).toSeq)
    graft.Caches.release()
  }

  test("pcaPower on an empty store returns an empty frame") {
    graft.Caches.release()
    val emb = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Vectors.pcaPower(emb, "embedding").count() == 0)
    graft.Caches.release()
  }
}
