package graft

import org.apache.spark.storage.StorageLevel
import graft.dedup.Dedup

class CachesSpec extends SparkSpec {
  import spark.implicits._

  test("release() unpersists tracked frames (storage level back to NONE)") {
    val df = Seq(1, 2, 3).toDF("x").persist(StorageLevel.MEMORY_AND_DISK)
    Caches.track(df)
    df.count()
    assert(df.storageLevel != StorageLevel.NONE)
    Caches.release()
    assert(df.storageLevel == StorageLevel.NONE)
  }

  test("materialize() builds eagerly, once per plan per release() epoch") {
    val base = Seq(1, 2, 3).toDF("x")
    val df = base.persist(StorageLevel.MEMORY_AND_DISK)
    Caches.materialize(df)
    // built eagerly: the cache entry is populated without any caller action
    assert(df.storageLevel != StorageLevel.NONE)
    // same canonical plan again: registered but NOT re-counted (no way to
    // observe the job count cheaply here; the contract is it stays cached)
    Caches.materialize(df)
    assert(df.storageLevel != StorageLevel.NONE)
    Caches.release()
    assert(df.storageLevel == StorageLevel.NONE)
    // a fresh epoch materializes again
    val df2 = base.persist(StorageLevel.MEMORY_AND_DISK)
    Caches.materialize(df2)
    assert(df2.storageLevel != StorageLevel.NONE)
    Caches.release()
  }

  test("dedup pipelines register their internal persists with the registry") {
    val before = Caches.size
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d f")).toDF("doc_id", "text")
    Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5).count()
    // set table + order index both registered
    assert(Caches.size >= before + 2)
    Caches.release()
    assert(Caches.size == 0)
  }
}
