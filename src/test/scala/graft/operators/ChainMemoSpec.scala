package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[ChainMemo]] — the generalized pqCore memo (r12). The contract under
  * test is exactly what Bench/Verify rely on: build once per (session,
  * tag), REBUILD after the checkpoint blocks are dropped (Bench's
  * per-query cleanup), never mix tags, and evict with the blocks
  * actually freed (ADVICE r11: Dataset.unpersist on a checkpointed chain
  * does not free its blocks — the memo must unpersist by RDD id). */
class ChainMemoSpec extends SparkSpecBase {

  private def chain(): DataFrame =
    spark.range(100).select(col("id"), (col("id") * 2).as("x"))
      .localCheckpoint(false)

  test("builds once per tag, serves the same chain on hit") {
    val memo = new ChainMemo[DataFrame]()
    var builds = 0
    def get(tag: String) = memo.getOrBuild(spark, tag) { builds += 1; chain() }
    val a = get("t1")
    assert(a.count() === 100L)
    assert(get("t1") eq a, "hit must return the built chain itself")
    assert(builds === 1)
    get("t2")
    assert(builds === 2, "a different tag is a different chain")
  }

  test("rebuilds after its checkpoint blocks are unpersisted (the Bench per-query cleanup)") {
    val memo = new ChainMemo[DataFrame]()
    var builds = 0
    def get() = memo.getOrBuild(spark, "t") { builds += 1; chain() }
    get().count() // materialize the checkpoint
    // Bench's cleanup: drop every persisted RDD
    spark.sparkContext.getPersistentRDDs.foreach(_._2.unpersist(true))
    val again = get()
    assert(builds === 2, "dropped blocks must force a rebuild, never a stale serve")
    assert(again.count() === 100L)
  }

  test("LRU eviction frees the evicted chain's checkpoint blocks by RDD id") {
    val memo = new ChainMemo[DataFrame](maxEntries = 1)
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val first = memo.getOrBuild(spark, "a")(chain())
    first.count()
    val firstIds = sc.getPersistentRDDs.keySet -- before
    assert(firstIds.nonEmpty, "the chain must have persisted its checkpoint")
    memo.getOrBuild(spark, "b")(chain()).count() // evicts "a"
    assert(firstIds.forall(id => !sc.getPersistentRDDs.contains(id)),
      "evicted entry's checkpoint RDDs must be unpersisted (ADVICE r11)")
  }
}
