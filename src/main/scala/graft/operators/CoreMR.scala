package graft.operators

import org.apache.spark.Partitioner
import org.apache.spark.sql.{Column, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's MapReduce dataflow surface re-expressed natively on
  * Spark Datasets (SURVEY.md §2 Tier A).
  *
  * Reference semantics (public-knowledge recall, tree absent — SURVEY §0):
  *  - `map(key, value)` yields 0..n pairs [mrs: mrs/task.py MapTask]
  *  - `reduce(key, values)` sees each key once with all its values,
  *    keys sorted within a split [mrs: mrs/task.py ReduceTask]
  *  - `reducemap` fuses reduce→map into one task so iterative programs
  *    materialize once per round, not twice [mrs: mrs/task.py]
  *  - `hash_partition` / `mod_partition` route a pair to a split
  *    [mrs: mrs/__init__.py]
  *
  * Spark mapping: flatMap / groupByKey.flatMapGroups / fused
  * flatMapGroups; partitioners are Spark `Partitioner`s (or
  * `repartition(n, col)` at the DataFrame tier). Spark's sort-based
  * aggregation and shuffle replace Mrs's sorted file buckets, and
  * whole-stage codegen fuses consecutive narrow stages for free — the
  * reducemap optimization is subsumed by staying inside one stage.
  *
  * Scale: `groupByKey.flatMapGroups` is a full shuffle on the key —
  * exactly Mrs's semantics. When the reducer is associative, prefer the
  * relational `groupBy().agg()` tier (partial aggregation / map-side
  * combine, which Mrs never had).
  */
object CoreMR {

  /** Mrs `job.map_data(src, mapper, splits)`: per-pair flat transform,
    * then partition by the new key.
    */
  def mapData[K, V, K2: Encoder, V2: Encoder](
      src: Dataset[(K, V)],
      mapper: (K, V) => IterableOnce[(K2, V2)],
  )(implicit pairEnc: Encoder[(K2, V2)]): Dataset[(K2, V2)] =
    src.flatMap { case (k, v) => mapper(k, v) }

  /** Mrs `job.reduce_data(src, reducer, splits)`: group every value for
    * a key, apply the reducer generator. The iterator a reducer sees is
    * not materialized — Spark streams grouped values, spilling to disk
    * when a key's run exceeds memory (Mrs relied on OS file buckets).
    */
  def reduceData[K: Encoder, V, V2: Encoder](
      src: Dataset[(K, V)],
      reducer: (K, Iterator[V]) => IterableOnce[V2],
  )(implicit outEnc: Encoder[(K, V2)]): Dataset[(K, V2)] =
    src.groupByKey(_._1).flatMapGroups { (k, it) =>
      reducer(k, it.map(_._2)).iterator.map(v => (k, v))
    }

  /** Mrs `job.reducemap_data(src, reducer, mapper)`: fused reduce→map —
    * one shuffle, one stage, no intermediate materialization.
    */
  def reduceMapData[K: Encoder, V, V2, K3: Encoder, V3: Encoder](
      src: Dataset[(K, V)],
      reducer: (K, Iterator[V]) => IterableOnce[V2],
      mapper: (K, V2) => IterableOnce[(K3, V3)],
  )(implicit outEnc: Encoder[(K3, V3)]): Dataset[(K3, V3)] =
    src.groupByKey(_._1).flatMapGroups { (k, it) =>
      reducer(k, it.map(_._2)).iterator.flatMap(v => mapper(k, v))
    }

  /** Mrs default parter: `hash(serialized key) % n`
    * [mrs: mrs/__init__.py hash_partition].
    */
  final class HashParter(n: Int) extends Partitioner {
    override def numPartitions: Int = n
    override def getPartition(key: Any): Int = {
      val h = if (key == null) 0 else key.hashCode()
      java.lang.Math.floorMod(h, n)
    }
  }

  /** Mrs `mod_partition`: `int(key) % n` — locality-preserving for
    * numeric key ranges [mrs: mrs/__init__.py mod_partition].
    */
  final class ModParter(n: Int) extends Partitioner {
    override def numPartitions: Int = n
    override def getPartition(key: Any): Int = key match {
      case l: Long => java.lang.Math.floorMod(l, n.toLong).toInt
      case i: Int  => java.lang.Math.floorMod(i, n)
      case other   => java.lang.Math.floorMod(other.hashCode(), n)
    }
  }

  /** Column-level mod-partition id, identical in DuckDB as `k % n` for
    * non-negative keys.
    */
  def modPartitionId(key: Column, n: Int): Column = pmod(key, lit(n))

  /** Mrs `IterativeMR` (SURVEY §3.1 EP3) [mrs: mrs/mapreduce.py]:
    * driver-controlled iteration. `producer(state, round)` builds and
    * submits round `round`'s work (1-based) and returns the new state;
    * `consumer(state, round)` folds it and returns false to stop —
    * exactly Mrs's producer/consumer split, with Spark actions standing
    * in for `job.wait`. Convergence control stays ON THE DRIVER and the
    * per-round state should be O(model) (centroids, a swarm, partition
    * counts) — never O(data).
    */
  def iterate[S](init: S, maxRounds: Int = Int.MaxValue)(
      producer: (S, Int) => S)(
      consumer: (S, Int) => Boolean): S = {
    var s = init
    var t = 0
    var go = true
    while (go && t < maxRounds) {
      t += 1
      s = producer(s, t)
      go = consumer(s, t)
    }
    s
  }

  /** Mrs `GeneratorCallbackMR` (SURVEY §3.1 EP3) [mrs: mrs/mapreduce.py]:
    * overlapped iteration — the generator schedules EVERY batch's job
    * up-front (all Spark jobs in flight concurrently; the local and
    * cluster schedulers interleave them), while the callback consumes
    * results strictly in batch order, folding `state` and returning
    * `(newState, continue)`; `continue = false` stops consuming (later
    * in-flight batches are simply dropped, like Mrs halting its
    * generator).
    */
  def generate[R, S](init: S, nBatches: Int)(
      generator: Int => scala.concurrent.Future[R])(
      callback: (S, R, Int) => (S, Boolean)): S = {
    import scala.concurrent.{Await, duration}
    val futures = (0 until nBatches).map(generator)
    var s = init
    var b = 0
    var go = true
    while (go && b < nBatches) {
      val r = Await.result(futures(b), duration.Duration.Inf)
      val (ns, cont) = callback(s, r, b)
      s = ns
      go = cont
      b += 1
    }
    s
  }
}
