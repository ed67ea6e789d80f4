package graft.mr

import org.apache.spark.sql.{Dataset, Encoder, Encoders, KeyValueGroupedDataset}

/** The classic MapReduce programming model (Dean & Ghemawat, OSDI 2004
  * §2 — the semantics every "MapReduce-Server" implements), re-expressed
  * as a thin veneer over typed Datasets so legacy map/reduce jobs port
  * verbatim while EXECUTING as Catalyst plans:
  *
  *   map:     `(K1,V1) → list(K2,V2)`  — `flatMap`
  *   combine: map-side partial reduce  — automatic in `reduceGroups`
  *                                        (partial aggregation before the
  *                                        shuffle — the combiner is not a
  *                                        user concern on Spark)
  *   shuffle: `hash(K2) mod R`         — the exchange on the group key
  *   reduce:  `(K2, list(V2)) → V3`    — `groupByKey.reduceGroups` /
  *                                        `mapGroups`
  *
  * Prefer the DataFrame operators in `graft.ops` for anything relational
  * — they stay inside whole-stage codegen, while typed lambdas here pay
  * serialization at each boundary. This module exists for genuinely
  * imperative per-record logic and for porting reference jobs 1:1
  * (MapReduceSpec proves wordcount through this API equals the
  * DataFrame wordcount query).
  */
object MapReduce {

  /** map: one input record → any number of (key, value) pairs. */
  def map[I, K: Encoder, V: Encoder](input: Dataset[I])(
      f: I => IterableOnce[(K, V)]): Dataset[(K, V)] = {
    implicit val kv: Encoder[(K, V)] =
      Encoders.tuple(implicitly[Encoder[K]], implicitly[Encoder[V]])
    input.flatMap(f)
  }

  /** shuffle: group by K2 — the hash exchange. */
  def shuffle[K: Encoder, V](pairs: Dataset[(K, V)])
      : KeyValueGroupedDataset[K, (K, V)] =
    pairs.groupByKey(_._1)

  /** reduce with an associative combiner — runs map-side partially
    * (Spark plans a partial aggregate before the exchange, exactly the
    * OSDI §4.3 combiner optimization, without user wiring).
    */
  def reduce[K: Encoder, V: Encoder](pairs: Dataset[(K, V)])(
      combine: (V, V) => V): Dataset[(K, V)] = {
    implicit val kv: Encoder[(K, V)] =
      Encoders.tuple(implicitly[Encoder[K]], implicitly[Encoder[V]])
    shuffle(pairs).reduceGroups((a, b) => (a._1, combine(a._2, b._2)))
      .map { case (_, kvPair) => kvPair }
  }

  /** Full job: map → shuffle → reduce. */
  def run[I, K: Encoder, V: Encoder](input: Dataset[I])(
      mapper: I => IterableOnce[(K, V)])(
      combiner: (V, V) => V): Dataset[(K, V)] =
    reduce(map(input)(mapper))(combiner)

  /** The OSDI §5.3 distributed sort example (TeraSort shape): map each
    * record to a (key, value) pair; the output is TOTALLY ordered by key
    * — a range shuffle (each reducer owns a contiguous key interval, so
    * reducer i's every key ≤ reducer i+1's) followed by a per-reducer
    * sort. No single task ever holds more than one partition's worth of
    * data, which is what makes the sort work at 100 TB where a global
    * single-partition ORDER BY cannot. Keys compare by Spark's struct
    * ordering (field by field), matching tuple lexicographic order.
    */
  def sort[I, K: Encoder, V: Encoder](input: Dataset[I], partitions: Int)(
      f: I => (K, V)): Dataset[(K, V)] = {
    implicit val kv: Encoder[(K, V)] =
      Encoders.tuple(implicitly[Encoder[K]], implicitly[Encoder[V]])
    input.map(f)
      .repartitionByRange(partitions, org.apache.spark.sql.functions.col("_1"))
      .sortWithinPartitions("_1")
  }

  /** The reduce-side (repartition) join — the fifth canonical MapReduce
    * usage pattern (tag each side, shuffle both on the key, pair the
    * sides inside each reduce group). Expressed as `cogroup` so each
    * input shuffles exactly ONCE on the join key and the pairing runs
    * per key group with no driver involvement — the hand-rolled
    * equivalent of the shuffled hash join Catalyst plans for the
    * DataFrame spelling (which remains the right tool for relational
    * work; this exists so a legacy tagged-join job ports 1:1).
    * Inner-join semantics: keys present on only one side emit nothing.
    * The right side's values are materialized per GROUP (the classic
    * MR reduce-side join memory shape — bounded by the key's fan-in,
    * not the relation).
    */
  def join[K: Encoder, A: Encoder, B: Encoder](
      left: Dataset[(K, A)], right: Dataset[(K, B)]): Dataset[(K, A, B)] = {
    implicit val out: Encoder[(K, A, B)] = Encoders.tuple(
      implicitly[Encoder[K]], implicitly[Encoder[A]], implicitly[Encoder[B]])
    left.groupByKey(_._1).cogroup(right.groupByKey(_._1)) { (k, as, bs) =>
      val bl = bs.map(_._2).toIndexedSeq
      as.flatMap(a => bl.iterator.map(b => (k, a._2, b)))
    }
  }
}
