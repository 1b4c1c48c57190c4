package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}

/** Functional operator layer — capability parity with the reference's
  * `Functional` mixin (kafi/functional.py:12-145): map / filter / flatmap /
  * foldl / foreach and the cross-storage `*_to` variants.
  *
  * Two surfaces, matching SURVEY §2.6's mapping of kafi's lambda-everywhere
  * API:
  *  - Column-expression variants (preferred): stay inside whole-stage codegen.
  *  - Typed Dataset variants (general escape hatch): arbitrary Scala closures,
  *    the honest equivalent of the reference's Python lambdas.
  *
  * The `*_to` cross-storage variants are read→transform→write composed in a
  * single Spark plan (kafi/functional.py:71-145 buffers batches between a
  * consumer and a producer; here the exchange is the shuffle-free pipeline
  * Catalyst builds).
  */
object Functional {

  // ---- Column-expression variants (codegen'd, preferred at scale) ----

  /** map — 1→1 projection (kafi/functional.py:51-55). */
  def map(df: DataFrame)(cols: Column*): DataFrame = df.select(cols: _*)

  /** filter — predicate (kafi/functional.py:57-61). */
  def filter(df: DataFrame)(pred: Column): DataFrame = df.filter(pred)

  /** flatmap — 1→N via a generator column, e.g. explode(...)
    * (kafi/functional.py:43-49). */
  def flatmap(df: DataFrame)(generator: Column, keep: Column*): DataFrame =
    df.select(keep :+ generator: _*)

  // ---- Typed variants (arbitrary closures) ----

  def mapTyped[T, U: Encoder](ds: Dataset[T])(f: T => U): Dataset[U] = ds.map(f)

  def filterTyped[T](ds: Dataset[T])(f: T => Boolean): Dataset[T] = ds.filter(f)

  def flatmapTyped[T, U: Encoder](ds: Dataset[T])(f: T => IterableOnce[U]): Dataset[U] =
    ds.flatMap(f)

  /** foreach — side-effects on executors (kafi/functional.py:63-67). */
  def foreach[T](ds: Dataset[T])(f: T => Unit): Unit = ds.foreach(f)

  /** foldl — distributed left-fold (kafi/functional.py:12-39).
    *
    * The reference folds sequentially on one core; the distributed analogue
    * requires a partition-merge function. For genuinely non-mergeable folds
    * the reference semantics only exist single-threaded — callers should
    * restructure as an Aggregator (see graft.streams.ZSet.groupByAgg) or
    * accept per-partition fold + merge.
    */
  def foldl[T, B: scala.reflect.ClassTag](ds: Dataset[T])(zero: B)(
      seqOp: (B, T) => B, combOp: (B, B) => B): B =
    ds.rdd.treeAggregate(zero)(seqOp, combOp)

  // ---- Cross-storage variants: one plan, read→transform→write ----

  /** map_to / filter_to / flatmap_to (kafi/functional.py:71-145): the
    * transform composed with a sink writer. `write` is typically
    * FileStorage.produce or a Kafka sink. */
  def mapTo(df: DataFrame, write: DataFrame => Unit)(cols: Column*): Unit =
    write(map(df)(cols: _*))

  def filterTo(df: DataFrame, write: DataFrame => Unit)(pred: Column): Unit =
    write(filter(df)(pred))

  def flatmapTo(df: DataFrame, write: DataFrame => Unit)(generator: Column, keep: Column*): Unit =
    write(flatmap(df)(generator, keep: _*))
}
