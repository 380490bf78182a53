package graft.ext

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k per group as a typed [[Aggregator]] — the scale shape for
  * "k best candidates per query/key".
  *
  * `row_number().over(Window.partitionBy(key))` must shuffle and SORT every
  * candidate row of a key into one partition before it can rank; this
  * aggregator keeps a k-bounded buffer per group instead, so map-side
  * partial aggregation reduces each partition's contribution to ≤ k rows
  * BEFORE the exchange — the shuffle carries O(keys × k), not O(candidates).
  * This is SURVEY §4's deferred "fused top-k" candidate, built on the public
  * Aggregator/udaf API (no catalyst internals).
  *
  * Ordering: score descending, id ascending on ties — identical to the
  * window variant, so results are interchangeable (asserted in ExtSpec).
  */
object TopK {

  type Scored = (Double, Long) // (score, id)

  /** Encoder-friendly buffer/output wrapper (case class ⇒ product encoder). */
  final case class Buf(items: Seq[(Double, Long)])

  private def better(a: Scored, b: Scored): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  final class TopKAggregator(k: Int) extends Aggregator[Scored, Buf, Buf] {
    override def zero: Buf = Buf(Vector.empty)

    override def reduce(b: Buf, a: Scored): Buf =
      if (b.items.length == k && better(b.items.last, a)) b
      else {
        val (front, back) = b.items.span(better(_, a))
        Buf(((front :+ a) ++ back).take(k))
      }

    override def merge(b1: Buf, b2: Buf): Buf =
      b2.items.foldLeft(b1)(reduce)

    override def finish(r: Buf): Buf = r
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }

  /** [[TopKAggregator]] with per-id DEDUP inside the bounded buffer: an id
    * already held is never inserted twice — the better-scored occurrence
    * wins (equal scores keep the incumbent). For candidate streams where
    * the same id recurs with the same deterministic score (a beam frontier
    * unioned with its own neighbor expansion), this is exactly
    * `distinct()` + [[TopKAggregator]] with the distinct EXCHANGE deleted:
    * dedup rides the map-side partial aggregation for free. An id evicted
    * by k better items stays evicted on re-arrival — the bound check
    * rejects it (its score is unchanged), so eviction cannot readmit
    * duplicates. O(k) membership scan per insert; k is small by contract. */
  final class TopKDistinctAggregator(k: Int)
      extends Aggregator[Scored, Buf, Buf] {
    override def zero: Buf = Buf(Vector.empty)

    private def insert(b: Buf, a: Scored): Buf =
      if (b.items.length == k && better(b.items.last, a)) b
      else {
        val (front, back) = b.items.span(better(_, a))
        Buf(((front :+ a) ++ back).take(k))
      }

    override def reduce(b: Buf, a: Scored): Buf = {
      val i = b.items.indexWhere(_._2 == a._2)
      if (i < 0) insert(b, a)
      else if (!better(a, b.items(i))) b
      else insert(Buf(b.items.patch(i, Nil, 1)), a)
    }

    override def merge(b1: Buf, b2: Buf): Buf =
      b2.items.foldLeft(b1)(reduce)

    override def finish(r: Buf): Buf = r
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }

  /** Top-k rows per key from a scored frame: input (keyCol, scoreCol, idCol)
    * → output (keyCol, rank, id, score), rank 1..k by (score desc, id asc).
    * Map-side partial aggregation bounds the shuffle at k rows per
    * (partition, key). */
  def topKPerKey(scored: DataFrame, keyCol: String, scoreCol: String,
                 idCol: String, k: Int): DataFrame =
    topKWith(udaf(new TopKAggregator(k)), scored, keyCol, scoreCol, idCol)

  /** [[topKPerKey]] under [[TopKDistinctAggregator]]: duplicate ids within
    * a key collapse to their best-scored occurrence, without a separate
    * `distinct()` pass over the candidate set. */
  def topKPerKeyDistinct(scored: DataFrame, keyCol: String, scoreCol: String,
                         idCol: String, k: Int): DataFrame =
    topKWith(udaf(new TopKDistinctAggregator(k)), scored, keyCol, scoreCol,
      idCol)

  private def topKWith(agg: org.apache.spark.sql.expressions
                              .UserDefinedFunction,
                       scored: DataFrame, keyCol: String, scoreCol: String,
                       idCol: String): DataFrame = {
    scored
      // a NULL score (e.g. cosine against a zero-norm vector) cannot enter
      // the typed (Double, Long) aggregator — and can never be in a top-k
      .where(col(scoreCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(agg(col(scoreCol), col(idCol)).as("topk"))
      .select(col(keyCol), posexplode(col("topk.items")))
      .toDF(keyCol, "pos", "entry")
      .select(col(keyCol), (col("pos") + 1).cast("int").as("rank"),
        col("entry._2").as("id"), col("entry._1").as("score"))
  }
}
