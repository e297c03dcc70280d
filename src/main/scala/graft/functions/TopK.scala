package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Grouped top-k as a partial-aggregatable bounded buffer.
  *
  * The window formulation (`row_number() over (partition by q order by
  * score desc)` then `rank <= k`) shuffles and sorts EVERY scored row —
  * at 100 TB of candidates that sort is the dominant cost of an ANN
  * query. This Aggregator keeps a k-bounded buffer per group, combines
  * map-side (ObjectHashAggregate keeps the buffer as a live object, no
  * per-row serialization), and ships only k rows per group per
  * partition across the shuffle.
  *
  * Selection order is EXACTLY (score desc, id asc) — the same total
  * order the window formulation uses — so results are bit-identical
  * and the DuckDB row_number oracle still applies.
  */
object TopK {

  /** (score, id) ordered by score desc then id asc, with NaN ranked
    * ABOVE every number — the ordering both Spark's window `desc` and
    * DuckDB's ORDER BY ... DESC use, so a NaN score (e.g. cosine of a
    * zero-norm vector) ranks identically to the oracle formulation. */
  private def better(aScore: Double, aId: Long, bScore: Double, bId: Long): Boolean = {
    val aNaN = aScore.isNaN; val bNaN = bScore.isNaN
    if (aNaN != bNaN) aNaN
    else if (!aNaN && aScore != bScore) aScore > bScore
    else aId < bId
  }

  final case class Buf(var scores: Array[Double], var ids: Array[Long])

  /** Insertion-sorted bounded buffer; k is small (top-k), so O(k)
    * insertion beats heap constant factors and keeps the buffer sorted
    * for free. */
  private def insert(b: Buf, k: Int, score: Double, id: Long): Buf = {
    val n = b.scores.length
    if (n == k && !better(score, id, b.scores(n - 1), b.ids(n - 1))) return b
    var pos = n
    while (pos > 0 && better(score, id, b.scores(pos - 1), b.ids(pos - 1))) pos -= 1
    val m = math.min(n + 1, k)
    val ns = new Array[Double](m); val ni = new Array[Long](m)
    System.arraycopy(b.scores, 0, ns, 0, pos)
    System.arraycopy(b.ids, 0, ni, 0, pos)
    ns(pos) = score; ni(pos) = id
    val tail = m - pos - 1
    if (tail > 0) {
      System.arraycopy(b.scores, pos, ns, pos + 1, tail)
      System.arraycopy(b.ids, pos, ni, pos + 1, tail)
    }
    Buf(ns, ni)
  }

  def aggregator(k: Int): Aggregator[(Double, Long), Buf, Seq[(Long, Double)]] =
    new Aggregator[(Double, Long), Buf, Seq[(Long, Double)]] {
      def zero: Buf = Buf(Array.empty, Array.empty)
      def reduce(b: Buf, a: (Double, Long)): Buf = insert(b, k, a._1, a._2)
      def merge(x: Buf, y: Buf): Buf = {
        var acc = x
        var i = 0
        while (i < y.scores.length) { acc = insert(acc, k, y.scores(i), y.ids(i)); i += 1 }
        acc
      }
      def finish(b: Buf): Seq[(Long, Double)] =
        b.ids.toSeq.zip(b.scores.toSeq)
      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[Seq[(Long, Double)]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
    }

  /** `scored(groupCol, idCol, scoreCol)` → one row per (group, rank) for
    * the k best ids per group; output columns (groupCol, idCol,
    * scoreCol, rank) match the window formulation exactly. */
  def perGroup(scored: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, k: Int): DataFrame = {
    val topk = udaf(aggregator(k))
    // a null score (nullable cosine) would crash the primitive input
    // encoder; the window formulation ranks nulls last and they can
    // never enter a top-k that any non-null candidate fills — dropping
    // them matches for k <= non-null candidate count
    scored.filter(col(scoreCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(topk(col(scoreCol), col(idCol)).as("_top"))
      .select(col(groupCol), posexplode(col("_top")))
      .select(col(groupCol),
        col("col._1").as(idCol),
        col("col._2").as(scoreCol),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** [[Buf]] with one LONG of rider data per entry. The payload NEVER
    * participates in the selection order — (score desc, id asc)
    * exactly as [[better]] — it just travels with its row, so a
    * consumer that needs per-row attributes of the winners (the hybrid
    * fusion's per-arm ranks) gets them out of the SAME single pass
    * instead of re-joining the scored frame — which would evaluate the
    * whole scoring pipeline a second time (VERDICT r10 #2). */
  final case class PBuf(var scores: Array[Double], var ids: Array[Long],
    var pays: Array[Long])

  private def insertP(b: PBuf, k: Int, score: Double, id: Long,
      pay: Long): PBuf = {
    val n = b.scores.length
    if (n == k && !better(score, id, b.scores(n - 1), b.ids(n - 1))) return b
    var pos = n
    while (pos > 0 && better(score, id, b.scores(pos - 1), b.ids(pos - 1))) pos -= 1
    val m = math.min(n + 1, k)
    val ns = new Array[Double](m); val ni = new Array[Long](m)
    val np = new Array[Long](m)
    System.arraycopy(b.scores, 0, ns, 0, pos)
    System.arraycopy(b.ids, 0, ni, 0, pos)
    System.arraycopy(b.pays, 0, np, 0, pos)
    ns(pos) = score; ni(pos) = id; np(pos) = pay
    val tail = m - pos - 1
    if (tail > 0) {
      System.arraycopy(b.scores, pos, ns, pos + 1, tail)
      System.arraycopy(b.ids, pos, ni, pos + 1, tail)
      System.arraycopy(b.pays, pos, np, pos + 1, tail)
    }
    PBuf(ns, ni, np)
  }

  def aggregatorWithPayload(k: Int)
      : Aggregator[(Double, Long, Long), PBuf, Seq[(Long, Double, Long)]] =
    new Aggregator[(Double, Long, Long), PBuf, Seq[(Long, Double, Long)]] {
      def zero: PBuf = PBuf(Array.empty, Array.empty, Array.empty)
      def reduce(b: PBuf, a: (Double, Long, Long)): PBuf =
        insertP(b, k, a._1, a._2, a._3)
      def merge(x: PBuf, y: PBuf): PBuf = {
        var acc = x
        var i = 0
        while (i < y.scores.length) {
          acc = insertP(acc, k, y.scores(i), y.ids(i), y.pays(i)); i += 1
        }
        acc
      }
      def finish(b: PBuf): Seq[(Long, Double, Long)] =
        b.ids.indices.map(i => (b.ids(i), b.scores(i), b.pays(i)))
      def bufferEncoder: Encoder[PBuf] = Encoders.product[PBuf]
      def outputEncoder: Encoder[Seq[(Long, Double, Long)]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double, Long)]]()
    }

  /** [[perGroup]] plus one rider LONG per row: output columns
    * (groupCol, idCol, scoreCol, payloadCol, rank). Selection order is
    * identical to [[perGroup]] — the payload is cargo, never a key. */
  def perGroupWithPayload(scored: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, payloadCol: String, k: Int): DataFrame = {
    val topk = udaf(aggregatorWithPayload(k))
    scored.filter(col(scoreCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(topk(col(scoreCol), col(idCol), col(payloadCol)).as("_top"))
      .select(col(groupCol), posexplode(col("_top")))
      .select(col(groupCol),
        col("col._1").as(idCol),
        col("col._2").as(scoreCol),
        col("col._3").as(payloadCol),
        (col("pos") + 1).cast("long").as("rank"))
  }
}
