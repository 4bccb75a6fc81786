package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed single-pass centroid (elementwise mean) of `Array[Float]` vectors —
  * the `Aggregator` (typed UDAF) tier of the API: one (sum[dim], count)
  * buffer per group, merged associatively, no posexplode fan-out. Used via
  * `ds.groupByKey(_.label).agg(new CentroidAggregator(dim).toColumn)`;
  * VectorOps.centroids is the equivalent oracle-checkable long form. */
class CentroidAggregator(dim: Int)
  extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)

  override def reduce(b: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
    val (s, n) = b
    var i = 0
    while (i < dim && i < v.length) { s(i) += v(i); i += 1 }
    (s, n + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    val (sa, na) = a; val (sb, nb) = b
    var i = 0
    while (i < dim) { sa(i) += sb(i); i += 1 }
    (sa, na + nb)
  }

  override def finish(r: (Array[Double], Long)): Array[Double] = {
    val (s, n) = r
    if (n == 0) s else s.map(_ / n)
  }

  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.tuple(ExpressionEncoder[Array[Double]](), Encoders.scalaLong)

  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}
