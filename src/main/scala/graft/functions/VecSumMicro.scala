package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed element-wise vector-sum aggregate (the custom-aggregate rung
  * of the extension ladder: `Aggregator[IN, BUF, OUT]`, registered
  * with `functions.udaf`).
  *
  * Sums `array<double>` columns element-wise in exact micro-units:
  * each element contributes `floor(x * 1e6)` to a per-dimension Long
  * accumulator, so the result is an integer sum — associative,
  * commutative, and therefore identical under any partitioning or
  * merge order (the same reason `graft.Cols` sums doubles as
  * DECIMAL(38,6)). Used for embedding centroids: one pass, no 64×
  * posexplode row blow-up, map-side partial aggregation for free.
  */
class VecSumMicro(dim: Int) extends Aggregator[Seq[Double], Array[Long], Seq[Long]] {
  override def zero: Array[Long] = Array.fill(dim)(0L)

  override def reduce(buf: Array[Long], v: Seq[Double]): Array[Long] = {
    val n = math.min(dim, v.length)
    var i = 0
    while (i < n) {
      buf(i) += math.floor(v(i) * 1e6).toLong
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < dim) {
      a(i) += b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
