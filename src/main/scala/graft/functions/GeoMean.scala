package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** SURVEY.md §2.K udaf_geomean — typed custom aggregator: geometric mean
  * via Σln(x) (numerically safe product). Partial aggregation works like
  * any builtin: reduce per partition, merge across — no driver funnel. */
object GeoMean extends Aggregator[Double, (Double, Long), Double] {
  def zero: (Double, Long) = (0.0, 0L)
  def reduce(b: (Double, Long), x: Double): (Double, Long) =
    (b._1 + math.log(x), b._2 + 1L)
  def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)
  def finish(r: (Double, Long)): Double =
    if (r._2 == 0L) Double.NaN else math.exp(r._1 / r._2)
  def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
