package graft.geo

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator computing a weighted centroid over (lat, lon, weight)
  * rows — the distributed form of the reference's length-weighted way
  * center (SURVEY §2 E5; OsmMapUtils.java:262-290). Partial aggregation
  * (map-side combine) comes free from the Aggregator contract, so only
  * one (sumLat, sumLon, sumW) triple shuffles per group. */
object WeightedCentroid extends Aggregator[(Double, Double, Double), (Double, Double, Double), (Double, Double)] {
  override def zero: (Double, Double, Double) = (0.0, 0.0, 0.0)
  override def reduce(b: (Double, Double, Double), a: (Double, Double, Double)): (Double, Double, Double) =
    (b._1 + a._1 * a._3, b._2 + a._2 * a._3, b._3 + a._3)
  override def merge(x: (Double, Double, Double), y: (Double, Double, Double)): (Double, Double, Double) =
    (x._1 + y._1, x._2 + y._2, x._3 + y._3)
  override def finish(r: (Double, Double, Double)): (Double, Double) =
    if (r._3 == 0.0) (Double.NaN, Double.NaN) else (r._1 / r._3, r._2 / r._3)
  override def bufferEncoder: Encoder[(Double, Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
}
