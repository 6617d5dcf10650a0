package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval/theta) join: match each left row's point value to right
  * rows whose [lo, hi) interval contains it.
  *
  * Spark plans a naive `l.v >= r.lo && l.v < r.hi` join as
  * BroadcastNestedLoopJoin — O(n·m) and a scale killer. [[byBucket]] is
  * the standard banding decomposition: quantize the value space into
  * fixed-width buckets, explode each interval into the buckets it covers,
  * equi-join on the bucket id, then re-apply the exact predicate. The
  * shuffle key is the bucket id, cost is O(n + m·bands + candidates) —
  * the same trick as the MinHash band join, applied to numeric ranges.
  */
object RangeJoin {

  /** @param left       rows with a numeric point column
    * @param pointCol   left point column name
    * @param right      rows with [loCol, hiCol) intervals
    * @param bucketWidth quantization width — pick ~ median interval width
    */
  def byBucket(left: DataFrame, pointCol: String,
      right: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    val lb = left.withColumn("__bucket", floor(col(pointCol) / bucketWidth).cast("long"))
    val rb = right.withColumn("__bucket",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        // hi is exclusive: a hi exactly on a bucket edge does not reach
        // into the next bucket
        floor((col(hiCol) - lit(1e-9)) / bucketWidth).cast("long"))))
    lb.join(rb, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }
}
