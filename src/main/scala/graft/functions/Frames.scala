package graft.functions

import org.apache.spark.sql.DataFrame

/** Small frame-plumbing helpers shared by the operators. */
object Frames {

  /** Pin a SMALL (broadcast-sized by construction) frame as a driver-side
    * LocalRelation: evaluated exactly once, so a driver collect and the
    * downstream joins see the same rows even when the upstream plan is
    * nondeterministic — and, unlike `localCheckpoint`, nothing stays
    * pinned in executor storage for the lifetime of the returned plan (a
    * retrieval service calling these operators in a loop would otherwise
    * accumulate dead checkpoint blocks between GC cycles). Only use where
    * the frame is already driver-sized by construction — every call site
    * here feeds a `broadcast()` anyway, which materializes on the driver
    * regardless.
    */
  def pinLocal(df: DataFrame): DataFrame = {
    val rows = java.util.Arrays.asList(df.collect(): _*)
    df.sparkSession.createDataFrame(rows, df.schema)
  }
}
