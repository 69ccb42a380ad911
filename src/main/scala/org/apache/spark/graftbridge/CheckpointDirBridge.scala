package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Exact save/restore of the SparkContext-global checkpoint directory.
  *
  * The public `setCheckpointDir` wraps EVERY assignment in a fresh UUID
  * subdirectory (and eagerly mkdirs it), so a save/restore pair through the
  * public API nests one directory level per restore — an iterative loop
  * that pins hundreds of rounds (graft's connected-components Pinner) would
  * grow the application's checkpoint path without bound and litter empty
  * UUID dirs. The underlying `checkpointDir` var is `private[spark]`, hence
  * this bridge lives under the spark package (same pattern as
  * [[org.apache.spark.sql.graftbridge.ColumnBridge]]).
  */
object CheckpointDirBridge {
  def get(sc: SparkContext): Option[String] = sc.checkpointDir
  def set(sc: SparkContext, dir: Option[String]): Unit = sc.checkpointDir = dir
}
