package graft.ops

import org.apache.spark.sql.DataFrame

/** Reliable-vs-local checkpoint switch for the iterative operators
  * (semDedup's level loop, clusters' label propagation, clustersStar's
  * contraction rounds — every loop that truncates lineage per round).
  *
  * Default: `localCheckpoint` — right for a single-box session, but
  * its blocks live ON EXECUTORS with truncated lineage, so on a
  * multi-hour cluster run losing ONE executor makes the loop state
  * unrecomputable and kills the job (the r14 semDedup finding,
  * generalized r15 to the whole iterative family). With session conf
  * `spark.graft.checkpointDir` set, every call is a RELIABLE
  * `Dataset.checkpoint` under that directory instead: executor loss
  * re-reads checkpoint files, and nothing pins block-manager storage.
  *
  * Contract: the caller owns the directory's lifecycle — Spark does
  * not clean reliable checkpoints by default, and iterative loops
  * write one checkpoint per round ([[Dedup.freeCheckpoint]] frees
  * superseded LOCAL blocks and is a harmless no-op on reliable
  * checkpoints, whose files stay until the directory is cleaned). */
private[graft] object Ckpt {
  val ConfKey = "spark.graft.checkpointDir"

  /** The dir LAST APPLIED per context — an exact record, not a
    * substring probe against getCheckpointDir (which returns the
    * UUID subdirectory Spark creates, so a prefix match could
    * silently skip re-pointing when the conf changes). */
  private val applied =
    new java.util.concurrent.ConcurrentHashMap[org.apache.spark.SparkContext, String]

  def apply(df: DataFrame, eager: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey) match {
      case Some(d) =>
        val sc = spark.sparkContext
        if (applied.put(sc, d) != d) sc.setCheckpointDir(d)
        df.checkpoint(eager)
      case None => df.localCheckpoint(eager)
    }
  }
}
