package graft.util

import org.apache.spark.sql.DataFrame

/** Lineage truncation policy for iterative operators (PageRank, connected
  * components): every round must cut lineage or the plan grows without
  * bound, but HOW it cuts is a deployment decision.
  *
  * `localCheckpoint` materializes to EXECUTOR storage — free of a
  * distributed write, fine at local[32], but on a real cluster an executor
  * loss mid-iteration loses its blocks and kills the whole job. Callers on
  * a cluster opt into storage-backed durability with `reliableEvery =
  * Some(k)`: every k-th round (and the round-0 loop invariants) goes
  * through `Dataset.checkpoint` into the configured
  * `SparkContext.setCheckpointDir` (HDFS/object storage); rounds in between
  * keep the cheap local cut, so a lost executor replays at most k-1 rounds
  * from the last durable state instead of failing the job.
  */
object Checkpoints {

  /** Cut lineage at `round` (0 = loop invariants computed before round 1 —
    * these MUST be durable in reliable mode or a later executor loss makes
    * them unrecoverable even though every rank round checkpointed). */
  def cut(df: DataFrame, round: Int, reliableEvery: Option[Int]): DataFrame =
    reliableEvery match {
      case Some(k) =>
        require(k > 0, s"reliableEvery must be positive, got $k")
        require(df.sparkSession.sparkContext.getCheckpointDir.isDefined,
          "reliableEvery is set but no checkpoint dir is configured — call " +
            "SparkContext.setCheckpointDir(<durable storage>) first")
        if (round % k == 0) df.checkpoint() else df.localCheckpoint()
      case None => df.localCheckpoint()
    }
}
