package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative operators (pageRank / PPR / HITS
  * / components / kCore / LPA rounds, the BPE/unigram merge loops,
  * multi-pass dedup), with a durability switch.
  *
  * DEFAULT — `localCheckpoint`: blocks persist on executors only.
  * Fast (no filesystem round-trip), right for `local[*]` and for
  * clusters where re-running the whole job on rare executor loss is
  * acceptable. FAILURE MODE on a real cluster: the truncated lineage
  * cannot recompute a lost block, so ONE lost executor fails every
  * downstream stage of every operator that checkpointed through it —
  * unrecoverably, regardless of `spark.task.maxFailures`.
  *
  * RELIABLE — set `spark.graft.checkpointDir` (session conf) to an
  * HDFS/object-store path and every truncation site switches to
  * `Dataset.checkpoint` against it: blocks live in the cluster
  * filesystem, executor loss recovers by re-reading. Costs one
  * write+read of the checkpointed frame per call — the frames here
  * are the SMALL per-round states (rank vectors, label frontiers,
  * vocabulary tables), not the corpus, so the premium is per-round
  * metadata I/O, not a corpus rewrite.
  *
  * The spark checkpoint directory is adopted from the conf key at
  * first use if the context has none; an explicitly pre-set
  * `SparkContext.setCheckpointDir` wins. Identical results either
  * way (spec-pinned): truncation changes recovery, never values.
  *
  * CLEANUP in reliable mode: iterative operators checkpoint once per
  * round — dozens of frames per invocation — and Spark only deletes
  * them when `spark.cleaner.referenceTracking.cleanCheckpoints=true`
  * (a SparkContext-construction conf; it cannot be set here after
  * the fact). Long-running jobs that adopt `spark.graft.checkpointDir`
  * MUST also set that cleaner flag at submit time, or the checkpoint
  * directory grows without bound. */
object Checkpoints {

  /** Session-conf key naming the reliable checkpoint directory;
    * unset or empty → localCheckpoint (the default posture). */
  val ConfKey = "spark.graft.checkpointDir"

  def truncate(df: DataFrame, eager: Boolean): DataFrame = {
    val session = df.sparkSession
    session.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = session.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint(eager)
      case None => df.localCheckpoint(eager)
    }
  }

  /** `df.truncateLineage(eager)` — drop-in for
    * `df.localCheckpoint(eager)` at every iterative-operator site. */
  implicit final class TruncateOps(private val df: DataFrame)
      extends AnyVal {
    def truncateLineage(eager: Boolean): DataFrame = truncate(df, eager)
  }
}
