package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.IvfIndex

/** Streaming index maintenance (SURVEY.md §7.5): continuous append of
  * newly-arrived vectors into a persisted IVF index, with scheduled
  * re-training as a separate batch generation step.
  *
  * Shape: each micro-batch is bucketed by the frozen centroids via the
  * narrow [[graft.functions.NearestList]] assignment (no join, no
  * shuffle) and appended under the matching `list_id=` partition
  * directories — the same layout searches partition-prune against, so
  * an appended vector is visible to the next search that lists the
  * directory. Centroid drift is observed via [[IvfIndex.listStats]];
  * when a list's share exceeds policy, [[IvfIndex.retrain]] writes a
  * fresh immutable generation and the serving path swaps directories.
  * At scale the file stream becomes Kafka; `foreachBatch` + idempotent
  * partitioned append is the standard exactly-once-enough sink for
  * this shape.
  */
object IndexMaintenance {

  /** Start a streaming append job: every micro-batch of
    * (`idCol`, `embCol`) rows is assigned and appended to the
    * persisted index at `dir`. AvailableNow processes the backlog and
    * stops — swap the trigger for a continuous one in a long-lived
    * job.
    *
    * `checkpointDir` makes the job RESTARTABLE: the file-source offsets
    * commit there, so a relaunch after a stop (or a crash) resumes
    * from the first unprocessed file instead of re-appending the whole
    * backlog — the restart test pins that no row is appended twice.
    * Without it Spark uses a throwaway checkpoint (fine for tests,
    * never for production). */
  def appendStream(newVectors: DataFrame, dir: String,
                   idCol: String, embCol: String,
                   checkpointDir: Option[String] = None): StreamingQuery = {
    val writer = newVectors.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        IvfIndex.append(batch.sparkSession, dir, batch, idCol, embCol)
        ()
      }
      .trigger(Trigger.AvailableNow())
    checkpointDir.foreach(writer.option("checkpointLocation", _))
    writer.start()
  }
}
