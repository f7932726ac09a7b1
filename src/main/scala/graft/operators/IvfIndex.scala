package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.ml.linalg.{Vector => MlVector}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.l2sq

/** IVF (inverted-file) ANN index — the reference's core data structure
  * (FAISS `IndexIVFFlat` over an L2 coarse quantizer,
  * /root/reference/app.py:47-56) re-expressed as two DataFrames:
  *
  *  - `centroids(list_id: Int, centroid: Array[Float])` — the trained
  *    coarse quantizer (k-means, app.py:52 `index.train`);
  *  - `postings(list_id: Int, id: Long, embedding: Array[Float])` —
  *    the inverted lists (app.py:55 `index.add`), persisted
  *    `partitionBy("list_id")` so the Parquet directory layout IS the
  *    inverted file and `nprobe` pruning becomes static partition
  *    pruning at the scan (SURVEY.md §1.1, §4.1).
  *
  * Scale posture: train samples/aggregates via MLlib (distributed
  * Lloyd's); assignment is a broadcast nested-loop against ≤`nlist`
  * centroids (tiny); search scans only the probed partitions — at 100
  * TB a query touches `nprobe/nlist` of the data instead of all of it,
  * exactly the reference's pruning ratio.
  */
object IvfIndex {

  case class Index(centroids: DataFrame, postings: DataFrame) {
    /** Driver-side centroid matrix for nprobe selection (≤ nlist rows —
      * the reference's coarse quantizer is equally driver-tiny). */
    lazy val centroidArrays: Array[(Int, Array[Float])] =
      centroids.select("list_id", "centroid").collect()
        .map(r => r.getInt(0) -> r.getSeq[Float](1).toArray)
  }

  /** Train + assign (reference app.py:47-56). `df` must carry
    * (`idCol`: Long, `embCol`: Array[Float]).
    *
    * Memory hygiene: the training cache (`withVec`) lives only for the
    * duration of fit+transform — postings are materialized, then the
    * training cache is released (round 2 leaked it for the JVM
    * lifetime, degrading every query that ran after a build). */
  def build(df: DataFrame, idCol: String, embCol: String,
            nlist: Int, seed: Long = 42L, maxIter: Int = 20): Index = {
    val spark = df.sparkSession
    // reference parity: building over an empty corpus is an error
    // (app.py:223-228 rejects "no valid sentences"); isEmpty is a
    // limit(1) probe, negligible next to training
    require(!df.isEmpty, "cannot build an IVF index over an empty corpus")
    val withVec = df.select(col(idCol).as("id"), col(embCol).as("embedding"))
      .withColumn("features", array_to_vector(col("embedding")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val model = new KMeans()
      .setK(nlist).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("features").setPredictionCol("list_id")
      .fit(withVec)
    val postings = model.transform(withVec)
      .select(col("list_id"), col("id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    postings.count()
    withVec.unpersist(blocking = false)
    val centroidRows = model.clusterCenters.zipWithIndex.map {
      case (v: MlVector, i) => (i, v.toArray.map(_.toFloat))
    }.toSeq
    val centroids = spark.createDataFrame(centroidRows)
      .toDF("list_id", "centroid")
    Index(centroids, postings)
  }

  /** Persist as a self-contained directory of parquet tables
    * (reference persists index.faiss + sentences.pkl, app.py:116-123;
    * we persist embeddings too so load never re-encodes — declared
    * improvement, SURVEY.md §7.4). */
  def save(index: Index, dir: String): Unit = {
    index.centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    // Repartition by list_id before the partitioned write: without it
    // every shuffle partition emits a sliver into every list directory
    // (parallelism × nlist tiny files), and scan-side file-open
    // overhead dominates pruned searches. One file per list at bench
    // scale; at 100 TB the same write with a higher partition count
    // gives a bounded number of full-size files per list.
    index.postings.repartition(col("list_id"))
      .write.mode("overwrite")
      .partitionBy("list_id").parquet(s"$dir/postings")
  }

  /** Load a saved index (reference app.py:125-147, minus the
    * re-encode). Missing path fails like the reference's
    * FileNotFoundError (app.py:127-128). */
  def load(spark: SparkSession, dir: String): Index = {
    val path = new java.io.File(dir)
    if (!path.exists()) {
      throw new java.io.FileNotFoundException(s"Index directory not found: $dir")
    }
    Index(
      spark.read.parquet(s"$dir/centroids"),
      spark.read.parquet(s"$dir/postings"))
  }

  /** Driver-side nprobe selection: the `nprobe` nearest inverted lists
    * to the query vector (reference coarse quantizer, app.py:69-70).
    * Centroid table is ≤ nlist rows, so this mirrors the reference's
    * driver/library split and lets the postings scan prune partitions
    * statically. */
  def probeLists(index: Index, q: Array[Float], nprobe: Int): Seq[Int] = {
    index.centroidArrays
      .map { case (lid, c) =>
        var acc = 0.0; var i = 0
        while (i < c.length) { val d = c(i) - q(i); acc += d * d; i += 1 }
        (lid, acc)
      }
      .sortBy { case (lid, d) => (d, lid) }
      .take(nprobe).map(_._1).toSeq
  }

  /** IVF search (reference app.py:58-75): probe the nprobe nearest
    * lists, scan only those postings (partition-pruned when the index
    * is parquet-backed), distance + deterministic top-k. Excludes
    * `excludeId` when searching by a stored vector (self-exclusion,
    * app.py:91-93 semantics). */
  def search(index: Index, q: Array[Float], k: Int, nprobe: Int,
             excludeId: Option[Long] = None): DataFrame = {
    val probed = probeLists(index, q, nprobe)
    val base = index.postings
      .filter(col("list_id").isin(probed: _*))
    val noSelf = excludeId.fold(base)(id => base.filter(col("id") =!= id))
    noSelf
      .withColumn("dist", l2sq(col("embedding"), typedlit(q)))
      .orderBy(col("dist").asc, col("id").asc)
      .limit(k)
      .select(col("id"), col("dist"))
  }

  /** Per-query kNN against the index for EVERY vector in `queries`
    * (the reference's batch self-search, app.py:84-85): equi-join on
    * probed list ids — the scale-safe bucketed similarity-join shape
    * (no cartesian product). Returns (src_id, dst_id, dist) with
    * dst ranked per src. */
  def searchAll(index: Index, queries: DataFrame, idCol: String,
                embCol: String, k: Int, nprobe: Int): DataFrame = {
    val cents = index.centroids
    val q = queries.select(col(idCol).as("src_id"), col(embCol).as("src_emb"))
    // rank centroids per query, keep nprobe nearest lists
    val wC = Window.partitionBy(col("src_id"))
      .orderBy(col("cdist").asc, col("list_id").asc)
    val probed = q.join(broadcast(cents))
      .withColumn("cdist", l2sq(col("src_emb"), col("centroid")))
      .withColumn("crank", row_number().over(wC))
      .filter(col("crank") <= nprobe)
      .select(col("src_id"), col("src_emb"), col("list_id"))
    // equi-join probed lists to postings: candidates are only
    // same-bucket pairs — this is the pruning
    val wK = Window.partitionBy(col("src_id"))
      .orderBy(col("dist").asc, col("dst_id").asc)
    probed.join(
        index.postings.select(col("list_id"),
          col("id").as("dst_id"), col("embedding").as("dst_emb")),
        Seq("list_id"))
      .filter(col("src_id") =!= col("dst_id"))
      .withColumn("dist", l2sq(col("src_emb"), col("dst_emb")))
      .withColumn("rank", row_number().over(wK))
      .filter(col("rank") <= k)
      .select(col("src_id"), col("dst_id"), col("dist"), col("rank"))
  }

  // --- per-JVM index cache so repeated query-entry invocations ---
  // --- (Verify, Bench) don't re-train per call                 ---
  private val cache = scala.collection.concurrent.TrieMap.empty[(String, Int), Index]

  /** Build (or fetch cached) index over the sf embeddings table
    * (postings are already persisted+materialized by [[build]]). */
  def forEmbeddings(spark: SparkSession, sfDir: String, nlist: Int): Index =
    cache.getOrElseUpdate((sfDir, nlist),
      build(graft.Tables.embeddings(spark, sfDir), "vec_id", "embedding", nlist))

  private val persistedCache = scala.collection.concurrent.TrieMap.empty[(String, Int), Index]

  /** The reference's full persistence lifecycle (save → load → search,
    * app.py:116-147) as one memoized step: build the sf index, save it
    * partitionBy(list_id), and return the DISK-backed index — searches
    * against it scan the parquet postings with partition pruning, the
    * layout the 100 TB design claims (scaladoc above). Unlike
    * [[forEmbeddings]] nothing is cached in memory: every search is an
    * honest pruned file scan. */
  def persistedForEmbeddings(spark: SparkSession, sfDir: String, nlist: Int): Index =
    persistedCache.getOrElseUpdate((sfDir, nlist), {
      val dir = s"/root/repo/target/ivf-index/${new java.io.File(sfDir).getName}-nlist$nlist"
      save(forEmbeddings(spark, sfDir, nlist), dir)
      load(spark, dir)
    })
}
