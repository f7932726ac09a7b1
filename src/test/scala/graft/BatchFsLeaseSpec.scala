package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions._
import graft.operators.{BatchFs, IvfIndex}

/** Single-writer lease fencing for the additive-log append protocol
  * (round-12 verdict item 2): the marker protocol makes a RE-DELIVERED
  * batch idempotent, but two DIFFERENT writers staging the same bucket
  * would silently interleave — the lease makes the second writer fail
  * loudly, a stale (crashed-writer) lease is taken over by exactly one
  * contender, and a writer whose lease was taken over aborts at the
  * fence instead of committing. */
class BatchFsLeaseSpec extends SparkSpec {

  test("second acquire on a live lease fails loudly; release frees it") {
    val dir = tmpDir("lease-basic")
    val l = BatchFs.acquireLease(dir, "postings")
    val e = intercept[IllegalStateException](BatchFs.acquireLease(dir, "postings"))
    assert(e.getMessage.contains("single-writer lease"))
    // a DIFFERENT scope on the same dir does not conflict (the edge
    // log's edges+minhash composite under one dir)
    val other = BatchFs.acquireLease(dir, "minhash")
    BatchFs.releaseLease(other)
    BatchFs.releaseLease(l)
    val l2 = BatchFs.acquireLease(dir, "postings")
    BatchFs.releaseLease(l2)
  }

  test("exactly one of N simultaneous contenders wins the lease") {
    val dir = tmpDir("lease-race")
    val n = 8
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(n)
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val losses = new java.util.concurrent.atomic.AtomicInteger(0)
    (1 to n).foreach { _ =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          try { BatchFs.acquireLease(dir, "postings"); wins.incrementAndGet(); () }
          catch { case _: IllegalStateException => losses.incrementAndGet(); () }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(30, TimeUnit.SECONDS))
    assert(wins.get() == 1, s"wins=${wins.get()}")
    assert(losses.get() == n - 1)
  }

  test("stale lease (crashed writer) is taken over; the loser's fence aborts") {
    val dir = tmpDir("lease-stale")
    val crashed = BatchFs.acquireLease(dir, "postings")
    // age the lock past the ttl, as a writer that died without release
    val lock = Paths.get(dir, "_lock.postings")
    Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 2 * BatchFs.DefaultLeaseTtlMs))
    val successor = BatchFs.acquireLease(dir, "postings")
    // the crashed writer wakes up mid-commit: its fence must abort
    val e = intercept[IllegalStateException](BatchFs.checkLease(crashed))
    assert(e.getMessage.contains("lease lost"))
    // and its release must NOT delete the successor's lock
    BatchFs.releaseLease(crashed)
    assert(Files.exists(lock))
    BatchFs.checkLease(successor) // successor is unaffected
    BatchFs.releaseLease(successor)
    assert(!Files.exists(lock))
  }

  test("concurrent appendBatch: exactly one commits, the other errors") {
    val dir = tmpDir("lease-append")
    val emb = Tables.embeddings(spark, sfSmall)
    val half = emb.filter(col("vec_id") < 250)
    val idx = IvfIndex.build(half, "vec_id", "embedding", nlist = 2)
    IvfIndex.save(idx, dir)
    idx.postings.unpersist(blocking = false)
    val wave = emb.filter(col("vec_id") >= 250 && col("vec_id") < 300)
    // writer A holds the lease mid-append (between stage and commit)
    val a = BatchFs.acquireLease(dir, "postings")
    // writer B arrives concurrently: must fail loudly, commit nothing
    val eB = intercept[IllegalStateException](
      IvfIndex.appendBatch(spark, dir, wave, "vec_id", "embedding", 7L))
    assert(eB.getMessage.contains("single-writer lease"))
    assert(!Files.exists(BatchFs.markerFor(dir, 7L, "")), "B must not commit")
    // A finishes and releases; B's retry then commits exactly once
    BatchFs.releaseLease(a)
    val n = IvfIndex.appendBatch(spark, dir, wave, "vec_id", "embedding", 7L)
    assert(n == 50L)
    assert(Files.exists(BatchFs.markerFor(dir, 7L, "")))
    // replay of the committed batch stays a no-op (marker short-circuit)
    assert(IvfIndex.appendBatch(spark, dir, wave, "vec_id", "embedding", 7L) == 0L)
    val total = spark.read.parquet(s"$dir/postings").count()
    assert(total == 300L)
  }
}
