package graft

import org.apache.spark.sql.functions._
import graft.operators.Upsert

/** Keyed CDC upsert into bucket-partitioned parquet: merge semantics
  * (update wins, insert appends, tombstone removes), touched-bucket-only
  * write amplification, and idempotent re-application. */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def base(n: Int) =
    (0L until n.toLong).map(i => (i, s"doc $i")).toDF("id", "sentence")

  private def tableAsMap(dir: String): Map[Long, String] =
    Upsert.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("upsert: update/insert/tombstone merge semantics") {
    val dir = tmpDir("upsert-") + "/t"
    Upsert.writeBase(base(100), dir, "id", 8)
    val delta = Seq(
      (5L, "doc 5 v2", false),     // update
      (100L, "doc 100 new", false), // insert
      (7L, "", true)               // tombstone
    ).toDF("id", "sentence", "_deleted")
    val touched = Upsert.upsert(spark, dir, delta, "id", 8)
    assert(touched >= 1 && touched <= 3)
    val m = tableAsMap(dir)
    assert(m.size == 100, "100 - 1 deleted + 1 inserted")
    assert(m(5L) == "doc 5 v2")
    assert(m(100L) == "doc 100 new")
    assert(!m.contains(7L))
    assert(m(6L) == "doc 6", "untouched keys unchanged")
  }

  test("upsert rewrites ONLY the touched buckets") {
    val dir = tmpDir("upsert-prune-") + "/t"
    Upsert.writeBase(base(200), dir, "id", 8)
    def bucketFiles(): Map[String, Set[String]] = {
      val root = new java.io.File(dir)
      root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("bucket="))
        .map(d => d.getName -> d.listFiles().map(_.getName)
          .filter(_.endsWith(".parquet")).toSet)
        .toMap
    }
    val before = bucketFiles()
    assert(before.size == 8, "every bucket materialized at n=200")
    val delta = Seq((42L, "doc 42 v2")).toDF("id", "sentence")
    val touched = Upsert.upsert(spark, dir, delta, "id", 8)
    assert(touched == 1)
    val after = bucketFiles()
    val changed = after.keySet.filter(b => before(b) != after(b))
    assert(changed.size == 1,
      s"exactly one bucket dir may change, got $changed")
    // the data survived intact around the update
    val m = tableAsMap(dir)
    assert(m.size == 200 && m(42L) == "doc 42 v2" && m(41L) == "doc 41")
  }

  test("layout metadata: meta-driven upsert works; mismatched parameters are refused") {
    val dir = tmpDir("upsert-meta-") + "/t"
    Upsert.writeBase(base(40), dir, "id", 8)
    assert(Upsert.tableMeta(spark, dir) == (("id", 8)))
    // the 3-arg entry point derives the layout itself
    Upsert.upsert(spark, dir, Seq((1L, "one v2")).toDF("id", "sentence"))
    assert(tableAsMap(dir)(1L) == "one v2")
    // a wrong bucket count would land keys in buckets no merge or
    // pruned read looks in — refused, not silently corrupted
    val e = intercept[IllegalArgumentException] {
      Upsert.upsert(spark, dir, Seq((2L, "two v2")).toDF("id", "sentence"),
        "id", 4)
    }
    assert(e.getMessage.contains("nBuckets=8"))
    intercept[IllegalArgumentException] {
      Upsert.upsert(spark, dir, Seq((2L, "x")).toDF("doc", "sentence"),
        "doc", 8)
    }
  }

  test("re-applying the same upsert is idempotent; empty delta is a no-op") {
    val dir = tmpDir("upsert-idem-") + "/t"
    Upsert.writeBase(base(50), dir, "id", 4)
    val delta = Seq((3L, "three v2", false), (50L, "fifty", false),
      (9L, "", true)).toDF("id", "sentence", "_deleted")
    Upsert.upsert(spark, dir, delta, "id", 4)
    val once = tableAsMap(dir)
    Upsert.upsert(spark, dir, delta, "id", 4)
    assert(tableAsMap(dir) == once, "same delta twice = same table")
    assert(Upsert.upsert(spark, dir, delta.limit(0), "id", 4) == 0)
    assert(tableAsMap(dir) == once)
  }

  test("upsertStream: micro-batched CDC apply across restarts from one checkpoint") {
    val root = tmpDir("upsert-stream-")
    val dir = root + "/table"
    val landing = root + "/landing"
    val ckpt = root + "/ckpt"
    new java.io.File(landing).mkdirs()
    Upsert.writeBase(base(60), dir, "id", 4)
    val schema = Seq((0L, "", false)).toDF("id", "sentence", "_deleted").schema
    def stage(rows: Seq[(Long, String, Boolean)], name: String): Unit = {
      val tmp = tmpDir("upsert-stage-")
      rows.toDF("id", "sentence", "_deleted").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
        .filter(_.toString.endsWith(".parquet"))
        .forEach(p => java.nio.file.Files.move(p,
          java.nio.file.Paths.get(s"$landing/$name.parquet")))
    }
    def run(): Unit =
      graft.streaming.IndexMaintenance.upsertStream(
        spark.readStream.schema(schema).parquet(landing), dir,
        checkpointDir = Some(ckpt)).awaitTermination()
    stage(Seq((1L, "one v2", false), (60L, "sixty", false)), "w0"); run()
    val afterW0 = tableAsMap(dir)
    assert(afterW0.size == 61 && afterW0(1L) == "one v2" && afterW0(60L) == "sixty")
    // second launch, same checkpoint: only the new file is processed;
    // its update supersedes w0's value for the shared key and the
    // tombstone removes a base key
    stage(Seq((60L, "sixty v2", false), (2L, "", true)), "w1"); run()
    val afterW1 = tableAsMap(dir)
    assert(afterW1.size == 60, "one insert + one delete from 60 base rows")
    assert(afterW1(60L) == "sixty v2", "batch order is CDC order")
    assert(!afterW1.contains(2L))
    assert(afterW1(1L) == "one v2", "w0's untouched keys survive w1")
    // third launch with nothing new: a no-op
    run()
    assert(tableAsMap(dir) == afterW1)
  }

  test("a delta that empties a bucket deletes its directory") {
    val dir = tmpDir("upsert-empty-") + "/t"
    // 4 rows in 2 buckets; tombstone every key of one bucket
    val rows = base(4)
    Upsert.writeBase(rows, dir, "id", 2)
    val withB = rows.withColumn("bucket",
      pmod(xxhash64(col("id")), lit(2L)).cast("int"))
    val victims = withB.filter(col("bucket") === 0).select("id", "sentence")
      .withColumn("_deleted", lit(true))
    assert(victims.count() > 0, "fixture needs a non-empty bucket 0")
    Upsert.upsert(spark, dir, victims, "id", 2)
    val m = tableAsMap(dir)
    assert(m.keySet == withB.filter(col("bucket") === 1)
      .select("id").as[Long].collect().toSet)
    assert(!new java.io.File(s"$dir/bucket=0").exists(),
      "emptied bucket directory must be gone")
  }
}
