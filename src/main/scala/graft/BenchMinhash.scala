package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Stage-level profile of the fast near-dup path (q_dedup_minhash_fast):
  * splits the end-to-end wall into signature computation, capped LSH
  * candidate generation, and exact-Jaccard verification, with the
  * candidate and verified pair counts — the numbers that say WHERE a
  * scale-up's growth lands (candidate space vs verify arithmetic) and
  * therefore which lever to pull. Run on a tiled SF dir (the sf1/sf10
  * growth study in BASELINE.md).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt "runMain graft.BenchMinhash"
  */
object BenchMinhash {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the q_dedup_minhash_fast contract slice
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 7 === 0)
      .localCheckpoint(true)
    val nDocs = docs.count()

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // stage 1: one-pass native minhash signatures
    val (_, sigSecs) = timed {
      Dedup.minhashSignatureFast(docs, "text", 16).count()
    }
    // stage 2: capped banded candidates (includes its own signature pass —
    // report the delta as banding cost). The sizeGate MUST match what
    // nearDupPairsFast passes, or candSecs measures a different (ungated,
    // more expensive) plan and verify_secs = full - cand misattributes
    val (nCand, candSecs) = timed {
      Dedup.fastCandidatePairs(docs, "doc_id", "text", 16, 2, 1000,
        sizeGate = Some(0.9)).count()
    }
    // stage 3: full query (candidates + exact verify)
    val (nVer, fullSecs) = timed {
      Dedup.nearDupPairsFast(docs, "doc_id", "text", 16, 2, 0.9, 1000).count()
    }
    println(
      s"""{"metric":"minhash_fast_stages","sf_dir":"$sfDir","docs":$nDocs,""" +
        s""""sig_secs":$sigSecs,"cand_secs":$candSecs,"full_secs":$fullSecs,""" +
        s""""verify_secs":${fullSecs - candSecs},"candidates":$nCand,"verified":$nVer}""")

    // ---- sub-stage breakdown: a profiling replica of cappedCandidatePairs'
    // levels (same expressions as Dedup.fastCandidatePairs), each level
    // counted separately so the growth attributes to a specific join
    val numHashes = 16; val rowsPerBand = 2; val cap = 1000
    val numBands = numHashes / rowsPerBand
    val sigs = Dedup.minhashSignatureFast(docs, "text", numHashes)
    def bandHash(b: Int) =
      xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))
    def refine(b: Int) = bandHash((b + 1) % numBands)
    val bands = (0 until numBands).map { b =>
      sigs.select(lit(b).as("band"), bandHash(b).as("bucket_hash"),
        col("doc_id").as("__id"), refine(b).as("__refine"))
    }
    val (bandsU, bandSecs) = timed {
      val u = bands.reduce(_.unionByName(_)).localCheckpoint(true)
      u.count(); u
    }
    val overCap = bandsU.groupBy(col("band"), col("bucket_hash"))
      .agg(count(lit(1)).as("__n")).filter(col("__n") > cap)
    val ((nOver, overRows), overSecs) = timed {
      val oc = overCap.localCheckpoint(true)
      (oc.count(), oc.agg(coalesce(sum("__n"), lit(0L))).collect()(0).getLong(0))
    }
    val sane = bandsU.join(broadcast(overCap), Seq("band", "bucket_hash"), "left_anti")
      .select(col("band"), col("bucket_hash"), col("__id"))
    val (nSane, saneSecs) = timed {
      sane.as("x").join(sane.as("y"),
        col("x.band") === col("y.band") &&
          col("x.bucket_hash") === col("y.bucket_hash") &&
          col("x.__id") < col("y.__id")).count()
    }
    val big = bandsU.join(broadcast(overCap), Seq("band", "bucket_hash"))
      .withColumn("__sub", col("__refine"))
    val subStats = big.groupBy(col("band"), col("bucket_hash"), col("__sub"))
      .agg(count(lit(1)).as("__m"))
    val bigB = big.join(broadcast(subStats), Seq("band", "bucket_hash", "__sub"))
      .select(col("band"), col("bucket_hash"), col("__sub"), col("__id"), col("__m"))
      .localCheckpoint(true)
    val smallSub = bigB.filter(col("__m") <= cap)
    val (nSmall, smallSecs) = timed {
      smallSub.as("x").join(smallSub.as("y"),
        col("x.band") === col("y.band") &&
          col("x.bucket_hash") === col("y.bucket_hash") &&
          col("x.__sub") === col("y.__sub") &&
          col("x.__id") < col("y.__id")).count()
    }
    val effCell = 64
    val overG = bigB.filter(col("__m") > cap)
      .withColumn("__cell", pmod(
        conv(substring(md5(concat_ws(":", col("band"), col("__id"))), 1, 15), 16, 10)
          .cast("long"),
        ceil(col("__m") / lit(effCell.toDouble)).cast("long")))
    val cellStats = overG.groupBy(col("band"), col("bucket_hash"), col("__sub"), col("__cell"))
      .agg(count(lit(1)).as("__cm"), min(col("__id")).as("__chub"))
    val overC = overG.join(cellStats, Seq("band", "bucket_hash", "__sub", "__cell"))
    val saneCell = overC.filter(col("__cm") <= cap)
    val (nCell, cellSecs) = timed {
      saneCell.as("x").join(saneCell.as("y"),
        col("x.band") === col("y.band") &&
          col("x.bucket_hash") === col("y.bucket_hash") &&
          col("x.__sub") === col("y.__sub") &&
          col("x.__cell") === col("y.__cell") &&
          col("x.__id") < col("y.__id")).count()
    }
    println(
      s"""{"metric":"minhash_fast_substages","sf_dir":"$sfDir","docs":$nDocs,""" +
        s""""band_secs":$bandSecs,"over_secs":$overSecs,"over_buckets":$nOver,"over_rows":$overRows,""" +
        s""""sane_pairs":$nSane,"sane_secs":$saneSecs,""" +
        s""""small_pairs":$nSmall,"small_secs":$smallSecs,""" +
        s""""cell_pairs":$nCell,"cell_secs":$cellSecs}""")
    spark.stop()
  }
}
