package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

/** SCALECHECK probe for the embedding-LSH band-width lever: measures
  * the d5/s4 family at the GATE config (16-bit sketch, 4-bit bands —
  * constant 16-bucket band space, hence quadratic candidates) against
  * the AT-SCALE config (64-bit sketch, 16-bit bands) on the same
  * corpus, plus a sampled-exact recall check at the dedup-relevant
  * cosine threshold. Prints one JSON line; SCALECHECK.md records a run
  * at sf1.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/graft_sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", shufflePartitions = cpus.toInt).getOrCreate()
    functions.GraftFunctions.registerAll(spark)
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, dir)

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    // d5's pair stage: the DERIVED default (scaleSafeLsh of the corpus
    // count — what a naive caller gets) plus the fixed configs for the
    // lever table (threshold 0.15 = d5's default)
    val nVec = t.embeddings.count()
    val derived = graft.operators.scaleSafeLsh(nVec)
    val (pairsDefault, defaultSec) = timed(Dedup.embeddingPairs(t, 0.15).count())
    val (pairsGate, gateSec) =
      timed(Dedup.embeddingPairs(t, 0.15, nbits = 16, bandBits = 4).count())
    val (pairsScaled, scaledSec) =
      timed(Dedup.embeddingPairs(t, 0.15, nbits = 64, bandBits = 16).count())
    val (pairsMid, midSec) =
      timed(Dedup.embeddingPairs(t, 0.15, nbits = 64, bandBits = 8).count())

    // s4: derived default and the fixed configs (full k-NN graph)
    val (_, knnDefaultSec) = timed(Similarity.knnGraph(t).count())
    val (_, knnGateSec) =
      timed(Similarity.knnGraph(t, nbits = 16, bandBits = 4).count())
    val (_, knnScaledSec) =
      timed(Similarity.knnGraph(t, nbits = 64, bandBits = 16).count())

    // sampled-exact recall at the NEAR-DUP threshold (cos >= 0.5, the
    // pairs a dedup pass must not miss): every 10th vector probes the
    // whole corpus exactly; the scaled config's hits are compared on
    // the same probe set
    val emb = t.embeddings.select(col("vec_id"), col("embedding")).localCheckpoint(true)
    val probes = emb.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("id_p"), col("embedding").as("emb_p"))
    val exact = probes.crossJoin(emb)
      .filter(col("id_p") < col("vec_id"))
      .filter(functions.GraftFunctions.cosine_sim(col("emb_p"), col("embedding")) >= 0.5)
      .select(col("id_p").as("id_a"), col("vec_id").as("id_b"))
      .localCheckpoint(true)
    val nExact = exact.count()
    def recallOf(nbits: Int, bandBits: Int): Double = {
      val found = Dedup.embeddingPairs(t, 0.5, nbits, bandBits)
        .select(col("id_a"), col("id_b"))
      val hit = exact.join(found, Seq("id_a", "id_b")).count()
      if (nExact == 0) 1.0 else hit.toDouble / nExact
    }
    val rGate = recallOf(16, 4)
    val rMid = recallOf(64, 8)
    val rScaled = recallOf(64, 16)

    def d(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"metric":"scale_probe","dir":"$dir","nvec":$nVec,""" +
      s""""derived":[${derived._1},${derived._2}],""" +
      s""""d5_default":{"sec":${d(defaultSec)},"pairs":$pairsDefault},""" +
      s""""d5_gate_16x4":{"sec":${d(gateSec)},"pairs":$pairsGate,"recall_cos05":${d(rGate)}},""" +
      s""""d5_mid_64x8":{"sec":${d(midSec)},"pairs":$pairsMid,"recall_cos05":${d(rMid)}},""" +
      s""""d5_scaled_64x16":{"sec":${d(scaledSec)},"pairs":$pairsScaled,"recall_cos05":${d(rScaled)}},""" +
      s""""s4_default_sec":${d(knnDefaultSec)},"s4_gate_16x4_sec":${d(knnGateSec)},""" +
      s""""s4_scaled_64x16_sec":${d(knnScaledSec)},""" +
      s""""exact_cos05_sampled":$nExact}""")
    spark.stop()
  }
}
