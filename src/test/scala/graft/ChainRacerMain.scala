package graft

import graft.sources.{GenerationChain, PosixStoreIO}

/** Second-JVM racer for the cross-process chain spec: claims and
  * publishes `n` segments of `base` against the chain at `dir`,
  * committing tags `<prefix>:1..n`. Exits non-zero on ANY protocol
  * error (a torn read would fail the strict parse; a lost update would
  * surface as a duplicate claim in the parent's final assertion). Runs
  * with no Spark session — the chain is pure filesystem CAS, which is
  * exactly what the spec wants to race across OS processes.
  */
object ChainRacerMain {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val base = args(1).toLong
    val n = args(2).toInt
    val prefix = args(3)
    val chain = new GenerationChain(dir, PosixStoreIO)
    (1 to n).foreach { i =>
      val g = chain.claim()
      chain.publishSegment(g, base, Some(s"$prefix:$i"))
    }
    println(s"RACER_DONE $prefix")
  }
}
