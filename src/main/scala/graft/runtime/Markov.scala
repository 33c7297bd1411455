package graft.runtime

import scala.collection.mutable

/** Order-k word-level Markov chain (the reference's
  * processors/data/MarkovChain.java:30-133 trains an order-3 dictionary
  * and random-walks it). Trained once on the driver, serialized with the
  * sampler tree (broadcast-equivalent), walked per row on executors.
  */
final class Markov(order: Int, corpus: String) extends Serializable {
  private val words: Array[String] = corpus.split("\\s+").filter(_.nonEmpty)
  require(words.length > order, "markov: corpus shorter than order")

  private val table: Map[Seq[String], Vector[String]] = {
    val m = mutable.Map.empty[Seq[String], mutable.ArrayBuffer[String]]
    var i = 0
    while (i + order < words.length) {
      val key = words.slice(i, i + order).toSeq
      m.getOrElseUpdate(key, mutable.ArrayBuffer.empty) += words(i + order)
      i += 1
    }
    m.view.mapValues(_.toVector).toMap
  }
  private val starts: Vector[Seq[String]] = table.keys.toVector.sortBy(_.mkString(" "))

  /** Produce n words (MarkovChain.produce contract). */
  def produce(rng: java.util.Random, n: Int): String = {
    val out = mutable.ArrayBuffer.empty[String]
    var state = starts(rng.nextInt(starts.length))
    out ++= state
    while (out.length < n) {
      table.get(state) match {
        case Some(nexts) =>
          val w = nexts(rng.nextInt(nexts.length))
          out += w
          state = state.tail :+ w
        case None =>
          state = starts(rng.nextInt(starts.length))
      }
    }
    out.take(n).mkString(" ")
  }

  /** Produce ~n characters (MarkovChain.produceText contract). */
  def produceText(rng: java.util.Random, nChars: Int): String = {
    val sb = new StringBuilder
    while (sb.length < nChars) {
      if (sb.nonEmpty) sb.append(' ')
      sb.append(produce(rng, 8))
    }
    sb.substring(0, nChars)
  }
}

object Markov {
  lazy val default: Markov = new Markov(2, SeedData.markovTraining)
}
