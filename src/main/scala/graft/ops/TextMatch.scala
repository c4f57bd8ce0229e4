package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multi-pattern literal matching at corpus scale: one Aho-Corasick
  * automaton over ALL patterns, broadcast once, one linear pass per
  * document — the 100 TB shape for large blocklists / PII term sets,
  * where the naive alternative (one regexp/contains scan per pattern)
  * is O(patterns × corpus) and rescans every byte per pattern. The
  * reference's curation layer greps documents for term sets
  * (decontamination, URL blocklists); this is the same operation with
  * the per-document cost independent of the pattern count.
  *
  * Counting is ALL occurrences (overlapping included) — the automaton
  * reports every node whose suffix chain hits a pattern terminal, so
  * `aa` in `aaa` counts twice.
  */
object TextMatch {

  /** Immutable serializable automaton: dense per-node link maps, BFS
    * fail links, per-node aggregated pattern-hit lists. Built on the
    * driver, broadcast to executors.
    */
  final class AhoCorasick(val patterns: IndexedSeq[String]) extends Serializable {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty), "empty pattern")
    // trie
    private val next = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.HashMap.empty[Char, Int])
    private val hits = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var node = 0
      p.foreach { ch =>
        node = next(node).getOrElseUpdate(ch, {
          next += scala.collection.mutable.HashMap.empty[Char, Int]
          hits += Nil
          next.length - 1
        })
      }
      hits(node) = pi :: hits(node)
    }
    // BFS fail links; aggregate hit lists down the suffix chain
    private val fail = new Array[Int](next.length)
    locally {
      val queue = scala.collection.mutable.Queue.empty[Int]
      next(0).values.foreach { v => fail(v) = 0; queue += v }
      while (queue.nonEmpty) {
        val u = queue.dequeue()
        hits(u) = hits(u) ::: hits(fail(u))
        next(u).foreach { case (ch, v) =>
          var f = fail(u)
          while (f != 0 && !next(f).contains(ch)) f = fail(f)
          fail(v) = if (next(f).contains(ch) && next(f)(ch) != v) next(f)(ch) else 0
          queue += v
        }
      }
    }
    private val nextArr: Array[Map[Char, Int]] = next.map(_.toMap).toArray
    private val hitsArr: Array[Array[Int]] = hits.map(_.toArray).toArray

    /** Per-pattern occurrence counts over one text, one pass. */
    def countMatches(text: String): Array[Long] = {
      val counts = new Array[Long](patterns.length)
      var node = 0
      var i = 0
      while (i < text.length) {
        val ch = text.charAt(i)
        while (node != 0 && !nextArr(node).contains(ch)) node = fail(node)
        node = nextArr(node).getOrElse(ch, 0)
        val h = hitsArr(node)
        var j = 0
        while (j < h.length) { counts(h(j)) += 1; j += 1 }
        i += 1
      }
      counts
    }
  }

  /** (id, pattern, n) for every document × pattern with n > 0
    * occurrences. The automaton is built once on the driver and
    * broadcast; per-partition work is one automaton pass per document
    * regardless of pattern count.
    */
  def matchCounts(df: DataFrame, idCol: String, textCol: String,
                  patterns: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ac = new AhoCorasick(patterns.toIndexedSeq)
    val bc = spark.sparkContext.broadcast(ac)
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val a = bc.value
        it.flatMap { case (id, text) =>
          val counts = a.countMatches(if (text == null) "" else text)
          counts.iterator.zipWithIndex.collect {
            case (n, pi) if n > 0 => (id, a.patterns(pi), n)
          }
        }
      }
      .toDF(idCol, "pattern", "n")
  }
}
