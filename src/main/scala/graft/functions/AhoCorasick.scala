package graft.functions

/** Classic Aho–Corasick multi-pattern automaton (Aho & Corasick 1975):
  * trie + BFS failure links + merged output sets, so ONE pass over a
  * text counts every (possibly overlapping) occurrence of every pattern
  * simultaneously — the kernel behind blocklist/watchlist scanning where
  * a 10k-term registry would make per-pattern regex passes quadratic.
  * Built once on the driver, serialized into the scan closure.
  */
final case class AhoCorasick(next: Array[Map[Char, Int]], fail: Array[Int],
                             out: Array[List[Int]], nPatterns: Int)
    extends Serializable {

  /** Occurrence count per pattern index, overlapping matches included —
    * the textbook semantics (every end position reports every pattern
    * ending there, via the merged output sets).
    */
  def countAll(text: String): Array[Long] = {
    val counts = new Array[Long](nPatterns)
    var state = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      while (state != 0 && !next(state).contains(c)) state = fail(state)
      state = next(state).getOrElse(c, 0)
      var os = out(state)
      while (os.nonEmpty) { counts(os.head) += 1L; os = os.tail }
      i += 1
    }
    counts
  }
}

object AhoCorasick {
  /** Build the automaton; patterns must be non-empty and distinct. */
  def build(patterns: Seq[String]): AhoCorasick = {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "patterns must be non-empty strings")
    require(patterns.distinct.size == patterns.size, "patterns must be distinct")
    val next = scala.collection.mutable.ArrayBuffer(Map.empty[Char, Int])
    val rawOut = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var node = 0
      p.foreach { c =>
        next(node).get(c) match {
          case Some(n) => node = n
          case None =>
            next += Map.empty
            rawOut += Nil
            next(node) = next(node) + (c -> (next.size - 1))
            node = next.size - 1
        }
      }
      rawOut(node) = pi :: rawOut(node)
    }
    val fail = new Array[Int](next.size)
    val out = rawOut.toArray
    val queue = scala.collection.mutable.Queue[Int]()
    next(0).values.foreach { n => fail(n) = 0; queue += n }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      // merged output: a node also reports everything its longest proper
      // suffix state reports — what makes overlapping/nested hits exact
      out(u) = out(u) ::: out(fail(u))
      next(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !next(f).contains(c)) f = fail(f)
        fail(v) = if (next(f).contains(c) && next(f)(c) != v) next(f)(c) else 0
        queue += v
      }
    }
    AhoCorasick(next.toArray, fail, out, patterns.size)
  }
}
