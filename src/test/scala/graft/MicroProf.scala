package graft
object MicroProf {
  def main(args: Array[String]): Unit = {
    val card = "# Language\nThe document language code is en .\n# Origin\nHarvested from the web source pipeline .\n# Body\nExcerpt : " + ("lorem ipsum dolor sit amet " * 6)
    def time(name: String, n: Int)(f: => Unit): Unit = {
      (1 to n).foreach(_ => f) // warmup
      val t0 = System.nanoTime(); (1 to n).foreach(_ => f)
      println(f"$name%-16s ${(System.nanoTime() - t0) / 1e3 / n}%8.2f us/op")
    }
    val N = 20000
    time("hierarchical", N)(text.Markdown.hierarchical(card))
    time("sections", N)(text.Markdown.sections(card))
    val secs = text.Markdown.sections(card)
    time("paragraphs", N)(secs.foreach(s => text.Markdown.paragraphs(s.content)))
    time("sha256", N)(model.Hashing.sha256(card))
    val all = secs ++ secs
    time("groupBy+sort", N)(all.groupBy(s => s.content).values.map(_.minBy(s => (s.title.length, s.title))).toVector.sortBy(s => (s.level, s.title)))
  }
}
