package graft

import org.apache.spark.sql.functions._

/** North-star extension operators (dedup / similarity / text analysis)
  * — filled in incrementally; see graft.ext. */
object ExtensionQueries {
  val all: Seq[Q] = Seq()
}
