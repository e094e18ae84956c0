package graft

/** Tiny filesystem helpers shared by the temp-sink/checkpoint cleanup
  * paths (Bench, run-to-completion streams). */
object Fs {

  /** Recursive delete, children before parents. Closes the walk
    * stream explicitly — `Files.walk` holds directory handles until
    * the returned Stream is closed, and the idiomatic
    * `.iterator().asScala` consumption abandons it. */
  def deleteTree(root: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.exists(root)) {
      val walk = java.nio.file.Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq.reverseIterator
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
      } finally walk.close()
    }
  }
}
