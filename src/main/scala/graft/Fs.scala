package graft

/** The one copy of the recursive temp-dir delete (review r12: the
  * walk/reverse/deleteIfExists idiom had spread to ten call sites — a
  * symlink or logging fix would have needed ten edits). NIO streams
  * close eagerly (they hold a directory fd until GC). */
object Fs {
  def deleteRecursively(dir: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (!java.nio.file.Files.exists(dir)) return
    val walk = java.nio.file.Files.walk(dir)
    try walk.iterator().asScala.toSeq.reverse
      .foreach(p => java.nio.file.Files.deleteIfExists(p))
    finally walk.close()
  }
}
