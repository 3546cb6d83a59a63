package graft.core

/** Hierarchy path utilities.
  *
  * The reference models node paths as absolute, `/`-separated strings
  * (icechunk-types `Path`, used throughout snapshot.rs / store.rs). We keep
  * them as normalized strings: always starting with "/", no trailing slash
  * (root is "/"), no empty segments.
  */
object NodePath {
  def normalize(raw: String): String = {
    val segs = raw.split("/").filter(_.nonEmpty)
    if (segs.isEmpty) "/" else "/" + segs.mkString("/")
  }

  def name(path: String): String = {
    val p = normalize(path)
    if (p == "/") "" else p.substring(p.lastIndexOf('/') + 1)
  }

  def parent(path: String): Option[String] = {
    val p = normalize(path)
    if (p == "/") None
    else {
      val i = p.lastIndexOf('/')
      Some(if (i == 0) "/" else p.substring(0, i))
    }
  }

  /** All proper ancestors, root first: "/a/b/c" -> List("/", "/a", "/a/b").
    * Mirrors `path.ancestors()` usage in conflict detection
    * (icechunk/src/conflicts/detector.rs:70).
    */
  def ancestors(path: String): List[String] = {
    val p = normalize(path)
    if (p == "/") Nil
    else {
      val segs = p.split("/").filter(_.nonEmpty)
      "/" :: segs.inits.toList.reverse.drop(1).dropRight(1)
        .map(ss => "/" + ss.mkString("/"))
    }
  }

  def isAncestorOf(ancestor: String, path: String): Boolean = {
    val a = normalize(ancestor); val p = normalize(path)
    a != p && (a == "/" || p.startsWith(a + "/"))
  }

  def child(parent: String, seg: String): String = {
    require(seg.nonEmpty && !seg.contains("/"), s"bad segment '$seg'")
    if (normalize(parent) == "/") "/" + seg else normalize(parent) + "/" + seg
  }
}
