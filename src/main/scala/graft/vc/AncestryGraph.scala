package graft.vc

import graft.repo.Repository

/** ASCII render of the commit DAG (`ancestry_graph`,
  * repository.rs:986-1081 + display/ancestry_graph.rs): per-branch chains
  * with fork-point annotations and tag markers. Driver-side over the
  * pointer's snapshot list — the graph is metadata-sized.
  */
object AncestryGraph {
  def render(repo: Repository): String = {
    val info = repo.info()
    val tagBysnap = info.tags.groupBy(_._2).map { case (s, m) =>
      s -> m.keys.toSeq.sorted }
    val chains: Seq[(String, Seq[graft.meta.SnapshotInfo])] =
      info.branches.toSeq.sortBy(_._1).map { case (b, tip) =>
        b -> info.ancestry(tip)
      }
    // snapshots owned by an earlier-listed branch (fork detection)
    val seen = scala.collection.mutable.Map[String, String]() // snap -> branch
    val sb = new StringBuilder
    chains.foreach { case (branch, chain) =>
      sb.append(s"$branch:\n")
      var forked = false
      chain.foreach { s =>
        if (!forked) {
          seen.get(s.id) match {
            case Some(owner) if owner != branch =>
              sb.append(s"  └─ forked from $owner at ${short(s)}\n")
              forked = true
            case _ =>
              seen.getOrElseUpdate(s.id, branch)
              val tags = tagBysnap.get(s.id)
                .map(ts => ts.mkString("  (tag: ", ", ", ")")).getOrElse("")
              val root = if (s.parentId.isEmpty) "  (root)" else ""
              sb.append(s"  * ${short(s)}$tags$root\n")
          }
        }
      }
    }
    val danglingTags = info.tags.filterNot { case (_, snap) =>
      seen.contains(snap) }
    if (danglingTags.nonEmpty) {
      sb.append("detached tags:\n")
      danglingTags.toSeq.sortBy(_._1).foreach { case (t, snap) =>
        sb.append(s"  * $t -> ${snap.take(8)}…\n")
      }
    }
    sb.toString
  }

  private def short(s: graft.meta.SnapshotInfo): String =
    s"${s.id.take(8)}… ${s.message.take(40)}"
}
