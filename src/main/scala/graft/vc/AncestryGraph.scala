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

  /** SVG render of the commit DAG (display/svg.rs analog): one column per
    * branch, one row per commit newest-first, parent edges drawn across
    * columns at fork points, tags as badges. Metadata-sized, driver-side.
    */
  def renderSvg(repo: Repository): String = {
    val info = repo.info()
    val branches = info.branches.toSeq.sortBy(_._1)
    val palette = Seq("#4c78a8", "#f58518", "#54a24b", "#e45756",
      "#72b7b2", "#b279a2")
    // first branch whose ancestry contains a snapshot owns its column
    val owner = scala.collection.mutable.LinkedHashMap[String, Int]()
    branches.zipWithIndex.foreach { case ((_, tip), c) =>
      info.ancestry(tip).foreach(s =>
        if (!owner.contains(s.id)) owner(s.id) = c)
    }
    val snaps = info.snapshots.filter(s => owner.contains(s.id))
      .sortBy(_.flushedAt).reverse
    val row = snaps.map(_.id).zipWithIndex.toMap
    val tagBySnap = info.tags.groupBy(_._2)
      .map { case (s, m) => s -> m.keys.toSeq.sorted }
    val nCols = math.max(1, branches.size)
    def colX(c: Int) = 24 + c * 26
    def rowY(r: Int) = 44 + r * 28
    val textX = colX(nCols - 1) + 30
    val width = textX + 460
    val height = rowY(math.max(1, snaps.size)) + 8
    def esc(s: String): String = s.replace("&", "&amp;")
      .replace("<", "&lt;").replace(">", "&gt;").replace("\"", "&quot;")
    val sb = new StringBuilder
    sb.append(s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" """)
    sb.append(s"""height="$height" font-family="monospace" font-size="12">\n""")
    branches.zipWithIndex.foreach { case ((b, tip), c) =>
      val color = palette(c % palette.size)
      sb.append(s"""<text x="${colX(owner.getOrElse(tip, c))}" y="16" """)
      sb.append(s"""fill="$color" text-anchor="middle">${esc(b)}</text>\n""")
    }
    // parent edges first so nodes draw on top
    snaps.foreach { s =>
      s.parentId.flatMap(p => row.get(p)).foreach { pr =>
        val (x1, y1) = (colX(owner(s.id)), rowY(row(s.id)))
        val (x2, y2) = (colX(owner(s.parentId.get)), rowY(pr))
        sb.append(s"""<path d="M $x1 $y1 L $x1 ${y2 - 14} L $x2 $y2" """)
        sb.append("""fill="none" stroke="#999" stroke-width="1.5"/>""")
        sb.append('\n')
      }
    }
    snaps.foreach { s =>
      val (x, y) = (colX(owner(s.id)), rowY(row(s.id)))
      val color = palette(owner(s.id) % palette.size)
      sb.append(s"""<circle cx="$x" cy="$y" r="5" fill="$color"/>\n""")
      val tags = tagBySnap.get(s.id)
        .map(_.mkString(" [", ", ", "]")).getOrElse("")
      val label = s"${s.id.take(8)} ${s.message.take(48)}"
      sb.append(s"""<text x="$textX" y="${y + 4}">${esc(label)}""")
      if (tags.nonEmpty)
        sb.append(s"""<tspan fill="#b8860b">${esc(tags)}</tspan>""")
      sb.append("</text>\n")
    }
    sb.append("</svg>\n")
    sb.toString
  }
}
