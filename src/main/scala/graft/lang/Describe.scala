package graft.lang

import graft.sources.Lake

/** Query source/channel analysis for the service's `/query/describe`
  * endpoint (reference: compiler/describe/analyze.go; service
  * handlers.go handleQueryDescribe). Walks the parsed AST to report
  *
  *  - sources: the pools/paths the query reads, with `inferred` marking a
  *    source injected from the request's `head` rather than written in
  *    the query text;
  *  - channels: one per named output leg, with the aggregation keys of a
  *    terminal summarize and the output's sort order (explicit `sort`, or
  *    the pool layout's order propagated through order-preserving ops).
  *
  * Two outputs with the same name are combined, which destroys both the
  * order and aggregation-key knowledge (analyze.go AnalyzeDAG).
  */
object Describe {

  private final case class Chan(name: String,
                                aggKeys: Option[Seq[Seq[String]]],
                                sort: Option[Seq[(String, Seq[String])]])

  def analyze(query: String, lakeRoot: String, headPool: Option[String]): String = {
    val parsed = Parser.parse(query)
    val stages = parsed.stages

    def isSource(s: Stage): Boolean = s match {
      case _: Stage.From => true
      case Stage.Fork(bs) => bs.forall(_.stages.headOption.exists(isSource))
      case _ => false
    }
    val hasSource = stages.headOption.exists(isSource)
    val effective =
      if (hasSource) stages
      else Stage.From(headPool.getOrElse("")) +: stages

    // ---- sources ----
    def sourcesOf(s: Stage, inferred: Boolean): Seq[String] = s match {
      case Stage.From(t, _, _, _) =>
        if (Lake.exists(lakeRoot, t))
          Seq(s"""{"kind":"Pool","name":"${esc(t)}","id":"${Lake.poolId(lakeRoot, t)}","inferred":$inferred}""")
        else
          Seq(s"""{"kind":"Path","uri":"${esc(t)}","inferred":$inferred}""")
      case Stage.Fork(bs) =>
        bs.flatMap(_.stages.headOption.toSeq.flatMap(sourcesOf(_, inferred)))
      case _ => Seq.empty
    }
    val sources = sourcesOf(effective.head, !hasSource)

    // ---- channel analysis ----
    // the layout sort of the scanned pools: propagates when every scanned
    // pool sorts the same way, else unknown
    def layoutOf(s: Stage): Seq[Option[(String, String)]] = s match {
      case Stage.From(t, _, _, _) if Lake.exists(lakeRoot, t) =>
        Seq(Lake.poolKey(lakeRoot, t).map(k => (Lake.poolOrder(lakeRoot, t), k)))
      case Stage.From(_, _, _, _) => Seq(None)
      case Stage.Fork(bs) =>
        bs.flatMap(_.stages.headOption.toSeq.flatMap(layoutOf))
      case _ => Seq(None)
    }
    val layouts = layoutOf(effective.head)
    val initialSort: Option[Seq[(String, Seq[String])]] =
      if (layouts.nonEmpty && layouts.forall(_ == layouts.head))
        layouts.head.map { case (ord, k) => Seq((ord, k.split('.').toSeq)) }
      else None

    def pathOf(e: Expr): Seq[String] = e match {
      case Expr.Path(parts) => parts
      case _ => Seq.empty
    }

    // walk a stage list, threading (aggKeys, sort); emits channels at
    // outputs; the trailing flow lands on the default "main" channel
    val chans = scala.collection.mutable.ArrayBuffer.empty[Chan]
    def walk(ss: Seq[Stage],
             agg0: Option[Seq[Seq[String]]],
             sort0: Option[Seq[(String, Seq[String])]],
             isSourceHead: Boolean): Option[(Option[Seq[Seq[String]]], Option[Seq[(String, Seq[String])]])] = {
      var agg = agg0
      var sort = sort0
      var flowing = true
      for ((s, ix) <- ss.zipWithIndex if flowing) s match {
        case Stage.Summarize(_, keys) =>
          agg = Some(keys.map { case (n, _) => n.split('.').toSeq })
          sort = None
        case Stage.Sort(keys, _) =>
          sort = Some(keys.collect { case (e, asc) if pathOf(e).nonEmpty =>
            (if (asc) "asc" else "desc", pathOf(e))
          }).filter(_.nonEmpty)
        case Stage.Fork(bs) if ix == 0 && isSourceHead &&
            bs.forall(b => b.stages.length == 1 && isSource(b.stages.head)) =>
          () // pure parallel-source form: the merged scan feeds the rest
        case Stage.Fork(bs) =>
          bs.foreach { b =>
            // a branch with its own source starts from that pool's layout
            val bSort = b.stages.headOption match {
              case Some(f: Stage.From) =>
                layoutOf(f).head.map { case (o, k) => Seq((o, k.split('.').toSeq)) }
              case _ => sort
            }
            walk(b.stages, agg, bSort, isSourceHead = false).foreach {
              case (a2, s2) => chans += Chan("main", a2, s2)
            }
          }
          flowing = false
        case Stage.Output(name) =>
          chans += Chan(name, agg, sort)
          flowing = false
        case Stage.Block(p) =>
          walk(p.stages, agg, sort, isSourceHead = false) match {
            case Some((a2, s2)) => agg = a2; sort = s2
            case None => flowing = false
          }
        case _: Stage.From | Stage.Pass | _: Stage.Where | _: Stage.Put |
            _: Stage.Cut | _: Stage.Drop | _: Stage.Rename | _: Stage.Head |
            _: Stage.Tail | _: Stage.Debug | _: Stage.Assert | _: Stage.Load =>
          () // order-preserving (optimizer sort-key propagation)
        case _ =>
          // anything that rewrites or reorders records loses both the
          // layout order and (conservatively) nothing else
          sort = None
      }
      if (flowing) Some((agg, sort)) else None
    }
    walk(effective, None, initialSort, isSourceHead = true).foreach {
      case (a, s) => chans += Chan("main", a, s)
    }

    // combine same-name outputs: nil out their knowledge (analyze.go)
    val combined = scala.collection.mutable.LinkedHashMap.empty[String, Chan]
    for (c <- chans) {
      if (combined.contains(c.name))
        combined(c.name) = Chan(c.name, None, None)
      else combined(c.name) = c
    }

    def chanJson(c: Chan): String = {
      val aggJ = c.aggKeys match {
        case None => "null"
        case Some(ks) => ks.map(_.map(p => s""""${esc(p)}"""")
          .mkString("[", ",", "]")).mkString("[", ",", "]")
      }
      val sortJ = c.sort match {
        case None => "null"
        case Some(ks) => ks.map { case (ord, path) =>
          s"""{"order":"$ord","key":${path.map(p => s""""${esc(p)}"""").mkString("[", ",", "]")}}"""
        }.mkString("[", ",", "]")
      }
      s"""{"name":"${esc(c.name)}","aggregation_keys":$aggJ,"sort":$sortJ}"""
    }

    s"""{"sources":${sources.mkString("[", ",", "]")},""" +
      s""""channels":${combined.values.map(chanJson).mkString("[", ",", "]")}}"""
  }

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
}
