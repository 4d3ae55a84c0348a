package graft.cli

import org.apache.spark.sql.SparkSession

import graft.core.Collection

/** Command-line entry points, mirroring the reference's CLI subcommands
  * (zcollection/cli/main.py: ls / inspect / query / drop).
  *
  * Usage:
  * {{{
  *   graft.cli.Cli ls <path> [filter]
  *   graft.cli.Cli inspect <path>
  *   graft.cli.Cli query <path> [filter] [comma,separated,variables]
  *   graft.cli.Cli drop <path> <filter>
  *   graft.cli.Cli delete <path> <filter>   # row-level, file-granular rewrite
  *   graft.cli.Cli expire <path> <cutoff>   # metadata-only axis TTL
  *   graft.cli.Cli history <path>           # committed snapshot generations
  *   graft.cli.Cli vacuum <path>            # reclaim crashed writers' orphans
  *   graft.cli.Cli compact <path> [filter]  # fold small append files
  *   graft.cli.Cli changes <path> <from> [to]  # CDC row-level diff
  *   graft.cli.Cli clone <src> <dest>       # zero-copy shallow clone
  *   graft.cli.Cli tag <path> [name [gen]]  # list / create named snapshots
  *   graft.cli.Cli untag <path> <name>
  *   graft.cli.Cli branch <path> [name]     # list / create in-tree clones
  *   graft.cli.Cli promote <path> <name>    # merge a branch's diff back
  *   graft.cli.Cli drop-branch <path> <name>
  *   graft.cli.Cli materialize <path>       # clone -> self-contained deep copy
  * }}}
  */
object Cli {

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: Cli <ls|inspect|describe|files|query|drop|delete|expire|history|vacuum|compact|compact-plan|zorder|count|prune|backfill-stats|fsck|changes|clone|tag|untag|branch|drop-branch> <path> [args...]")
      sys.exit(2)
    }
    val (cmd, path) = (args(0), args(1))
    val spark = session()
    try cmd match {
      case "ls" =>
        val c = Collection.open(spark, path, readOnly = true)
        c.partitions(args.lift(2).orNull).foreach(println)
      case "inspect" =>
        val c = Collection.open(spark, path, readOnly = true)
        println(s"""uri: ${c.root}
                   |axis: ${c.axis}
                   |partitioning: ${c.partitioning.name} (${c.partitioning.axis.mkString("/")})
                   |profile: ${c.profile.name}
                   |n_partitions: ${c.partitions().size}
                   |bytes: ${c.sizeOnDisk().map(_.toString).getOrElse("(unrecorded: run backfill-stats)")}
                   |schema: ${c.schema.toDDL}""".stripMargin)
      case "query" =>
        val c = Collection.open(spark, path, readOnly = true)
        val vars = args.lift(3).map(_.split(",").toSeq).orNull
        c.query(args.lift(2).orNull, vars).show(100, truncate = false)
      case "drop" =>
        val c = Collection.open(spark, path)
        c.dropPartitions(args(2)).foreach(println)
      case "delete" =>
        // row-level DELETE: rewrites only the files the skip layers
        // cannot prove unaffected
        val c = Collection.open(spark, path)
        val touched = c.deleteWhere(args(2))
        println(s"rewrote ${touched.size} file(s)")
      case "expire" =>
        // metadata-only axis TTL: Cli expire <path> <cutoff-literal>
        val c = Collection.open(spark, path)
        c.expirePartitions(args(2)).foreach(println)
      case "history" =>
        val c = Collection.open(spark, path, readOnly = true)
        c.describeHistory().collect().foreach { r =>
          val ts = if (r.isNullAt(1)) "-"
            else java.time.Instant.ofEpochMilli(r.getLong(1)).toString
          val op = if (r.isNullAt(2)) "-" else r.getString(2)
          println(f"generation ${r.getLong(0)}%3d  $ts%-24s  $op%-16s " +
            s"partitions=${r.getInt(3)}")
        }
      case "vacuum" =>
        // Cli vacuum <path> [dry-run]
        val c = Collection.open(spark, path)
        val dry = args.lift(2).contains("dry-run")
        val gone = c.vacuum(dryRun = dry)
        if (dry) { gone.foreach(f => println(s"would reclaim: $f"))
                   println(s"${gone.size} file(s) reclaimable") }
        else println(s"reclaimed ${gone.size} orphan file(s)")
      case "compact" =>
        val c = Collection.open(spark, path)
        c.compact(args.lift(2).orNull).foreach(println)
      case "zorder" =>
        // z-ordered rewrite: Cli zorder <path> <col1,col2[,..]> [filters]
        args.lift(2) match {
          case None =>
            System.err.println("usage: Cli zorder <path> <col1,col2[,..]> [filters]")
            sys.exit(2)
          case Some(colArg) =>
            val c = Collection.open(spark, path)
            c.compactPartitions(c.partitions(args.lift(3).orNull),
              clusterBy = colArg.split(",").toSeq).foreach(println)
        }
      case "compact-plan" =>
        // budgeted maintenance: plan (and with `apply`, execute) the
        // most-fragmented rewrites under a byte ceiling
        val c = Collection.open(spark, path)
        val budget = args.lift(2).map(_.toLong).getOrElse(1L << 30)
        val plan = c.compactPlan(budget)
        plan.foreach(println)
        if (args.lift(3).contains("apply"))
          println(s"compacted ${c.compactPartitions(plan).size} partition(s)")
      case "describe" =>
        val c = Collection.open(spark, path, readOnly = true)
        c.describePartitions().orderBy("partition").show(1000, truncate = false)
      case "files" =>
        // per-file manifest inventory (Iceberg `files` shape), and in
        // SQL as graft.<ns>.<t>.files; optional partition-prefix filter
        val c = Collection.open(spark, path, readOnly = true)
        val all = c.describeFiles()
        args.lift(2).fold(all)(p => all.where(s"partition LIKE '$p%'"))
          .orderBy("partition", "file").show(1000, truncate = false)
      case "count" =>
        val c = Collection.open(spark, path, readOnly = true)
        println(c.countRows(args.lift(2).orNull))
      case "prune" =>
        // dry-run the skip layers: why does this filter scan what it scans
        val c = Collection.open(spark, path, readOnly = true)
        println(c.explainPruning(args.lift(2).orNull))
      case "backfill-stats" =>
        val c = Collection.open(spark, path)
        println(s"backfilled ${c.backfillStats()} file(s)")
      case "fsck" =>
        // integrity pre-flight: Cli fsck <path> [deep]
        val c = Collection.open(spark, path, readOnly = true)
        val r = c.fsck(deep = args.lift(2).contains("deep"))
        println(s"checked ${r.filesChecked} file(s): " +
          (if (r.clean) "CLEAN" else "CORRUPT"))
        r.missingFiles.foreach(f => println(s"missing: $f"))
        r.rowCountMismatches.foreach { case (f, rec, act) =>
          println(s"row-count mismatch: $f recorded=$rec actual=$act") }
        r.orphanFiles.foreach(f => println(s"orphan: $f"))
        if (r.statlessFiles.nonEmpty)
          println(s"${r.statlessFiles.size} file(s) lack stats (backfill-stats)")
      case "restore" =>
        // Cli restore <path> <generation>
        val c = Collection.open(spark, path)
        c.restore(args(2).toLong)
        println(s"restored to snapshot ${args(2)} as generation ${c.generation}")
      case "changes" =>
        // CDC: Cli changes <path> <fromGen> [toGen]  (row-level diff)
        val c = Collection.open(spark, path, readOnly = true)
        val from = args(2).toLong
        val to = args.lift(3).map(_.toLong).getOrElse(c.generation)
        c.changes(from, to).show(100, truncate = false)
      case "clone" =>
        // zero-copy sandbox: Cli clone <srcPath> <destPath>
        val dst = Collection.cloneTo(spark, path, args(2))
        println(s"cloned $path -> ${dst.root} at generation ${dst.generation} (zero data copied)")
      case "tag" =>
        // named snapshots: Cli tag <path> [name [generation]]
        val c = Collection.open(spark, path, args.length < 3)
        args.lift(2) match {
          case None => c.tags().toSeq.sortBy(_._1)
            .foreach { case (n, g) => println(s"$n\t$g") }
          case Some(name) =>
            c.tag(name, args.lift(3).map(_.toLong).getOrElse(-1L))
            println(s"tagged generation ${c.tags()(name)} as '$name'")
        }
      case "untag" =>
        // Cli untag <path> <name>
        Collection.open(spark, path).deleteTag(args(2))
        println(s"deleted tag '${args(2)}'")
      case "branch" =>
        // in-tree clones: Cli branch <path> [name]  (no name: list)
        val c = Collection.open(spark, path, args.length < 3)
        args.lift(2) match {
          case None => c.branches().foreach(println)
          case Some(name) =>
            val b = c.branch(name)
            println(s"branched '$name' at generation ${b.generation} -> ${b.root}")
        }
      case "drop-branch" =>
        // Cli drop-branch <path> <name>
        Collection.open(spark, path).dropBranch(args(2))
        println(s"dropped branch '${args(2)}'")
      case "materialize" =>
        // clone -> deep copy: Cli materialize <path>
        val n = Collection.open(spark, path).materialize().size
        println(if (n == 0) "nothing external to localize"
                else s"localized $n external file reference(s)")
      case "promote" =>
        // merge a branch back: Cli promote <path> <branch>
        val parts = Collection.open(spark, path).promoteBranch(args(2))
        println(s"promoted branch '${args(2)}': ${parts.size} partition(s) touched")
      case "rebase" =>
        // checked merge onto a diverged parent: Cli rebase <path> <branch> <key[,key...]>
        val parts = Collection.open(spark, path)
          .rebaseBranch(args(2), args(3).split(",").toSeq)
        println(s"rebased branch '${args(2)}': ${parts.size} partition(s) touched")
      case other =>
        System.err.println(s"unknown command '$other'"); sys.exit(2)
    } finally spark.stop()
  }
}
