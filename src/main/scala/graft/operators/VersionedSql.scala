package graft.operators

import org.apache.spark.sql.{DataFrame, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation, UnresolvedTable}
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Exists, Expression, InSubquery, ListQuery, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.functions.lit

/** SQL DML for the versioned lake table — the WRITE half of the SQL
  * surface (x32's TVFs made reads pure SQL; this makes mutation pure
  * SQL, the shape the reference's whole mutation layer takes — dbt
  * incremental MERGE, `shared/dbt-models/models/marts/core/
  * fct_trips.sql:6-13`).
  *
  * Statements parse with SPARK'S OWN parser (same dialect, same
  * escaping, same expression language as every other query) and the
  * resulting command plan dispatches onto the library verbs — the SQL
  * layer adds zero new semantics, so every scale property of the
  * verbs (stats-pruned file rewrites, keys-frame joins, CAS publish,
  * CDF envelopes) holds identically from SQL:
  *
  * {{{
  *   VersionedSql(spark, """
  *     MERGE INTO `/lake/t` t USING src s ON t.id = s.id
  *     WHEN MATCHED THEN UPDATE SET *
  *     WHEN NOT MATCHED THEN INSERT *""")          // → mergeUpsert
  *   VersionedSql(spark,
  *     "MERGE INTO `/lake/t` t USING src s ON t.id = s.id " +
  *     "WHEN MATCHED THEN DELETE")                 // → deleteKeys
  *   VersionedSql(spark,
  *     "MERGE INTO `/lake/t` t USING src s ON t.id = s.id " +
  *     "WHEN NOT MATCHED THEN INSERT *")           // → dedup append
  *   VersionedSql(spark,
  *     "INSERT INTO `/lake/t` SELECT * FROM src")  // → commit(append)
  *   VersionedSql(spark,
  *     "UPDATE `/lake/t` SET v = v + 1 WHERE k = 3")  // → updateRows
  *   VersionedSql(spark,
  *     "DELETE FROM `/lake/t` WHERE k = 3")           // → delete
  *   VersionedSql(spark, "ALTER TABLE `/lake/t` " +
  *     "ADD CONSTRAINT pos CHECK (v > 0)")         // → addConstraint
  *   VersionedSql(spark, "ALTER TABLE `/lake/t` " +
  *     "ADD COLUMNS (score DOUBLE)")               // → addColumns
  *   VersionedSql(spark,
  *     "OPTIMIZE `/lake/t` ZORDER BY (k, ts)")     // → zorder
  *   VersionedSql(spark,
  *     "VACUUM `/lake/t` RETAIN 5 VERSIONS")       // → vacuum
  *   VersionedSql(spark,
  *     "RESTORE `/lake/t` TO VERSION 3")           // → restore
  *   VersionedSql(spark,
  *     "CLONE `/lake/t` TO `/lake/dev` VERSION 3") // → cloneShallow
  * }}}
  *
  * The target table is named by its PATH as one backquoted
  * identifier, or by a catalog-qualified NAME (`cat.ns.table`)
  * resolving through a registered [[graft.sources.GraftCatalog]] —
  * the row-level verbs Spark's DSv2 analyzer won't plan for a
  * catalog work by name through this dispatcher. The MERGE grammar
  * is the full ANSI surface (composite/renamed keys, conditional
  * clauses, column-level SET, `WHEN NOT MATCHED BY SOURCE`) via
  * [[Versioned.merge]], with the single-key star forms kept on the
  * specialized pruned verbs. The MERGE source is any relation or
  * subquery Spark can resolve — a temp view, `parquet.`…``, or a
  * `graft_table(…)` TVF (registered here, so MERGE-from-time-travel
  * works out of the box). UPDATE/DELETE predicates may use the
  * declared table alias, and accept ONE top-level `col IN (SELECT…)`,
  * `(a, b) IN (SELECT …)`, correlated `EXISTS` or `NOT EXISTS`
  * conjunct — routed to the keys-frame-pruned verbs (NOT EXISTS to
  * merge's by-source pass). `COPY INTO t FROM 'dir' FILEFORMAT = fmt
  * [FORMAT_OPTIONS (…)] [COPY_OPTIONS ('force'='true')]` is the
  * idempotent batch file ingest ([[Versioned.copyInto]]).
  *
  * Anything that is not a recognized DML command falls through to
  * plain `spark.sql` with the graft TVFs registered — one entry point
  * serves the whole SQL surface, reads and writes.
  *
  * DML returns a one-row `(path, verb, version)` frame (the version
  * containing the result); reads return their result frame.
  */
object VersionedSql {

  // maintenance verbs Spark's grammar doesn't know — hand-parsed ahead
  // of the parser, the same slot Delta's parser extension fills:
  //   OPTIMIZE `path` [INTO n FILES | TARGET n BYTES]
  //                   [ZORDER BY (c1, c2, …)]
  //   VACUUM `path` RETAIN n VERSIONS
  // a table reference token: a backquoted PATH or a catalog-qualified
  // NAME (resolved by [[refRoot]] through a registered GraftCatalog)
  private val Ref = """(`[^`]+`|[\w.]+)"""
  private val OptimizeRe =
    (s"""(?is)\\s*OPTIMIZE\\s+$Ref(?:\\s+INTO\\s+(\\d+)\\s+FILES|""" +
      """\s+TARGET\s+(\d+)\s+BYTES)?""" +
      """(?:\s+ZORDER\s+BY\s+\(([^)]+)\))?""" +
      // trailing partition scope (Delta's OPTIMIZE t WHERE …): only
      // matching partitions' small files pack
      """(?:\s+WHERE\s+([^;]+?))?""" +
      // trailing REANALYZE re-arms ANALYZE stats over the previously
      // analyzed columns in the same maintenance tick. The lookbehinds
      // keep it from stealing the last token of an UNTERMINATED scope
      // predicate: after an operator or AND/OR/NOT, a bare REANALYZE
      // identifier belongs to the WHERE expression, not the flag
      """((?<![=<>!+\-*/%(,])(?<!\bAND)(?<!\bOR)(?<!\bNOT)""" +
      """\s+REANALYZE)?\s*;?\s*""").r
  private val VacuumRe =
    s"""(?is)\\s*VACUUM\\s+$Ref\\s+RETAIN\\s+(\\d+)\\s+VERSIONS\\s*;?\\s*""".r
  //   REORG [TABLE] `path`|cat.ns.t APPLY (PURGE) [MIN FRACTION 0.x]
  // Delta's REORG…APPLY (PURGE): materialize deletion vectors for the
  // heavily-deleted files ONLY — O(hot files), never a full rewrite
  private val ReorgRe =
    (s"""(?is)\\s*REORG\\s+(?:TABLE\\s+)?$Ref\\s+APPLY\\s*\\(\\s*PURGE""" +
      """\s*\)(?:\s+MIN\s+FRACTION\s+([0-9.]+))?""" +
      """(\s+REANALYZE)?\s*;?\s*""").r
  private val RestoreRe =
    s"""(?is)\\s*RESTORE\\s+$Ref\\s+TO\\s+VERSION\\s+(\\d+)\\s*;?\\s*""".r
  //   ALTER TABLE `path`|cat.ns.t CREATE TAG name [AS OF VERSION n]
  //   ALTER TABLE `path`|cat.ns.t DROP TAG name
  // Iceberg's tags: durable names for versions, retention-pinned
  // through VACUUM, readable via VERSION AS OF 'name'
  private val CreateTagRe =
    (s"""(?is)\\s*ALTER\\s+TABLE\\s+$Ref\\s+CREATE\\s+TAG\\s+""" +
      """([A-Za-z0-9._-]+)(?:\s+AS\s+OF\s+VERSION\s+(\d+))?\s*;?\s*""").r
  private val DropTagRe =
    (s"""(?is)\\s*ALTER\\s+TABLE\\s+$Ref\\s+DROP\\s+TAG\\s+""" +
      """([A-Za-z0-9._-]+)\s*;?\s*""").r
  //   ALTER TABLE `path`|cat.ns.t SET PARTITION SPEC (item, …)
  // Iceberg's partition-spec evolution, METADATA-ONLY: item :=
  // col | bucket(n, col) | days(col) | months(col) | years(col) |
  // hours(col); () evolves to unpartitioned. Existing files keep
  // their generation's layout (they prune under the OLD derivation);
  // new writes land under the new spec.
  private val SetSpecRe =
    (s"""(?is)\\s*ALTER\\s+TABLE\\s+$Ref\\s+SET\\s+PARTITION\\s+""" +
      """SPEC\s*\((.*)\)\s*;?\s*""").r
  //   ANALYZE [TABLE] `path`|cat.ns.t COMPUTE STATISTICS
  //     FOR ALL COLUMNS | FOR COLUMNS a, b, …
  // one aggregate pass → NDV/nulls/min/max/lengths as a metadata-only
  // commit; the scan reports them to Catalyst's cost-based optimizer
  private val AnalyzeRe =
    (s"""(?is)\\s*ANALYZE\\s+(?:TABLE\\s+)?$Ref\\s+COMPUTE\\s+""" +
      """STATISTICS\s+FOR\s+(?:(ALL)\s+COLUMNS|""" +
      """COLUMNS\s+([^;]+))\s*;?\s*""").r
  private val CloneRe =
    (s"""(?is)\\s*CLONE\\s+$Ref\\s+TO\\s+$Ref""" +
      """(?:\s+VERSION\s+(\d+))?\s*;?\s*""").r
  //   COPY INTO `path`|cat.ns.t FROM 'dir' FILEFORMAT = PARQUET|CSV|…
  //             [FORMAT_OPTIONS ('k' = 'v', …)]
  //             [COPY_OPTIONS ('force' = 'true')]
  // the option-list captures admit quoted ')' and ',' — `'sep' = ','`
  // is an ordinary CSV option, not a parse error
  private val OptList = """((?:'[^']*'|[^)])*)"""
  private val CopyIntoRe =
    (s"""(?is)\\s*COPY\\s+INTO\\s+$Ref\\s+FROM\\s+'([^']+)'\\s+""" +
      """FILEFORMAT\s*=\s*(\w+)""" +
      s"""(?:\\s+FORMAT_OPTIONS\\s*\\($OptList\\))?""" +
      s"""(?:\\s+COPY_OPTIONS\\s*\\($OptList\\))?\\s*;?\\s*""").r
  private val FormatOptionRe = """'([^']+)'\s*=\s*'([^']*)'""".r

  /** `'k' = 'v', …` → map; every non-whitespace/comma character must
    * belong to a matched pair (a typo never silently drops). */
  private def optionPairs(clause: String, raw: String)
      : Map[String, String] = {
    val r = Option(raw).map(_.trim).getOrElse("")
    if (r.isEmpty) Map.empty
    else {
      val leftover = FormatOptionRe.replaceAllIn(r, "")
        .replaceAll("[\\s,]+", "")
      require(leftover.isEmpty,
        s"bad $clause: $raw — expected 'key' = 'value' pairs")
      FormatOptionRe.findAllMatchIn(r)
        .map(m => m.group(1) -> m.group(2)).toMap
    }
  }

  /** A matched [[Ref]] token → table root: strip backquotes for the
    * path form; resolve `cat.ns.t` through the registered catalog. A
    * BARE single-part name is rejected (the documented contract:
    * paths must be backquoted) — treating `VACUUM mytable` as the
    * relative path ./mytable would let a typo'd statement operate on
    * an unintended directory. */
  private def refRoot(spark: SparkSession, ref: String): String =
    if (ref.startsWith("`")) ref.stripPrefix("`").stripSuffix("`")
    else {
      val parts = ref.split('.').toSeq
      require(parts.size > 1,
        s"'$ref' is neither a backquoted path nor a catalog name — " +
          "name the table by its filesystem path as one backquoted " +
          s"identifier (e.g. `$ref`) or by a registered catalog name " +
          s"(e.g. graft.ns.$ref)")
      ident(spark, parts)
    }

  def apply(spark: SparkSession, stmt: String,
      cdf: Boolean = false): DataFrame = {
    // TVFs + native functions live for both the fall-through path and
    // MERGE sources written against graft_table(...) (idempotent)
    graft.GraftExtensions.registerFunctions(spark)
    stmt match {
      case OptimizeRe(ref, n, tgt, zcols, whereSql, reanalyzeTok) =>
        val root = refRoot(spark, ref)
        val nOut = Option(n).map(_.toInt)
        val scope = Option(whereSql).map(_.trim).filter(_.nonEmpty)
        val reanalyze = reanalyzeTok != null
        require(scope.isEmpty || (zcols == null && n == null),
          "OPTIMIZE … WHERE scopes the INCREMENTAL bin-pack only — " +
            "INTO n FILES and ZORDER BY are full-rewrite verbs and " +
            "cannot take a partition scope")
        require(!reanalyze || (zcols == null && n == null),
          "REANALYZE rides the INCREMENTAL bin-pack only — after a " +
            "full rewrite (INTO n FILES / ZORDER BY) run ANALYZE " +
            "explicitly")
        // bare OPTIMIZE is the INCREMENTAL bin-pack (Delta's bare-
        // OPTIMIZE semantics: O(small-file debt), big files carried by
        // reference — on a 100 TB streaming-fed table the verb a user
        // reaches for first must never be a full rewrite through one
        // task). Explicit INTO n FILES stays the full rewrite; TARGET
        // n BYTES tunes the incremental pack's output size.
        return result(spark, root, "optimize",
          Option(zcols) match {
            case Some(cs) =>
              require(tgt == null,
                "TARGET n BYTES cannot combine with ZORDER BY — a " +
                  "Z-order rewrite is sized with INTO n FILES")
              Versioned.zorder(spark, root,
                cs.split(",").map(_.trim).toSeq.filter(_.nonEmpty),
                nOut = nOut.getOrElse(8))
            case None => nOut match {
              case Some(files) =>
                Versioned.compact(spark, root, targetFiles = files)
              case None => Versioned.optimize(spark, root,
                targetBytes = Option(tgt).map(_.toLong)
                  .getOrElse(128L * 1024 * 1024),
                where = scope, reanalyze = reanalyze)
            }
          })
      case VacuumRe(ref, keep) =>
        val root = refRoot(spark, ref)
        Versioned.vacuum(root, keepVersions = keep.toInt)
        return result(spark, root, "vacuum",
          Versioned.latestVersion(root).getOrElse(
            throw new IllegalArgumentException(s"no versions at $root")))
      case ReorgRe(ref, frac, reanalyzeTok) =>
        val root = refRoot(spark, ref)
        return result(spark, root, "reorg",
          Versioned.reorg(spark, root,
            minDeletedFraction =
              Option(frac).map(_.toDouble).getOrElse(0.1),
            reanalyze = reanalyzeTok != null))
      case CreateTagRe(ref, name, v) =>
        val root = refRoot(spark, ref)
        return result(spark, root, "create-tag",
          Versioned.createTag(root, name, Option(v).map(_.toLong)))
      case DropTagRe(ref, name) =>
        val root = refRoot(spark, ref)
        return result(spark, root, "drop-tag",
          Versioned.dropTag(root, name))
      case SetSpecRe(ref, items) =>
        val root = refRoot(spark, ref)
        val parsed = splitSpecItems(items).map(parseSpecItem)
        return result(spark, root, "set-partition-spec",
          Versioned.setPartitionSpec(root,
            parsed.map {
              case Left(c) => c
              case Right(tx) => tx.hidden
            },
            parsed.collect { case Right(tx) => tx }))
      case AnalyzeRe(ref, all, colList) =>
        val root = refRoot(spark, ref)
        val cols =
          if (all != null) Nil
          else colList.split(",").map(_.trim)
            .map(_.stripPrefix("`").stripSuffix("`"))
            .filter(_.nonEmpty).toSeq
        return result(spark, root, "analyze",
          Versioned.analyze(spark, root, cols))
      case RestoreRe(ref, v) =>
        val root = refRoot(spark, ref)
        return result(spark, root, "restore",
          Versioned.restore(root, v.toLong))
      case CloneRe(srcRef, dstRef, v) =>
        val dst = refRoot(spark, dstRef)
        return result(spark, dst, "clone",
          Versioned.cloneShallow(spark, refRoot(spark, srcRef), dst,
            Option(v).map(_.toLong)))
      case CopyIntoRe(ref, src, fmt, opts, copyOpts) =>
        val root = refRoot(spark, ref)
        val options = optionPairs("FORMAT_OPTIONS", opts)
        val cOpts = optionPairs("COPY_OPTIONS", copyOpts)
        cOpts.keys.foreach(k => require(k.equalsIgnoreCase("force"),
          s"unknown COPY_OPTIONS key: '$k' — supported: 'force'"))
        return result(spark, root, "copy",
          Versioned.copyInto(spark, root, src, fmt.toLowerCase, options,
            force = cOpts.exists(kv => kv._1.equalsIgnoreCase("force") &&
              kv._2.equalsIgnoreCase("true"))))
      case _ => ()
    }
    spark.sessionState.sqlParser.parsePlan(stmt) match {

      case m: MergeIntoTable =>
        val root = pathOf(spark, m.targetTable)
        val source = GraftShims.ofRows(spark, m.sourceTable)
        val tAlias = aliasOf(m.targetTable)
        val sAlias = aliasOf(m.sourceTable).orElse(m.sourceTable match {
          case r: UnresolvedRelation => Some(r.multipartIdentifier.last)
          case _ => None
        })
        val keys = equiKeys(m.mergeCondition, tAlias, sAlias)
        // schema evolution (Delta's autoMerge conf): when enabled AND
        // the source carries columns the target lacks, route around
        // the schema-ENFORCING fast paths to the general merge, which
        // evolves the table (star actions copy the new columns)
        val autoMerge = spark.conf
          .getOption("spark.graft.merge.autoMerge").exists(_.toBoolean)
        lazy val evolving = autoMerge && {
          val ts = Versioned.tableSchema(spark, root, None)
          source.schema.fieldNames.exists(n =>
            !ts.fieldNames.exists(_.equalsIgnoreCase(n)))
        }
        (m.matchedActions, m.notMatchedActions,
          m.notMatchedBySourceActions, keys) match {
          // fast paths — single same-named key, star actions, no
          // conditions: these map onto the specialized pruned verbs
          // (identical results; fewer joins than the general planner)
          case (Seq(UpdateStarAction(None)), Seq(InsertStarAction(None)),
              Seq(), Seq((tk, sk))) if tk == sk && !evolving =>
            result(spark, root, "merge",
              Versioned.mergeUpsert(spark, root, source, tk, cdf = cdf))
          // keyed purge: delete every target row matching a source key
          case (Seq(DeleteAction(None)), Seq(), Seq(), Seq((tk, sk)))
              if tk == sk =>
            result(spark, root, "delete",
              Versioned.deleteKeys(spark, root,
                Seq(tk -> source.select(tk)), cdf = cdf))
          // dedup append: insert only keys the target doesn't have;
          // the existence probe reads ONLY the files the source keys
          // can touch (keys-frame pruning), never the table
          case (Seq(), Seq(InsertStarAction(None)), Seq(), Seq((tk, sk)))
              if tk == sk && !evolving =>
            val latest = Versioned.latestVersion(root).getOrElse(
              throw new IllegalArgumentException(
                s"no versions at $root to merge into"))
            val existing = Versioned.readVersionForKeys(spark, root,
              latest, source.select(tk), Seq(tk)).select(tk)
            result(spark, root, "append",
              Versioned.commit(spark, root,
                source.join(existing, Seq(tk), "left_anti"),
                expectedVersion = Some(latest)))
          // the full ANSI grammar: composite/renamed keys, conditional
          // WHEN clauses, column-level SET, WHEN NOT MATCHED BY SOURCE
          case _ =>
            def cnd(o: Option[Expression]) =
              o.map(e => GraftShims.column(requalify(e, tAlias, sAlias)))
            def asg(as: Seq[Assignment]) = as.map(a => nameOf(a.key) ->
              GraftShims.column(requalify(a.value, tAlias, sAlias)))
            val matched = m.matchedActions.map {
              case UpdateAction(c0, as, _) =>
                Versioned.MatchedUpdate(cnd(c0), Some(asg(as)))
              case UpdateStarAction(c0) =>
                Versioned.MatchedUpdate(cnd(c0), None)
              case DeleteAction(c0) => Versioned.MatchedDelete(cnd(c0))
              case other => throw new IllegalArgumentException(
                s"unsupported WHEN MATCHED action: $other")
            }
            val notMatched = m.notMatchedActions.map {
              case InsertAction(c0, as) =>
                Versioned.NotMatchedInsert(cnd(c0), Some(asg(as)))
              case InsertStarAction(c0) =>
                Versioned.NotMatchedInsert(cnd(c0), None)
              case other => throw new IllegalArgumentException(
                s"unsupported WHEN NOT MATCHED action: $other")
            }
            val bySource = m.notMatchedBySourceActions.map {
              case UpdateAction(c0, as, _) =>
                Versioned.BySourceUpdate(cnd(c0), asg(as))
              case DeleteAction(c0) => Versioned.BySourceDelete(cnd(c0))
              case other => throw new IllegalArgumentException(
                s"unsupported WHEN NOT MATCHED BY SOURCE action: $other")
            }
            result(spark, root, "merge",
              Versioned.merge(spark, root, source, keys,
                matched, notMatched, bySource, cdf = cdf,
                mergeSchema = autoMerge))
        }

      case ins: InsertIntoStatement =>
        val root = pathOf(spark, ins.table)
        require(ins.partitionSpec.isEmpty && !ins.ifPartitionNotExists,
          "static PARTITION clauses are not supported — the versioned " +
            "table derives partitions from the data (dynamic overwrite " +
            "is Versioned.overwritePartitions)")
        val raw = GraftShims.ofRows(spark, ins.query)
        // ONE schema read serves binding and casts (None = the table
        // doesn't exist yet: the source's shape simply becomes v1)
        val declared = Versioned.latestVersion(root)
          .map(_ => Versioned.tableSchema(spark, root))
        def lcase(s: String) = s.toLowerCase(java.util.Locale.ROOT)
        def canon(n: String): String = declared
          .flatMap(_.fields.find(_.name.equalsIgnoreCase(n)).map(_.name))
          .getOrElse(n)
        // target column list: the explicit list (canonicalized to the
        // declared casing) or the full table schema
        val targets: Option[Seq[String]] =
          if (ins.userSpecifiedCols.nonEmpty)
            Some(ins.userSpecifiedCols.map(canon))
          else declared.map(_.fieldNames.toSeq)
        val bound = (targets, ins.byName) match {
          case (Some(ts), false) =>
            // default INSERT is POSITIONAL (the ANSI contract, and
            // Spark's own): the query's columns map to the target list
            // left-to-right; arity must match exactly — never silent
            // truncation or reorder
            require(raw.columns.length == ts.length,
              s"INSERT provides ${raw.columns.length} column(s) but " +
                s"the target list has ${ts.length}" +
                (if (ins.userSpecifiedCols.isEmpty)
                   " — name the columns (INSERT INTO t (a, b) ...) to " +
                     "insert a subset"
                 else ""))
            raw.toDF(ts: _*)
          case (Some(_), true) => // INSERT ... BY NAME
            raw.select(raw.columns.toSeq.map(c0 =>
              raw.col(c0).as(canon(c0))): _*)
          case (None, _) => raw
        }
        // ANSI store-assignment: literals arrive as their natural type
        // (VALUES (1) is an INT); UP-casts to the declared column type
        // are implicit, anything lossy stays a loud error
        val source = declared match {
          case None => bound
          case Some(ts0) =>
            val byLc = ts0.fields.map(f => lcase(f.name) -> f).toMap
            bound.select(bound.schema.fields.toSeq.map { sf =>
              byLc.get(lcase(sf.name)) match {
                case Some(tf) if tf.dataType != sf.dataType &&
                    org.apache.spark.sql.catalyst.expressions.Cast
                      .canUpCast(sf.dataType, tf.dataType) =>
                  bound.col(sf.name).cast(tf.dataType).as(tf.name)
                case Some(tf) => bound.col(sf.name).as(tf.name)
                case None => bound.col(sf.name)
              }
            }: _*)
        }
        val mode = if (ins.overwrite) "overwrite" else "append"
        // INSERT OVERWRITE preserves the table's DECLARED partition
        // layout (the Spark/Delta contract): commit's overwrite mode
        // replaces layout along with rows, so the parent's partitionBy
        // must be passed through explicitly or a partitioned table
        // would silently flatten to unpartitioned (breaking later
        // overwritePartitions calls and partition pruning). Appends
        // inherit the layout inside commit already.
        val keepLayout =
          if (ins.overwrite) Versioned.partitionByOf(root) else Nil
        result(spark, root, mode,
          Versioned.commit(spark, root, source, mode = mode,
            partitionBy = keepLayout))

      case UpdateTable(table, assignments, condition) =>
        val root = pathOf(spark, table)
        val alias = aliasOf(table)
        val (subq, residual) = condition
          .map(splitSubqueryPredicate(spark, _, alias))
          .getOrElse((None, None))
        subq match {
          case None =>
            val asg = assignments.map { a =>
              nameOf(a.key) -> GraftShims.column(stripAlias(a.value, alias))
            }
            val cond = residual
              .map(c => GraftShims.column(stripAlias(c, alias)))
              .getOrElse(lit(true))
            result(spark, root, "update",
              Versioned.updateRows(spark, root, asg, cond, cdf = cdf))
          case Some(sp) =>
            // UPDATE … WHERE [NOT] IN/EXISTS (SELECT …): the subquery
            // frame drives merge's keys-based FILE pruning for the
            // positive forms (stats-excluded files carry by
            // reference); NOT EXISTS is merge's NOT MATCHED BY SOURCE
            // (anti-join null semantics — inherently a full pass, the
            // verb's own cost model). Residual conjuncts ride the
            // clause guard; RHS see the pre-update row.
            val asg = assignments.map { a =>
              nameOf(a.key) -> GraftShims.column(qualifyT(a.value, alias))
            }
            val guard = residual
              .map(r => GraftShims.column(qualifyT(r, alias)))
            result(spark, root, "update",
              if (!sp.negated)
                Versioned.merge(spark, root, sp.frame.distinct(), sp.keys,
                  matched = Seq(Versioned.MatchedUpdate(guard, Some(asg))),
                  cdf = cdf)
              else
                Versioned.merge(spark, root, sp.frame.distinct(), sp.keys,
                  notMatchedBySource =
                    Seq(Versioned.BySourceUpdate(guard, asg)),
                  cdf = cdf))
        }

      case DeleteFromTable(table, condition) =>
        val root = pathOf(spark, table)
        val alias = aliasOf(table)
        splitSubqueryPredicate(spark, condition, alias) match {
          case (None, _) =>
            result(spark, root, "delete",
              Versioned.delete(spark, root,
                GraftShims.column(stripAlias(condition, alias)),
                cdf = cdf))
          // the dbt delete+insert shape — DELETE WHERE id IN
          // (SELECT id FROM src …) / correlated EXISTS — lands on the
          // keys-frame-pruned anti-join verb, never a full-table
          // predicate scan
          case (Some(sp), None) if !sp.negated && sp.keys.size == 1 =>
            result(spark, root, "delete",
              Versioned.deleteKeys(spark, root,
                Seq(sp.keys.head._1 -> sp.frame), cdf = cdf))
          case (Some(sp), res) =>
            val guard = res.map(r => GraftShims.column(qualifyT(r, alias)))
            result(spark, root, "delete",
              if (!sp.negated)
                Versioned.merge(spark, root, sp.frame.distinct(), sp.keys,
                  matched = Seq(Versioned.MatchedDelete(guard)),
                  cdf = cdf)
              else
                // NOT EXISTS: delete rows NO subquery row matches —
                // merge's NOT MATCHED BY SOURCE, exact anti-join
                // null semantics
                Versioned.merge(spark, root, sp.frame.distinct(), sp.keys,
                  notMatchedBySource =
                    Seq(Versioned.BySourceDelete(guard)),
                  cdf = cdf))
        }

      case AddColumns(table, colsToAdd) =>
        val root = pathOf(spark, table)
        val fields = colsToAdd.map { c =>
          require(c.name.size == 1,
            s"nested column paths are not supported: ${c.name.mkString(".")}")
          require(c.position.isEmpty,
            "column positions are not supported — new columns append")
          require(c.default.isEmpty,
            "column DEFAULTs are not supported — added columns null-fill")
          require(c.nullable,
            s"column '${c.name.head}' declared NOT NULL — an added " +
              "column must be nullable: existing rows have no value " +
              "to give it")
          org.apache.spark.sql.types.StructField(
            c.name.head, c.dataType, nullable = true)
        }
        result(spark, root, "schema",
          Versioned.addColumns(spark, root, fields))

      case CreateTable(name, columns, partitioning, _, ignoreIfExists) =>
        val root = pathOf(spark, name)
        val fields = columns.map { cd =>
          require(cd.defaultValue.isEmpty && cd.generationExpression.isEmpty,
            s"column '${cd.name}': DEFAULT and GENERATED columns are " +
              "not supported")
          org.apache.spark.sql.types.StructField(
            cd.name, cd.dataType, cd.nullable)
        }
        result(spark, root, "create",
          Versioned.createTable(spark, root,
            org.apache.spark.sql.types.StructType(fields),
            partitionColsOf(partitioning), ifNotExists = ignoreIfExists))

      case CreateTableAsSelect(name, partitioning, query, _, writeOptions,
          ignoreIfExists, _) =>
        val root = pathOf(spark, name)
        require(writeOptions.isEmpty,
          "CTAS write OPTIONS are not supported")
        Versioned.latestVersion(root) match {
          case Some(v) =>
            require(ignoreIfExists,
              s"table at $root already exists (latest version $v)")
            result(spark, root, "create", v)
          case None =>
            // expectedVersion = 0 routes the existence race through the
            // CAS: two concurrent CTAS both observing "no table" cannot
            // both land — the loser gets a clean conflict instead of
            // silently appending its result onto the winner's. Under
            // IF NOT EXISTS the loser then honors the clause: the
            // winner's table IS the "exists" case, so re-resolve and
            // return its version instead of surfacing the conflict.
            val v =
              try Versioned.commit(spark, root,
                GraftShims.ofRows(spark, query),
                partitionBy = partitionColsOf(partitioning),
                expectedVersion = Some(0L))
              catch {
                case e: Versioned.VersionConflictException =>
                  if (!ignoreIfExists) throw e
                  Versioned.latestVersion(root).getOrElse(throw e)
              }
            result(spark, root, "create", v)
        }

      case TruncateTable(table) =>
        val root = pathOf(spark, table)
        result(spark, root, "truncate", Versioned.truncate(root))

      case RenameColumn(table, column, newName) =>
        val root = pathOf(spark, table)
        require(column.name.size == 1,
          s"nested column paths are not supported: ${column.name.mkString(".")}")
        result(spark, root, "schema",
          Versioned.renameColumn(spark, root, column.name.head, newName))

      case AlterColumns(table, specs) =>
        val root = pathOf(spark, table)
        require(specs.size == 1,
          "one ALTER COLUMN per statement")
        val sp = specs.head
        require(sp.newDataType.isDefined && sp.newNullability.isEmpty &&
            sp.newComment.isEmpty && sp.newPosition.isEmpty &&
            sp.newDefaultExpression.isEmpty && !sp.dropDefault,
          "only ALTER COLUMN ... TYPE <wider type> is supported " +
            "(metadata-only lossless widening)")
        require(sp.column.name.size == 1,
          s"nested column paths are not supported: ${sp.column.name.mkString(".")}")
        result(spark, root, "schema",
          Versioned.widenColumn(spark, root, sp.column.name.head,
            sp.newDataType.get))

      case DropColumns(table, colsToDrop, ifExists) =>
        val root = pathOf(spark, table)
        require(!ifExists,
          "IF EXISTS is not supported — a drop of a missing column " +
            "should fail loudly")
        val names = colsToDrop.map { f =>
          require(f.name.size == 1,
            s"nested column paths are not supported: ${f.name.mkString(".")}")
          f.name.head
        }
        result(spark, root, "schema",
          Versioned.dropColumns(spark, root, names))

      case AddCheckConstraint(table, cc) =>
        val root = pathOf(spark, table)
        result(spark, root, "constraint",
          Versioned.addConstraint(spark, root, cc.userProvidedName,
            cc.condition))

      case a: AddConstraint => throw new IllegalArgumentException(
        s"only CHECK constraints are supported, got ${a.tableConstraint}")

      case DropConstraint(table, name, ifExists, _) =>
        val root = pathOf(spark, table)
        if (ifExists && !Versioned.constraintsOf(root).contains(name))
          result(spark, root, "constraint",
            Versioned.latestVersion(root).getOrElse(
              throw new IllegalArgumentException(s"no versions at $root")))
        else
          result(spark, root, "constraint",
            Versioned.dropConstraint(root, name))

      case _ => spark.sql(stmt) // reads (TVFs already registered)
    }
  }

  /** The target path: one backquoted identifier (or a catalog-named
    * `cat.ns.table` resolving through a registered [[graft.sources
    * .GraftCatalog]]), through any alias. */
  private def pathOf(spark: SparkSession, plan: LogicalPlan): String =
    plan match {
      case SubqueryAlias(_, child) => pathOf(spark, child)
      // AddCheckConstraint's child is the VALIDATION query (a filter
      // for violating rows over the relation) — look through it
      case f: Filter => pathOf(spark, f.child)
      case r: UnresolvedRelation => ident(spark, r.multipartIdentifier)
      case t: UnresolvedTable => ident(spark, t.multipartIdentifier)
      case i: org.apache.spark.sql.catalyst.analysis.UnresolvedIdentifier =>
        ident(spark, i.nameParts)
      case other => throw new IllegalArgumentException(
        s"cannot resolve a versioned-table path from $other — name the " +
          "table by its filesystem path as one backquoted identifier, " +
          "e.g. MERGE INTO `/lake/events` t …")
    }

  /** String-argument table reference (the TVF surface): a filesystem
    * path, or a registered catalog name `cat.ns.t` resolved through
    * the same identifier→path rule the SQL dispatcher uses. Anything
    * containing '/' is always a path; a dotted name resolves through
    * the catalog iff its head names a registered graft catalog
    * (otherwise it stays a path — dotted relative paths keep working). */
  private[graft] def resolveRef(spark: SparkSession, ref: String): String =
    if (ref.contains('/') || !ref.contains('.')) ref
    else {
      val parts = ref.split('.').toSeq
      val cls =
        try spark.conf.get(s"spark.sql.catalog.${parts.head}")
        catch { case _: Exception => "" }
      if (cls == classOf[graft.sources.GraftCatalog].getName)
        ident(spark, parts)
      else ref
    }

  private def ident(spark: SparkSession, parts: Seq[String]): String = {
    // a multipart name resolves through a registered GraftCatalog —
    // the row-level verbs Spark's DSv2 analyzer won't plan for the
    // catalog (MERGE/UPDATE/DELETE/COPY/maintenance) work by NAME
    // through the dispatcher against the same warehouse layout
    if (parts.size > 1) {
      val cat = parts.head
      val cls =
        try spark.conf.get(s"spark.sql.catalog.$cat")
        catch { case _: Exception => "" }
      require(cls == classOf[graft.sources.GraftCatalog].getName,
        s"'${parts.mkString(".")}' is not a versioned table: '$cat' " +
          "is not a registered graft catalog — name the table by " +
          "path as one backquoted identifier, or register " +
          s"spark.sql.catalog.$cat")
      val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
      // the catalog's OWN identifier→path rule (shared helper — the
      // two surfaces can never desynchronize on escaping/normalizing)
      graft.sources.GraftCatalog.resolveRoot(wh, parts.tail)
    } else parts.head
  }

  /** MERGE ON → equi-key pairs (target column, source column): a
    * conjunction of `t.k = s.k` equalities, with sides recognized by
    * the written aliases (either order per equality; an unqualified
    * same-named pair is accepted as that column on both sides). */
  private def equiKeys(cond: Expression, tAlias: Option[String],
      sAlias: Option[String]): Seq[(String, String)] = {
    def split(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        split(l) ++ split(r)
      case o => Seq(o)
    }
    def side(u: UnresolvedAttribute): Option[String] =
      if (u.nameParts.length < 2) None
      else if (tAlias.exists(_.equalsIgnoreCase(u.nameParts.head)))
        Some("t")
      else if (sAlias.exists(_.equalsIgnoreCase(u.nameParts.head)))
        Some("s")
      else None
    split(cond).map {
      case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute) =>
        (side(a), side(b)) match {
          case (Some("t"), Some("s")) => a.nameParts.last -> b.nameParts.last
          case (Some("s"), Some("t")) => b.nameParts.last -> a.nameParts.last
          case (None, None) if a.nameParts.last == b.nameParts.last =>
            a.nameParts.last -> a.nameParts.last
          case _ => throw new IllegalArgumentException(
            s"MERGE ON equality ${EqualTo(a, b).sql} — qualify each " +
              "side with the target/source alias (t.k = s.k)")
        }
      case other => throw new IllegalArgumentException(
        "MERGE ON must be a conjunction of column equalities " +
          s"(t.k1 = s.k1 AND …); got ${other.sql}")
    }
  }

  /** Requalify t/s-aliased attribute references onto the literal
    * `t`/`s` aliases [[Versioned.merge]]'s internal join uses. */
  private def requalify(e: Expression, tAlias: Option[String],
      sAlias: Option[String]): Expression = e.transform {
    case ua: UnresolvedAttribute if ua.nameParts.length > 1 &&
        tAlias.exists(_.equalsIgnoreCase(ua.nameParts.head)) =>
      UnresolvedAttribute("t" +: ua.nameParts.tail)
    case ua: UnresolvedAttribute if ua.nameParts.length > 1 &&
        sAlias.exists(_.equalsIgnoreCase(ua.nameParts.head)) =>
      UnresolvedAttribute("s" +: ua.nameParts.tail)
  }

  /** The target's declared alias, when one was written. */
  /** Hive-layout partition columns from DSv2 transforms: only identity
    * partitioning maps onto the versioned table's per-file-tuple
    * layout; bucket/temporal transforms are rejected loudly. */
  private def partitionColsOf(
      ts: Seq[org.apache.spark.sql.connector.expressions.Transform])
      : Seq[String] = ts.map { t =>
    require(t.name == "identity",
      s"unsupported PARTITIONED BY transform: $t — only identity " +
        "(plain column) partitioning maps onto the hive-layout table")
    val parts = t.references()(0).fieldNames.toSeq
    require(parts.size == 1,
      s"nested partition column not supported: ${parts.mkString(".")}")
    parts.head
  }

  private def aliasOf(plan: LogicalPlan): Option[String] = plan match {
    case SubqueryAlias(id, _) => Some(id.name)
    case _ => None
  }

  /** Strip the target alias's qualifier from attribute references so
    * `DELETE FROM \`/p\` t WHERE t.c < 5` resolves against the table
    * frame (which carries no alias). */
  private def stripAlias(e: Expression, alias: Option[String]): Expression =
    alias.fold(e)(a => e.transform {
      case ua: UnresolvedAttribute if ua.nameParts.length > 1 &&
          ua.nameParts.head.equalsIgnoreCase(a) =>
        UnresolvedAttribute(ua.nameParts.tail)
    })

  /** A normalized subquery conjunct from an UPDATE/DELETE predicate:
    * equi-key pairs (target column → frame column) plus the keys
    * frame. `negated = true` is the NOT EXISTS form (anti-join
    * semantics → merge's NOT MATCHED BY SOURCE). */
  private final case class SubPred(keys: Seq[(String, String)],
      frame: DataFrame, negated: Boolean)

  /** Split an UPDATE/DELETE predicate into an optional single
    * top-level subquery conjunct — `col IN (SELECT …)`,
    * `(a, b) IN (SELECT …)`, a correlated `EXISTS (…)` or
    * `NOT EXISTS (…)` — and the residual literal conjuncts. The
    * positive forms drive keys-based FILE pruning; subqueries
    * anywhere else (under OR, `NOT IN` with its null footgun, more
    * than one conjunct) are rejected loudly: resolving them without
    * pruning would hide a full-scan verb behind pruned-verb syntax,
    * and `NOT IN` over a nullable subquery silently matches nothing
    * (write NOT EXISTS for the anti semantics instead). */
  private def splitSubqueryPredicate(spark: SparkSession,
      cond: Expression, alias: Option[String])
      : (Option[SubPred], Option[Expression]) = {
    import org.apache.spark.sql.catalyst.expressions.Not
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case o => Seq(o)
    }
    def isSub(e: Expression): Boolean = e match {
      case _: InSubquery => true
      case _: Exists => true
      case Not(_: Exists) => true
      case _ => false
    }
    val cs = conjuncts(cond)
    val (subs, rest) = cs.partition(isSub)
    require(rest.forall(r => !r.exists(_.isInstanceOf[SubqueryExpression])),
      "subquery predicates are supported only as ONE top-level AND-ed " +
        "`col IN (SELECT …)`, `EXISTS (…)` or `NOT EXISTS (…)` " +
        "conjunct (the keys-frame shapes; for NOT IN write NOT EXISTS " +
        s"— anti-join semantics without the null footgun); got: ${cond.sql}")
    if (subs.isEmpty) (None, Some(cond))
    else {
      require(subs.size == 1,
        "at most one subquery conjunct is supported — ANDed subqueries " +
          s"intersect; pre-join them into one subquery instead: ${cond.sql}")
      val sp = subs.head match {
        case InSubquery(values, lq: ListQuery) =>
          val cols = values.map(v => stripAlias(v, alias) match {
            case ua: UnresolvedAttribute => ua.nameParts.last
            case other => throw new IllegalArgumentException(
              s"IN (subquery) left side must be columns, got ${other.sql}")
          })
          val keys = GraftShims.ofRows(spark, lq.plan)
          require(keys.columns.length == cols.size,
            s"IN (subquery) arity mismatch: ${cols.size} left-side " +
              s"columns vs ${keys.columns.length} selected")
          SubPred(cols.zip(keys.columns.toSeq), keys, negated = false)
        case e: Exists => existsPred(spark, e, alias, negated = false)
        case Not(e: Exists) => existsPred(spark, e, alias, negated = true)
        case other => throw new IllegalArgumentException(
          s"unsupported subquery form: ${other.sql}")
      }
      (Some(sp), rest.reduceOption(And.apply))
    }
  }

  /** `EXISTS (SELECT … FROM rel WHERE t.k = s.k AND inner…)` → the
    * alias-qualified correlation equalities become the key pairs;
    * inner conjuncts (no target references) stay INSIDE the subquery
    * frame, so the keys frame is already filtered when it prunes. */
  private def existsPred(spark: SparkSession, e: Exists,
      alias: Option[String], negated: Boolean): SubPred = {
    def refsTarget(x: Expression): Boolean = x.exists {
      case ua: UnresolvedAttribute => ua.nameParts.length > 1 &&
        alias.exists(_.equalsIgnoreCase(ua.nameParts.head))
      case _ => false
    }
    // the SELECT list of an EXISTS is irrelevant — peel to the filter
    def peel(p: LogicalPlan): LogicalPlan = p match {
      case Project(_, child) => peel(child)
      case Distinct(child) => peel(child)
      case other => other
    }
    def conjuncts(x: Expression): Seq[Expression] = x match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case o => Seq(o)
    }
    peel(e.plan) match {
      case Filter(fc, rel) =>
        val (corr0, inner) = conjuncts(fc).partition(refsTarget)
        require(corr0.nonEmpty,
          "EXISTS must correlate with the target through its alias " +
            s"(${alias.getOrElse("t")}.col = subquery.col); got: ${fc.sql}")
        val corr = corr0.map {
          case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
              if refsTarget(a) && !refsTarget(b) =>
            (a.nameParts.last, b)
          case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
              if refsTarget(b) && !refsTarget(a) =>
            (b.nameParts.last, a)
          case other => throw new IllegalArgumentException(
            "EXISTS correlation must be a conjunction of target-vs-" +
              s"subquery column equalities; got: ${other.sql}")
        }
        val filtered = inner.reduceOption(And.apply)
          .map(Filter(_, rel)).getOrElse(rel)
        val frame = GraftShims.ofRows(spark, filtered)
          .select(corr.zipWithIndex.map { case ((_, ia), i) =>
            GraftShims.column(ia).as(s"__k$i") }: _*)
        SubPred(corr.zipWithIndex.map { case ((t, _), i) => t -> s"__k$i" },
          frame, negated)
      case other => throw new IllegalArgumentException(
        "EXISTS subquery must be a relation filtered on a correlation " +
          s"with the target; got: $other")
    }
  }

  /** Qualify attribute references onto the `t` alias [[Versioned
    * .merge]]'s internal join gives the target (stripping the
    * statement's declared table alias first), so residual predicates
    * and SET right-hand sides stay unambiguous next to the keys
    * frame. */
  private def qualifyT(e: Expression, alias: Option[String]): Expression =
    e.transform {
      case ua: UnresolvedAttribute =>
        val stripped =
          if (ua.nameParts.length > 1 &&
              alias.exists(_.equalsIgnoreCase(ua.nameParts.head)))
            ua.nameParts.tail
          else ua.nameParts
        UnresolvedAttribute("t" +: stripped)
    }

  private def nameOf(e: Expression): String = e match {
    case a: UnresolvedAttribute => a.nameParts.last
    case other => throw new IllegalArgumentException(
      s"SET target must be a column name, got $other")
  }

  private def result(spark: SparkSession, root: String, verb: String,
      version: Long): DataFrame = {
    import spark.implicits._
    Seq((root, verb, version)).toDF("path", "verb", "version")
  }

  /** SET PARTITION SPEC item list split at TOP-LEVEL commas only —
    * `bucket(8, k), days(ts)` is two items, not three. */
  private def splitSpecItems(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => out += cur.result(); cur.clear()
      case c => cur += c
    }
    require(depth == 0, s"unbalanced parentheses in partition spec: $s")
    out += cur.result()
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private val BucketItemRe =
    """(?i)(bucket|truncate)\s*\(\s*(\d+)\s*,\s*`?([A-Za-z0-9_]+)`?\s*\)""".r
  private val TimeItemRe =
    """(?i)(days|months|years|hours)\s*\(\s*`?([A-Za-z0-9_]+)`?\s*\)""".r
  private val IdentItemRe = """`?([A-Za-z0-9_]+)`?""".r

  /** One spec item → identity column (Left) or hidden transform
    * (Right); anything else refuses loudly. */
  private def parseSpecItem(item: String)
      : Either[String, Versioned.PartTransform] = item match {
    case BucketItemRe(fn, n, col) =>
      Right(Versioned.PartTransform(
        fn.toLowerCase(java.util.Locale.ROOT), n.toInt, col))
    case TimeItemRe(fn, col) =>
      Right(Versioned.PartTransform(
        fn.toLowerCase(java.util.Locale.ROOT), 0, col))
    case IdentItemRe(col) => Left(col)
    case other => throw new IllegalArgumentException(
      s"bad partition spec item: '$other' — expected a column, " +
        "bucket(n, col), truncate(n, col), days(col), months(col), " +
        "years(col) or hours(col)")
  }
}
