package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Model-based random-walk check: a seeded random sequence of table
  * verbs (append, copy-on-write delete, deletion-vector delete,
  * overwrite, restore, compact, replaceWhere, copy-on-write UPDATE,
  * SQL-dispatched UPDATE/MERGE, the general-grammar MERGE, and COPY
  * INTO) runs against BOTH the versioned
  * table and a trivial in-memory set model. After every published
  * version the live read must equal the model, and at the end EVERY
  * retained version must time-travel to exactly the model state
  * recorded when it was published — the cross-verb interaction
  * surface (segment carry × restore × pending DVs × replace × update)
  * that single-verb specs cannot reach. */
class VersionedModelSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-vmodel").toString + "/t"

  private type RowT = (Long, String)

  private def df(rows: Iterable[RowT]) =
    rows.toSeq.toDF("id", "tag").coalesce(1)

  private def readSet(root: String): Set[RowT] =
    Versioned.read(spark, root).as[RowT].collect().toSet

  test("25-step random verb walks match the model at head and at every " +
      "retained version (four seeds)") {
    for (seed <- Seq(7, 1234, 99, 2025)) {
      val rnd = new scala.util.Random(seed)
      val root = freshRoot()
      var nextId = 0L
      var model = Set.empty[RowT]
      val history = scala.collection.mutable.Map.empty[Long, Set[RowT]]
      // whether the version has live deletion vectors (CoW verbs refuse)
      val dvAt = scala.collection.mutable.Map.empty[Long, Boolean]
      var pendingDv = false

      def fresh(n: Int, tag: String): Seq[RowT] = {
        val rows = (0 until n).map(i => (nextId + i, tag))
        nextId += n
        rows
      }
      def record(v: Long): Unit = {
        history(v) = model
        dvAt(v) = pendingDv
        assert(readSet(root) === model,
          s"seed $seed: live read diverged from the model at v$v")
      }
      def compactNow(): Unit = {
        val v = Versioned.compact(spark, root)
        pendingDv = false
        record(v)
      }

      // seed version
      model = fresh(10, "seed").toSet
      record(Versioned.commit(spark, root, df(model),
        statsCols = Seq("id", "tag")))
      val landing = root + "-landing"
      new java.io.File(landing).mkdirs()

      for (step <- 1 to 25) {
        rnd.nextInt(18) match {
          case 0 | 1 | 2 =>
            val rows = fresh(1 + rnd.nextInt(15), s"s$step")
            model = model ++ rows
            record(Versioned.commit(spark, root, df(rows),
              statsCols = Seq("id", "tag")))
          case 3 | 4 =>
            // copy-on-write delete of a random id suffix
            if (pendingDv) compactNow()
            val cut = math.abs(rnd.nextLong()) % math.max(1L, nextId)
            model = model.filterNot(_._1 >= cut)
            record(Versioned.delete(spark, root, col("id") >= cut,
              statsCols = Seq("id", "tag")))
          case 5 =>
            // deletion-vector delete of a residue class
            val k = 2 + rnd.nextInt(5)
            val before = model
            model = model.filterNot(_._1 % k == 0)
            val v = Versioned.deleteRows(spark, root, col("id") % k === 0)
            if (model != before) pendingDv = true
            record(v)
          case 6 =>
            val rows = fresh(5 + rnd.nextInt(10), s"ow$step")
            model = rows.toSet
            pendingDv = false // overwrite replaces the live set wholesale
            record(Versioned.commit(spark, root, df(rows),
              mode = "overwrite", statsCols = Seq("id", "tag")))
          case 7 =>
            // restore to a random retained version (model = its state)
            val vs = history.keys.toSeq.sorted
            val target = vs(rnd.nextInt(vs.size))
            model = history(target)
            pendingDv = dvAt(target)
            record(Versioned.restore(root, target))
          case 8 =>
            compactNow()
          case 9 =>
            // replaceWhere on one step's tag with a recomputed frame
            if (pendingDv) compactNow()
            val tags = model.map(_._2)
            if (tags.nonEmpty) {
              val t = tags.toSeq.sorted.apply(rnd.nextInt(tags.size))
              val repl = fresh(1 + rnd.nextInt(5), t)
              model = model.filterNot(_._2 == t) ++ repl
              record(Versioned.replaceWhere(spark, root, col("tag") === t,
                df(repl), statsCols = Seq("id", "tag")))
            }
          case 10 =>
            // copy-on-write UPDATE of a residue class (round 7)
            if (pendingDv) compactNow()
            val k = 2 + rnd.nextInt(5)
            model = model.map { case (id, tag) =>
              if (id % k == 0) (id, s"u$step") else (id, tag)
            }
            record(Versioned.updateRows(spark, root,
              Seq("tag" -> lit(s"u$step")), col("id") % k === 0,
              statsCols = Seq("id", "tag")))
          case 11 =>
            // the same UPDATE through the SQL dispatcher
            if (pendingDv) compactNow()
            val k = 2 + rnd.nextInt(5)
            model = model.map { case (id, tag) =>
              if (id % k == 1) (id, s"q$step") else (id, tag)
            }
            val v = Versioned.sql(spark,
              s"UPDATE `$root` SET tag = 'q$step' WHERE id % $k = 1")
              .select("version").as[Long].head()
            record(v)
          case 12 =>
            // SQL MERGE upsert: half updates of random survivors, half
            // fresh inserts — full-row replace by id
            if (pendingDv) compactNow()
            val survivors = model.toSeq.sortBy(_._1)
            val upd = rnd.shuffle(survivors).take(rnd.nextInt(4))
              .map { case (id, _) => (id, s"m$step") }
            val ins = fresh(1 + rnd.nextInt(4), s"m$step")
            val src = (upd ++ ins).toSeq
            val ids = src.map(_._1).toSet
            model = model.filterNot(r => ids(r._1)) ++ src
            df(src).createOrReplaceTempView(s"vmodel_merge_$step")
            val v = Versioned.sql(spark,
              s"""MERGE INTO `$root` t USING vmodel_merge_$step s
                 |ON t.id = s.id
                 |WHEN MATCHED THEN UPDATE SET *
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
              .select("version").as[Long].head()
            record(v)
          case 13 =>
            // column-mapping round-trip (round 7): rename tag → a
            // step-unique name, append THROUGH the mapping, rename
            // back — values must survive, and the interleaved write
            // must land under the immutable physical name
            Versioned.renameColumn(spark, root, "tag", s"label$step")
            val rows = fresh(1 + rnd.nextInt(5), s"r$step")
            model = model ++ rows
            Versioned.commit(spark, root,
              rows.toSeq.toDF("id", s"label$step").coalesce(1),
              statsCols = Seq("id", s"label$step"))
            record(Versioned.renameColumn(spark, root, s"label$step", "tag"))
          case 14 =>
            // metadata-only ADD then DROP of a throwaway column
            // (round 7): schema commits interleave with every other
            // verb's segment carry / restore / compact machinery
            Versioned.addColumns(spark, root, Seq(
              org.apache.spark.sql.types.StructField(s"x$step",
                org.apache.spark.sql.types.DoubleType)))
            record(Versioned.dropColumns(spark, root, Seq(s"x$step")))
          case 15 =>
            // metadata-only TRUNCATE (round 7): the live set empties in
            // one manifest commit; schema and layout survive, pending
            // row-removal state is moot, and history stays readable
            model = Set.empty
            pendingDv = false
            record(Versioned.truncate(root))
          case 16 =>
            // the general-grammar MERGE (round 8): conditional DELETE,
            // column-level UPDATE, guarded INSERT and NOT MATCHED BY
            // SOURCE in one statement — every clause family interacting
            // with whatever state the walk built up
            if (pendingDv) compactNow()
            val survivors = model.toSeq.sortBy(_._1)
            val touchedIds = rnd.shuffle(survivors)
              .take(rnd.nextInt(4)).map(_._1)
            val ins = fresh(1 + rnd.nextInt(3), s"g$step")
            val src = touchedIds.map(id => (id, s"g$step")) ++ ins
            val srcIds = src.map(_._1).toSet
            model = model.flatMap[RowT] { case (id, tag) =>
              if (srcIds(id)) {
                if (id % 2 == 0) None else Some((id, s"g$step"))
              } else if (id % 7 == 3) Some((id, s"b$step"))
              else Some((id, tag))
            } ++ ins.filter(_._1 % 3 != 0)
            record(Versioned.merge(spark, root,
              src.toSeq.toDF("id", "nv").coalesce(1), Seq("id" -> "id"),
              matched = Seq(
                Versioned.MatchedDelete(Some(col("t.id") % 2 === 0)),
                Versioned.MatchedUpdate(None,
                  Some(Seq("tag" -> col("s.nv"))))),
              notMatched = Seq(Versioned.NotMatchedInsert(
                Some(col("s.id") % 3 =!= 0),
                Some(Seq("id" -> col("s.id"), "tag" -> col("s.nv"))))),
              notMatchedBySource = Seq(Versioned.BySourceUpdate(
                Some(col("t.id") % 7 === 3),
                Seq("tag" -> lit(s"b$step")))),
              statsCols = Seq("id", "tag")))
          case 17 =>
            // COPY INTO (round 8): a fresh batch lands as a parquet
            // file; the copy ingests it exactly once and the immediate
            // re-run is a version-identical no-op, whatever mapping /
            // DV / restore state the walk is in
            val rows = fresh(1 + rnd.nextInt(5), s"c$step")
            df(rows).write.parquet(s"$landing/b$step.parquet")
            model = model ++ rows
            record(Versioned.copyInto(spark, root, landing,
              statsCols = Seq("id", "tag")))
            assert(Versioned.copyInto(spark, root, landing) ===
              Versioned.latestVersion(root).get,
              s"seed $seed: COPY INTO re-run must be a no-op")
        }
      }

      // every retained version time-travels to its recorded model state
      Versioned.versions(root).foreach { v =>
        history.get(v).foreach { expect =>
          val got = Versioned.readVersion(spark, root, v).as[RowT]
            .collect().toSet
          assert(got === expect,
            s"seed $seed: time travel to v$v diverged " +
              s"(${got.size} vs ${expect.size} rows)")
        }
      }
    }
  }
}
