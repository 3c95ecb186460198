package graft.model

/** Relational-schema catalog: tables, columns with declared SQL types,
  * primary keys, and a foreign-key registry.
  *
  * Mirrors what the reference introspects per table via `PRAGMA table_info`
  * and `PRAGMA foreign_key_list` (reference: final/erd_text.py:20-47) into
  * plain metadata the engine owns — Spark has no FK catalog, so this is the
  * engine's own registry (SURVEY.md §2.1 S2-S4).
  */
final case class ColumnDef(name: String, sqlType: String)

/** `from` column of the owning table references `table`.`to`. */
final case class ForeignKey(from: String, table: String, to: String)

final case class TableDef(
    name: String,
    columns: Seq[ColumnDef],
    primaryKeys: Seq[String] = Nil,
    foreignKeys: Seq[ForeignKey] = Nil)

final case class RelationalCatalog(tables: Seq[TableDef]) {

  def table(name: String): TableDef =
    tables.find(_.name == name).getOrElse(sys.error(s"unknown table: $name"))

  /** ERD as text — same information layout the reference renders for its
    * modeling step (reference: final/erd_text.py:52-66): per table the
    * column list with types, the primary key, and FK arrows.
    */
  def erdText: String = {
    val sb = new StringBuilder
    tables.foreach { t =>
      sb ++= s"\nTable: ${t.name}\n"
      sb ++= "Columns:\n"
      t.columns.foreach(c => sb ++= s"  - ${c.name} (${c.sqlType})\n")
      if (t.primaryKeys.nonEmpty)
        sb ++= s"Primary Key: ${t.primaryKeys.mkString(", ")}\n"
      if (t.foreignKeys.nonEmpty) {
        sb ++= "Foreign Keys:\n"
        t.foreignKeys.foreach(fk => sb ++= s"  - ${fk.from} -> ${fk.table}.${fk.to}\n")
      }
    }
    sb.toString
  }

  /** ERD as Graphviz DOT (reference renders PNG via graphviz,
    * final/erd.py:6-33; we emit the DOT text and leave rendering to the
    * caller — no JVM graphviz dependency).
    */
  def erdDot: String = {
    val sb = new StringBuilder
    sb ++= "digraph ERD {\n  node [shape=record];\n"
    tables.foreach { t =>
      val pk = t.primaryKeys.toSet
      val fields = t.columns.map { c =>
        val mark = if (pk(c.name)) "PK " else ""
        s"$mark${c.name}: ${c.sqlType}"
      }.mkString("\\l") + "\\l"
      sb ++= s"""  ${t.name} [label="{${t.name}|$fields}"];\n"""
    }
    tables.foreach { t =>
      t.foreignKeys.foreach { fk =>
        sb ++= s"""  ${t.name} -> ${fk.table} [label="${fk.from}"];\n"""
      }
    }
    sb ++= "}\n"
    sb.toString
  }

  /** Apply the timestamp-expansion `replacements` map (table → column →
    * expanded columns) the CSV normalizer produces, so downstream modeling
    * sees the expanded integer columns — the reference splices the same map
    * into its ERD (reference: final/sqlite_to_csv.py:92-98,
    * final/erd_text.py:36-41).
    */
  def withReplacements(repl: Map[String, Map[String, Seq[String]]]): RelationalCatalog =
    RelationalCatalog(tables.map { t =>
      repl.get(t.name) match {
        case None => t
        case Some(cols) =>
          t.copy(columns = t.columns.flatMap { c =>
            cols.get(c.name) match {
              case None => Seq(c)
              case Some(expanded) => expanded.map(e => ColumnDef(e, "INT"))
            }
          })
      }
    })
}
