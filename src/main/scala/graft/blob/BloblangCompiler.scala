package graft.blob

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bloblang → Catalyst translator: the statically-typed subset of the text
  * language compiles to native Column expressions (whole-stage codegen, no
  * UDF), with the interpreter (`Bloblang.procStage`) as the general
  * fallback. Same program text, two execution paths — equivalence is
  * pinned by BloblangCompilerSpec and by `q_bloblang`/`q_bloblang_compiled`
  * sharing one DuckDB oracle.
  *
  * Translatable subset (bail → None, caller falls back to the interpreter):
  *  - statements: `root.<path> = <expr>` — including NESTED paths
  *    (`root.a.b = …` builds a struct column `a` from all its leaf
  *    assignments, declaration-ordered, last-write-wins) — and `let`
  *    bindings (inlined);
  *  - exprs: literals, input-column paths (typed from the DataFrame
  *    schema; a path of ANY Spark type compiles as an opaque pass-through
  *    copy — `root.article = this.article` works for structs/arrays,
  *    though no operator or method may touch the opaque value),
  *    arithmetic/comparison/boolean operators, if/else chains (if WITHOUT
  *    else compiles too: the interpreter omits the field, the columnar
  *    shape is null — equivalent under JSON-path reads, which is the
  *    compare contract), match with literal or predicate cases (default
  *    optional, same omission-to-null mapping), `env()` resolved at
  *    compile time;
  *  - methods with exact Column twins: uppercase, lowercase, trim(),
  *    length, contains, has_prefix/has_suffix, split, join, replace_all,
  *    re_replace_all, re_match, slice (non-negative literal bounds),
  *    string() (long/bool only — double formatting differs), abs, floor,
  *    ceil, round (compiled as floor(x+0.5) to match the interpreter's
  *    math.round — half-up-toward-+inf, NOT Spark round()'s
  *    half-away-from-zero, which differs at negative .5), number() on
  *    numeric targets (identity) and on strings (cast to double; with a
  *    fallback arg the cast-null coalesces to it, mirroring the
  *    interpreter's parse-failure fallback).
  *
  * Deliberate non-goals (always interpreted): error-flow (`catch`/`or`/
  * pipe — Catalyst nulls are not Bloblang errors), doc-structural ops
  * (root =, map_each, apply), meta writes. Documented deltas inside the
  * subset: `&&`/`||` compile but Catalyst three-valued logic treats a
  * NULL operand as NULL where the interpreter raises; `number()` on an
  * unparseable string with NO fallback yields null where the interpreter
  * raises, and always produces double where the interpreter keeps
  * integral strings as longs — callers needing those exact error/type
  * semantics keep the interpreter.
  */
object BloblangCompiler {
  import Bloblang._

  private sealed trait BT
  private case object TStrT extends BT
  private case object TLongT extends BT
  private case object TDoubleT extends BT
  private case object TBoolT extends BT
  private case object TArrStrT extends BT
  // opaque pass-through: any Spark type copied whole (structs, arrays,
  // maps, timestamps). Assignable, never operated on.
  private case object TAnyT extends BT
  private final case class Typed(col: Column, t: BT)

  private final class Bail extends RuntimeException
  private def bail(): Nothing = throw new Bail

  /** Compile a program to (outputName, Column) pairs over `schema`, or
    * None when any statement falls outside the subset.
    */
  def tryCompile(
      program: String,
      schema: StructType,
      env: Map[String, String] = Map.empty): Option[Vector[(String, Column)]] = {
    try {
      val stmts = Bloblang.parseStmts(program)
      var vars = Map.empty[String, Typed]
      val assigns = Vector.newBuilder[(Vector[String], Column)]
      stmts.foreach {
        case LetStmt(name, e, _) => vars = vars + (name -> cExpr(e, schema, vars, env))
        case Assign(path, e, _) if path.nonEmpty =>
          assigns += path -> cExpr(e, schema, vars, env).col
        case _ => bail()
      }
      val all = assigns.result()
      if (all.isEmpty) None
      else {
        // nested paths build struct columns: group leaf assignments under
        // their top-level name (first-assignment order), last write wins
        val order = all.map(_._1.head).distinct
        Some(order.map { top =>
          top -> buildNode(all.collect { case (p, c) if p.head == top => (p.tail.toList, c) })
        })
      }
    } catch {
      case _: Bail => None
      case _: BloblangError => None
    }
  }

  /** df → df plus the program's root fields as native columns. ONE select
    * against the original frame — not a withColumn chain — so an assigned
    * name that collides with an input column replaces it in the output
    * while every OTHER compiled expression still reads the original input
    * (the interpreter's `this` is always the input doc, never the
    * partially-built root).
    */
  def stage(program: String, schema: StructType,
      env: Map[String, String] = Map.empty): Option[org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame] =
    tryCompile(program, schema, env).map { cols => df =>
      val assigned = cols.map(_._1).toSet
      val kept = df.schema.fieldNames.filterNot(assigned).map(col(_))
      df.select(kept ++ cols.map { case (n, c) => c.as(n) }: _*)
    }

  /** One node of the nested-assignment tree: a leaf is the (last) column
    * assigned at this exact path; an interior node is a struct of its
    * children in first-assignment order. Mixing a value and children at
    * one path (`root.a = 1` + `root.a.b = 2`) bails — the interpreter
    * resolves that dynamically (gabs-style overwrite), a static struct
    * column cannot.
    */
  private def buildNode(items: Seq[(List[String], Column)]): Column = {
    val (leaves, nested) = items.partition(_._1.isEmpty)
    if (leaves.nonEmpty && nested.nonEmpty) bail()
    if (nested.isEmpty) leaves.last._2
    else {
      val order = nested.map(_._1.head).distinct
      struct(order.map { k =>
        buildNode(nested.collect { case (p, c) if p.head == k => (p.tail, c) }).as(k)
      }: _*)
    }
  }

  private def fieldType(dt: DataType): BT = dt match {
    case StringType => TStrT
    case LongType | IntegerType | ShortType | ByteType => TLongT
    case DoubleType | FloatType => TDoubleT
    case BooleanType => TBoolT
    case _ => TAnyT // opaque pass-through copy
  }

  private def pathOf(e: Expr): Option[Vector[String]] = e match {
    case NameRef(n) => Some(Vector(n))
    case FieldGet(t, n) => pathOf(t).map(_ :+ n)
    case ThisRef => Some(Vector.empty)
    case _ => None
  }

  private def cExpr(
      e: Expr,
      schema: StructType,
      vars: Map[String, Typed],
      env: Map[String, String]): Typed = {
    def c(x: Expr): Typed = cExpr(x, schema, vars, env)
    e match {
      case Lit(s: String) => Typed(lit(s), TStrT)
      case Lit(l: Long) => Typed(lit(l), TLongT)
      case Lit(d: Double) => Typed(lit(d), TDoubleT)
      case Lit(b: Boolean) => Typed(lit(b), TBoolT)
      case VarRef(n) => vars.getOrElse(n, bail())
      case NameRef(n) if vars.contains(n) => vars(n)
      case p @ (NameRef(_) | FieldGet(_, _)) =>
        val segs = pathOf(p).getOrElse(bail())
        if (segs.isEmpty) bail()
        // resolve the (possibly nested) field type from the schema
        var dt: DataType = StructType(schema.fields)
        segs.foreach { s =>
          dt match {
            case st: StructType =>
              val f = st.fields.find(_.name == s).getOrElse(bail())
              dt = f.dataType
            case _ => bail()
          }
        }
        // backtick each segment: names like `30d` would otherwise parse
        // as something else entirely (track_benthos_downloads.yaml shape)
        Typed(col(segs.map(s => s"`$s`").mkString(".")), fieldType(dt))
      case FuncCall("env", Vector(Lit(name: String))) =>
        Typed(env.get(name).orElse(sys.env.get(name))
          .map(lit).getOrElse(lit(null).cast(StringType)), TStrT)
      case UnOp("!", x) =>
        val t = c(x); if (t.t != TBoolT) bail(); Typed(!t.col, TBoolT)
      case UnOp("-", x) =>
        val t = c(x)
        t.t match {
          case TLongT | TDoubleT => Typed(negate(t.col), t.t)
          case _ => bail()
        }
      case BinOp(op, le, re) => cBin(op, c(le), c(re))
      case IfExpr(branches, els) =>
        val cs = branches.map { case (cond, res) => (c(cond), c(res)) }
        if (cs.exists(_._1.t != TBoolT)) bail()
        // if WITHOUT else: the interpreter omits the field (Nothing); the
        // columnar mapping is null — equivalent under JSON-path reads
        val e0 = els.map(c)
        val rt = joinTypes((cs.map(_._2.t) ++ e0.map(_.t)): _*)
        val tail = e0.map(_.col).getOrElse(lit(null))
        val chain = cs.foldRight(tail) { case ((cond, res), acc) =>
          when(cond.col, res.col).otherwise(acc)
        }
        Typed(chain, rt)
      case MatchExpr(target, cases) if cases.nonEmpty =>
        val tcol = target.map(c)
        val hasDefault = cases.last._1.isEmpty
        // no default: unmatched = omission = null (same mapping as
        // if-without-else)
        val dflt = if (hasDefault) Some(c(cases.last._2)) else None
        val body = if (hasDefault) cases.init else cases
        if (body.exists(_._1.isEmpty)) bail() // `_` only as the final default
        val built = body.map {
          case (Some(condE), resE) =>
            val cond = (tcol, condE) match {
              // literal case against a target = equality
              case (Some(t), Lit(_)) =>
                val l = c(condE)
                if (l.t != t.t && !numPair(l.t, t.t)) bail()
                t.col === l.col
              // predicate case with no target = plain boolean expr
              case (None, _) =>
                val p = c(condE); if (p.t != TBoolT) bail(); p.col
              case _ => bail() // predicate-vs-target needs `this` rebinding
            }
            (cond, c(resE))
          case _ => bail()
        }
        val rt = joinTypes((built.map(_._2.t) ++ dflt.map(_.t)): _*)
        Typed(built.foldRight(dflt.map(_.col).getOrElse(lit(null))) {
          case ((cond, res), acc) => when(cond, res.col).otherwise(acc)
        }, rt)
      case MethodCall(t, name, args) => cMethod(c(t), name, args.map(c), args)
      case _ => bail()
    }
  }

  private def numPair(a: BT, b: BT): Boolean =
    (a == TLongT || a == TDoubleT) && (b == TLongT || b == TDoubleT)

  private def joinTypes(ts: BT*): BT = {
    val d = ts.distinct
    if (d.isEmpty || d.contains(TAnyT)) bail()
    else if (d.length == 1) d.head
    else if (d.forall(t => t == TLongT || t == TDoubleT)) TDoubleT
    else bail()
  }

  private def cBin(op: String, l: Typed, r: Typed): Typed = op match {
    case "+" =>
      if (l.t == TStrT || r.t == TStrT) {
        // interpreter coerces via goString: exact for strings/longs/bools,
        // doubles format differently (6 vs 6.0) → bail
        def s(x: Typed): Column = x.t match {
          case TStrT => x.col
          case TLongT | TBoolT => x.col.cast(StringType)
          case _ => bail()
        }
        Typed(concat(s(l), s(r)), TStrT)
      } else if (numPair(l.t, r.t)) Typed(l.col + r.col, joinTypes(l.t, r.t))
      else bail()
    case "-" if numPair(l.t, r.t) => Typed(l.col - r.col, joinTypes(l.t, r.t))
    case "*" if numPair(l.t, r.t) => Typed(l.col * r.col, joinTypes(l.t, r.t))
    case "/" if numPair(l.t, r.t) =>
      Typed(l.col.cast(DoubleType) / r.col.cast(DoubleType), TDoubleT)
    case "%" if l.t == TLongT && r.t == TLongT => Typed(l.col % r.col, TLongT)
    case "==" => Typed(cmpSafe(l, r)(_ === _), TBoolT)
    case "!=" => Typed(cmpSafe(l, r)(_ =!= _), TBoolT)
    case "<" => Typed(cmpSafe(l, r)(_ < _), TBoolT)
    case ">" => Typed(cmpSafe(l, r)(_ > _), TBoolT)
    case "<=" => Typed(cmpSafe(l, r)(_ <= _), TBoolT)
    case ">=" => Typed(cmpSafe(l, r)(_ >= _), TBoolT)
    case "&&" if l.t == TBoolT && r.t == TBoolT => Typed(l.col && r.col, TBoolT)
    case "||" if l.t == TBoolT && r.t == TBoolT => Typed(l.col || r.col, TBoolT)
    case _ => bail() // `|` pipe is error-flow — interpreter only
  }

  private def cmpSafe(l: Typed, r: Typed)(f: (Column, Column) => Column): Column = {
    if (l.t == TAnyT || r.t == TAnyT) bail() // opaque values: assignment only
    if (l.t != r.t && !numPair(l.t, r.t)) bail()
    f(l.col, r.col)
  }

  private def cMethod(t: Typed, name: String, args: Vector[Typed], raw: Vector[Expr]): Typed =
    (name, t.t) match {
      case ("uppercase", TStrT) => Typed(upper(t.col), TStrT)
      case ("lowercase", TStrT) => Typed(lower(t.col), TStrT)
      case ("trim", TStrT) if args.isEmpty => Typed(trim(t.col), TStrT)
      case ("length", TStrT) => Typed(length(t.col).cast(LongType), TLongT)
      case ("length", TArrStrT) => Typed(size(t.col).cast(LongType), TLongT)
      case ("contains", TStrT) =>
        if (args.length != 1 || args(0).t != TStrT) bail()
        Typed(t.col.contains(args(0).col), TBoolT)
      case ("contains", TArrStrT) =>
        if (args.length != 1 || args(0).t != TStrT) bail()
        Typed(array_contains(t.col, args(0).col), TBoolT)
      case ("has_prefix", TStrT) =>
        // arg must be string-typed: a double arg would be implicitly cast by
        // Catalyst ("1.5E7") but goString-formatted by the interpreter
        // ("15000000") — same divergence `contains` guards against
        if (args.length != 1 || args(0).t != TStrT) bail()
        Typed(t.col.startsWith(args(0).col), TBoolT)
      case ("has_suffix", TStrT) =>
        if (args.length != 1 || args(0).t != TStrT) bail()
        Typed(t.col.endsWith(args(0).col), TBoolT)
      case ("split", TStrT) =>
        raw(0) match {
          // Go strings.Split keeps trailing empties → limit -1
          case Lit(sep: String) =>
            Typed(split(t.col, java.util.regex.Pattern.quote(sep), -1), TArrStrT)
          case _ => bail()
        }
      case ("join", TArrStrT) =>
        raw.headOption match {
          case Some(Lit(sep: String)) => Typed(array_join(t.col, sep), TStrT)
          case None => Typed(array_join(t.col, ""), TStrT)
          case _ => bail()
        }
      case ("replace_all", TStrT) =>
        (raw(0), raw(1)) match {
          case (Lit(a: String), Lit(b: String)) =>
            Typed(regexp_replace(t.col, java.util.regex.Pattern.quote(a),
              java.util.regex.Matcher.quoteReplacement(b)), TStrT)
          case _ => bail()
        }
      case ("re_replace_all", TStrT) =>
        (raw(0), raw(1)) match {
          // both paths are Java regex (the interpreter uses
          // Pattern/Matcher.replaceAll), so patterns and $N backrefs agree
          case (Lit(p: String), Lit(r: String)) =>
            Typed(regexp_replace(t.col, p, r), TStrT)
          case _ => bail()
        }
      case ("re_match", TStrT) =>
        raw(0) match {
          case Lit(p: String) => Typed(t.col.rlike(p), TBoolT)
          case _ => bail()
        }
      case ("slice", TStrT) =>
        (raw.lift(0), raw.lift(1)) match {
          case (Some(Lit(a: Long)), Some(Lit(b: Long))) if a >= 0 && b >= a =>
            Typed(substring(t.col, a.toInt + 1, (b - a).toInt), TStrT)
          case _ => bail()
        }
      case ("string", TLongT) => Typed(t.col.cast(StringType), TStrT)
      case ("string", TBoolT) => Typed(t.col.cast(StringType), TStrT)
      case ("string", TStrT) => t
      case ("abs", TLongT) => Typed(abs(t.col), TLongT)
      case ("abs", TDoubleT) => Typed(abs(t.col), TDoubleT)
      case ("floor", TDoubleT) => Typed(floor(t.col), TLongT)
      case ("floor", TLongT) => t
      case ("ceil", TDoubleT) => Typed(ceil(t.col), TLongT)
      case ("ceil", TLongT) => t
      // the interpreter is scala math.round = floor(x + 0.5), half-up
      // TOWARD +INF; Spark round() is half-away-from-zero, which differs
      // at negative .5 (round(-2.5): -2 vs -3) — so compile the exact form
      case ("round", TDoubleT) => Typed(floor(t.col + lit(0.5)), TLongT)
      case ("round", TLongT) => t
      // number(): identity on numerics; strings cast to double (the
      // interpreter keeps integral strings as longs and RAISES on parse
      // failure — documented deltas; a fallback arg coalesces the
      // cast-null exactly like the interpreter's parse-failure fallback)
      case ("number", TLongT | TDoubleT) => t
      case ("number", TStrT) =>
        val base = t.col.try_cast(DoubleType) // ANSI cast would throw
        args.headOption match {
          case None => Typed(base, TDoubleT)
          case Some(f) if f.t == TLongT || f.t == TDoubleT =>
            Typed(coalesce(base, f.col.cast(DoubleType)), TDoubleT)
          case _ => bail()
        }
      case _ => bail()
    }
}
