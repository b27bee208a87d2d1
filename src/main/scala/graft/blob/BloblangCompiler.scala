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
  *  - statements: `root.<name> = <expr>` and `let` bindings (inlined);
  *  - exprs: literals, input-column paths (typed from the DataFrame
  *    schema), arithmetic/comparison/boolean operators, if/else chains,
  *    match with literal or predicate cases + a default, `env()` resolved
  *    at compile time;
  *  - methods with exact Column twins: uppercase, lowercase, trim(),
  *    length, contains, has_prefix/has_suffix, split, join, replace_all,
  *    re_replace_all, re_match, slice (non-negative literal bounds),
  *    string() (long/bool only — double formatting differs), abs, floor,
  *    ceil.
  *
  * Deliberate non-goals (always interpreted): error-flow (`catch`/`or`/
  * pipe — Catalyst nulls are not Bloblang errors), Nothing-producing
  * forms (if-without-else, match-without-default: field omission has no
  * columnar shape), doc-structural ops (root =, nested paths, map_each,
  * apply), meta writes, and number()/round() (parse/rounding semantics
  * differ). `&&`/`||` compile, but Catalyst three-valued logic treats a
  * NULL operand as NULL where the interpreter raises — callers compiling
  * programs over nullable boolean columns should keep the interpreter.
  */
object BloblangCompiler {
  import Bloblang._

  private sealed trait BT
  private case object TStrT extends BT
  private case object TLongT extends BT
  private case object TDoubleT extends BT
  private case object TBoolT extends BT
  private case object TArrStrT extends BT
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
      val out = Vector.newBuilder[(String, Column)]
      stmts.foreach {
        case LetStmt(name, e, _) => vars = vars + (name -> cExpr(e, schema, vars, env))
        case Assign(path, e, _) if path.length == 1 =>
          // assigned names must not shadow input columns: the interpreter's
          // root is a separate document, withColumn would overwrite
          if (schema.fieldNames.contains(path.head)) bail()
          out += path.head -> cExpr(e, schema, vars, env).col
        case _ => bail()
      }
      val r = out.result()
      if (r.isEmpty) None else Some(r)
    } catch {
      case _: Bail => None
      case _: BloblangError => None
    }
  }

  /** df → df plus the program's root fields as native columns. */
  def stage(program: String, schema: StructType,
      env: Map[String, String] = Map.empty): Option[org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame] =
    tryCompile(program, schema, env).map { cols => df =>
      cols.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
    }

  private def fieldType(dt: DataType): BT = dt match {
    case StringType => TStrT
    case LongType | IntegerType | ShortType | ByteType => TLongT
    case DoubleType | FloatType => TDoubleT
    case BooleanType => TBoolT
    case _ => bail()
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
        Typed(col(segs.mkString(".")), fieldType(dt))
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
      case IfExpr(branches, Some(els)) =>
        val cs = branches.map { case (cond, res) => (c(cond), c(res)) }
        val e0 = c(els)
        if (cs.exists(_._1.t != TBoolT)) bail()
        val rt = joinTypes((cs.map(_._2.t) :+ e0.t): _*)
        val chain = cs.foldRight(e0.col) { case ((cond, res), acc) =>
          when(cond.col, res.col).otherwise(acc)
        }
        Typed(chain, rt)
      case MatchExpr(target, cases) if cases.nonEmpty && cases.last._1.isEmpty =>
        val tcol = target.map(c)
        val dflt = c(cases.last._2)
        val body = cases.init
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
        val rt = joinTypes((built.map(_._2.t) :+ dflt.t): _*)
        Typed(built.foldRight(dflt.col) { case ((cond, res), acc) =>
          when(cond, res.col).otherwise(acc)
        }, rt)
      case MethodCall(t, name, args) => cMethod(c(t), name, args.map(c), args)
      case _ => bail()
    }
  }

  private def numPair(a: BT, b: BT): Boolean =
    (a == TLongT || a == TDoubleT) && (b == TLongT || b == TDoubleT)

  private def joinTypes(ts: BT*): BT = {
    val d = ts.distinct
    if (d.length == 1) d.head
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
      case _ => bail()
    }
}
