package graft.dialect

import Lexer._

/** Recursive-descent parser for the WarpDB dialect, mirroring the grammar of
  * `/root/reference/src/expression.cpp`:
  *
  *   expression  := or
  *   or          := and (OR and)*                        (:169-177)
  *   and         := comparison (AND comparison)*         (:179-190)
  *   comparison  := addsub ((> < >= <= == != =) addsub)* (:144-167)
  *   addsub      := muldiv ((+|-) muldiv)*               (:192-203)
  *   muldiv      := factor ((*|/) factor)*               (:205-208 region)
  *   factor      := number | ident | ident(args) | AGG(expr)[OVER(...)] | (expression)
  *                                                       (:205-235, :296-337)
  *   query       := SELECT [DISTINCT] item (, item)* FROM ident
  *                  (JOIN ident ON expression)*          (:375-401)
  *                  [WHERE expression]
  *                  [GROUP BY expression (, expression)*] (:417-443)
  *                  [HAVING expression]
  *                  [ORDER BY expression [ASC|DESC]]     (:474-495)
  *                  [LIMIT n] [OFFSET n]                 (:497-522)
  *
  * Deviations (all widenings, per SURVEY.md §7.1):
  *  - both `LIMIT..OFFSET` and `OFFSET..LIMIT` orders are accepted (the
  *    reference's own test `tests/sql_features_test.cpp:33` uses the order
  *    its parser rejects); semantics are always offset-then-limit.
  *  - `item AS alias` names output columns.
  *  - `COUNT(*)` is accepted (maps to COUNT of a constant).
  *  - `OVER (PARTITION BY ... ORDER BY ...)` is retained, not discarded.
  */
object Parser {
  def parseExpression(src: String): Expr = {
    val p = new Parser(tokenize(src))
    val e = p.expression()
    p.expectEof()
    e
  }

  def parseQuery(src: String): Query = {
    val p = new Parser(tokenize(src))
    val q = p.query()
    p.expectEof()
    q
  }
}

final class Parser(toks: Vector[Lexer.Token]) {
  import Lexer._
  private var pos = 0
  private def cur: Token = toks(pos)
  private def advance(): Token = { val t = cur; pos += 1; t }
  private def fail(msg: String): Nothing =
    throw DialectParseException(msg, cur.line, cur.col)
  private def expect(kind: TokKind, what: String): Token =
    if (cur.kind == kind) advance() else fail(s"Expected $what, got '${cur.value}'")
  private def acceptKw(kw: String): Boolean =
    if (cur.isKw(kw)) { pos += 1; true } else false
  private def expectKw(kw: String): Unit =
    if (!acceptKw(kw)) fail(s"Expected $kw, got '${cur.value}'")
  def expectEof(): Unit =
    if (cur.kind != TEof) fail(s"Unexpected token: '${cur.value}'")

  // ---- expressions ----------------------------------------------------
  def expression(): Expr = orExpr()

  private def orExpr(): Expr = {
    var e = andExpr()
    while (acceptKw("OR")) e = BinOp("OR", e, andExpr())
    e
  }

  private def andExpr(): Expr = {
    var e = cmpExpr()
    while (acceptKw("AND")) e = BinOp("AND", e, cmpExpr())
    e
  }

  private val cmpOps = Set(">", "<", ">=", "<=", "==", "!=", "=")
  private def cmpExpr(): Expr = {
    var e = addSub()
    while (cur.kind == TOp && cmpOps(cur.value)) {
      val op = advance().value
      e = BinOp(if (op == "=") "==" else op, e, addSub())
    }
    e
  }

  private def addSub(): Expr = {
    var e = mulDiv()
    while (cur.kind == TOp && (cur.value == "+" || cur.value == "-")) {
      val op = advance().value
      e = BinOp(op, e, mulDiv())
    }
    e
  }

  private def mulDiv(): Expr = {
    var e = factor()
    while (cur.kind == TOp && (cur.value == "*" || cur.value == "/")) {
      val op = advance().value
      e = BinOp(op, e, factor())
    }
    e
  }

  private def factor(): Expr = cur.kind match {
    case TNum => NumLit(advance().value)
    case TLParen =>
      advance()
      val e = expression()
      expect(TRParen, ")")
      e
    case TIdent =>
      val name = advance().value
      AggFn.all.get(name.toUpperCase) match {
        case Some(fn) if cur.kind == TLParen =>
          advance()
          // COUNT(*) extension: count of a constant
          val arg =
            if (fn == AggFn.Count && cur.kind == TOp && cur.value == "*") {
              advance(); NumLit("1")
            } else expression()
          expect(TRParen, ")")
          maybeOver(fn, arg)
        case _ if cur.kind == TLParen =>
          advance()
          val args = Vector.newBuilder[Expr]
          if (cur.kind != TRParen) {
            args += expression()
            while (cur.kind == TComma) { advance(); args += expression() }
          }
          expect(TRParen, ")")
          FuncCall(name, args.result())
        case _ =>
          if (keywords.contains(name.toUpperCase))
            fail(s"Unexpected keyword: '$name'")
          ColRef(name)
      }
    case _ => fail(s"Unexpected token: '${cur.value}'")
  }

  /** `OVER (PARTITION BY e, ... [ORDER BY e [ASC|DESC], ...])` — the
    * reference reserves OVER/PARTITION (`src/expression.cpp:58-62`) and
    * builds a WindowFunctionNode (`src/expression.cpp:301-327`); we keep the
    * clauses it drops. */
  private def maybeOver(fn: AggFn, arg: Expr): Expr =
    if (acceptKw("OVER")) {
      expect(TLParen, "(")
      var partition = Vector.empty[Expr]
      var order = Vector.empty[SortItem]
      if (acceptKw("PARTITION")) {
        expectKw("BY")
        partition :+= expression()
        while (cur.kind == TComma) { advance(); partition :+= expression() }
      }
      if (acceptKw("ORDER")) {
        expectKw("BY")
        def item(): SortItem = {
          val e = expression()
          val asc = if (acceptKw("DESC")) false else { acceptKw("ASC"); true }
          SortItem(e, asc)
        }
        order :+= item()
        while (cur.kind == TComma) { advance(); order :+= item() }
      }
      expect(TRParen, ")")
      WindowAgg(fn, arg, partition, order)
    } else Agg(fn, arg)

  // ---- query ----------------------------------------------------------
  def query(): Query = {
    expectKw("SELECT")
    val distinct = acceptKw("DISTINCT")
    def selectItem(): SelectItem = {
      val e = expression()
      val alias =
        if (acceptKw("AS")) Some(expect(TIdent, "alias").value) else None
      SelectItem(e, alias)
    }
    var items = Vector(selectItem())
    while (cur.kind == TComma) { advance(); items :+= selectItem() }
    expectKw("FROM")
    val from = expect(TIdent, "table name").value
    var joins = Vector.empty[JoinClause]
    while (acceptKw("JOIN")) {
      val t = expect(TIdent, "table name").value
      expectKw("ON")
      joins :+= JoinClause(t, expression())
    }
    val where = if (acceptKw("WHERE")) Some(expression()) else None
    var groupBy = Vector.empty[Expr]
    if (acceptKw("GROUP")) {
      expectKw("BY")
      groupBy :+= expression()
      while (cur.kind == TComma) { advance(); groupBy :+= expression() }
    }
    val having = if (acceptKw("HAVING")) Some(expression()) else None
    val orderBy = if (acceptKw("ORDER")) {
      expectKw("BY")
      val e = expression()
      val asc = if (acceptKw("DESC")) false else { acceptKw("ASC"); true }
      Some(SortItem(e, asc))
    } else None
    // LIMIT/OFFSET in either order (SURVEY.md §2.6 grammar-order quirk)
    def intValue(what: String): Int = {
      val tok = cur
      val t = expect(TNum, "integer").value
      if (t.contains('.'))
        throw DialectParseException(s"$what must be an integer, got '$t'",
          tok.line, tok.col)
      val v = t.toLong
      if (v > Int.MaxValue)
        throw DialectParseException(s"$what out of range: $t", tok.line, tok.col)
      v.toInt
    }
    var limit: Option[Int] = None
    var offset: Option[Int] = None
    var progressed = true
    while (progressed) {
      progressed = false
      if (limit.isEmpty && acceptKw("LIMIT")) {
        limit = Some(intValue("LIMIT")); progressed = true
      }
      if (offset.isEmpty && acceptKw("OFFSET")) {
        offset = Some(intValue("OFFSET")); progressed = true
      }
    }
    Query(distinct, items, from, joins, where, groupBy, having, orderBy,
      limit, offset)
  }
}
