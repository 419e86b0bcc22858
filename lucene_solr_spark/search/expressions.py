"""Lucene `expressions` module — the JavaScript-like scoring-expression
compiler re-expressed as a compiler to Catalyst Columns.

References (semantics only):
- `lucene/expressions/src/java/org/apache/lucene/expressions/js/
  JavascriptCompiler.java:87` — compiles a JS-like arithmetic string
  into an `Expression` over named variables. Everything is a double;
  comparison/logical operators yield 1.0/0.0 and treat any non-zero as
  true; bitwise/shift operators cast through long (`Javascript.g4`,
  `JavascriptParser.java`).
- `JavascriptCompiler.java:560` (DEFAULT_FUNCTIONS) — the builtin
  function table: abs acos acosh asin asinh atan atanh atan2 ceil cos
  cosh exp floor haversin ln log10 logn max min pow sin sinh sqrt tan
  tanh. `haversin` is SloppyMath.haversinMeters (mean earth radius
  6371008.7714037696 m).
- `expressions/Expression.java:47` / `ExpressionValueSource.java` —
  a compiled expression binds variables (`_score`, docvalue fields)
  through Bindings and becomes a DoubleValuesSource usable for sorting
  (`Expression#getSortField`) and FunctionScoreQuery rescoring.

Spark shape: a compiled expression IS a Catalyst Column tree — parsing
happens once on the driver, evaluation runs entirely in whole-stage
codegen with zero Python per row. `_score` binds to the kernel's score
column; every other variable binds to a docvalue column of the provided
docs frame (SimpleBindings.add(SortField) analog). No shuffle is added
by expression evaluation itself; `expression_sort` ends in the same
TakeOrderedAndProject as any top-k.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import Column, DataFrame, functions as F

# SloppyMath.EARTH_MEAN_RADIUS (haversinMeters)
_EARTH_R = 6371008.7714037696

# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RX = re.compile(r"""
    (?P<num>0[xX][0-9a-fA-F]+|\d+\.\d*(?:[eE][+-]?\d+)?
           |\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?)
  | (?P<name>[A-Za-z_][A-Za-z0-9_.]*)
  | (?P<op><<|>>>|>>|<=|>=|==|!=|&&|\|\||[-+*/%(),?:!~<>&|^])
  | (?P<ws>\s+)
""", re.VERBOSE)


def _tokenize(src: str) -> list:
    out, i = [], 0
    while i < len(src):
        m = _TOKEN_RX.match(src, i)
        if not m:
            raise ValueError(f"unexpected character {src[i]!r} at {i} "
                             f"in expression: {src!r}")
        i = m.end()
        if m.lastgroup == "ws":
            continue
        if m.lastgroup == "num":
            t = m.group()
            out.append(("num", float(int(t, 16)) if t[:2].lower() == "0x"
                        else float(t)))
        else:
            out.append((m.lastgroup, m.group()))
    out.append(("eof", ""))
    return out


# ---------------------------------------------------------------------------
# AST (tuples: ("num", v) | ("var", name) | ("call", fn, [args])
#             | ("un", op, a) | ("bin", op, a, b) | ("tern", c, a, b))
# ---------------------------------------------------------------------------

class _Parser:
    """Recursive-descent over the Javascript.g4 precedence ladder:
    ternary < || < && < | < ^ < & < equality < relational < shift <
    additive < multiplicative < unary < primary."""

    def __init__(self, tokens):
        self.toks, self.pos = tokens, 0

    def peek(self):
        return self.toks[self.pos]

    def take(self, want=None):
        k, v = self.toks[self.pos]
        if want is not None and v != want:
            raise ValueError(f"expected {want!r}, found {v or k!r}")
        self.pos += 1
        return k, v

    def parse(self):
        node = self.ternary()
        if self.peek()[0] != "eof":
            raise ValueError(f"trailing input at token {self.peek()[1]!r}")
        return node

    def ternary(self):
        cond = self.binary(0)
        if self.peek() == ("op", "?"):
            self.take()
            a = self.ternary()
            self.take(":")
            b = self.ternary()          # right-associative
            return ("tern", cond, a, b)
        return cond

    _LEVELS = (("||",), ("&&",), ("|",), ("^",), ("&",),
               ("==", "!="), ("<", "<=", ">", ">="),
               ("<<", ">>", ">>>"), ("+", "-"), ("*", "/", "%"))

    def binary(self, lvl):
        if lvl == len(self._LEVELS):
            return self.unary()
        node = self.binary(lvl + 1)
        while self.peek()[0] == "op" and self.peek()[1] in self._LEVELS[lvl]:
            _, op = self.take()
            node = ("bin", op, node, self.binary(lvl + 1))
        return node

    def unary(self):
        k, v = self.peek()
        if k == "op" and v in ("-", "+", "!", "~"):
            self.take()
            a = self.unary()
            return a if v == "+" else ("un", v, a)
        return self.primary()

    def primary(self):
        k, v = self.take()
        if k == "num":
            return ("num", v)
        if k == "name":
            if self.peek() == ("op", "("):
                self.take()
                args = []
                if self.peek() != ("op", ")"):
                    args.append(self.ternary())
                    while self.peek() == ("op", ","):
                        self.take()
                        args.append(self.ternary())
                self.take(")")
                return ("call", v, args)
            return ("var", v)
        if (k, v) == ("op", "("):
            node = self.ternary()
            self.take(")")
            return node
        raise ValueError(f"unexpected token {v or k!r}")


# ---------------------------------------------------------------------------
# builtin functions — (arity, Column impl, python impl)
# ---------------------------------------------------------------------------

def _haversin_col(lat1, lon1, lat2, lon2):
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = (F.sin(dlat) * F.sin(dlat)
         + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) * F.sin(dlon))
    return F.lit(2.0 * _EARTH_R) * F.asin(F.sqrt(a))


def _haversin_py(lat1, lon1, lat2, lon2):
    dlat = math.radians(lat2 - lat1) / 2
    dlon = math.radians(lon2 - lon1) / 2
    a = (math.sin(dlat) ** 2 + math.cos(math.radians(lat1))
         * math.cos(math.radians(lat2)) * math.sin(dlon) ** 2)
    return 2.0 * _EARTH_R * math.asin(math.sqrt(a))


FUNCTIONS = {
    # name: (arity, column_fn, python_fn)
    "abs": (1, F.abs, abs),
    "acos": (1, F.acos, math.acos),
    "acosh": (1, lambda x: F.log(x + F.sqrt(x * x - 1)), math.acosh),
    "asin": (1, F.asin, math.asin),
    "asinh": (1, lambda x: F.log(x + F.sqrt(x * x + 1)), math.asinh),
    "atan": (1, F.atan, math.atan),
    "atanh": (1, lambda x: F.log((1 + x) / (1 - x)) / 2, math.atanh),
    "atan2": (2, F.atan2, math.atan2),
    "ceil": (1, lambda x: F.ceil(x).cast("double"), math.ceil),
    "cos": (1, F.cos, math.cos),
    "cosh": (1, F.cosh, math.cosh),
    "exp": (1, F.exp, math.exp),
    "floor": (1, lambda x: F.floor(x).cast("double"), math.floor),
    "haversin": (4, _haversin_col, _haversin_py),
    "ln": (1, F.log, math.log),
    "log10": (1, F.log10, math.log10),
    "log2": (1, F.log2, math.log2),
    "logn": (2, lambda b, x: F.log(x) / F.log(b),
             lambda b, x: math.log(x) / math.log(b)),
    "max": (2, F.greatest, max),
    "min": (2, F.least, min),
    "pow": (2, F.pow, math.pow),
    "sin": (1, F.sin, math.sin),
    "sinh": (1, F.sinh, math.sinh),
    "sqrt": (1, F.sqrt, math.sqrt),
    "tan": (1, F.tan, math.tan),
    "tanh": (1, F.tanh, math.tanh),
}


# ---------------------------------------------------------------------------
# compiled expression
# ---------------------------------------------------------------------------

def _collect_vars(node, out):
    tag = node[0]
    if tag == "var":
        out.add(node[1])
    elif tag == "call":
        for a in node[2]:
            _collect_vars(a, out)
    elif tag == "un":
        _collect_vars(node[2], out)
    elif tag == "bin":
        _collect_vars(node[2], out)
        _collect_vars(node[3], out)
    elif tag == "tern":
        for a in node[1:]:
            _collect_vars(a, out)


def _b2d(c: Column) -> Column:
    return c.cast("double")


def _truthy(c: Column) -> Column:
    return c != F.lit(0.0)


_SHIFT_MASK = 0x3F   # Java long shifts use the low 6 bits of the count


def _to_column(node, bind) -> Column:
    tag = node[0]
    if tag == "num":
        return F.lit(node[1])
    if tag == "var":
        return bind[node[1]].cast("double")
    if tag == "call":
        _, fn, args = node
        cols = [_to_column(a, bind) for a in args]
        return FUNCTIONS[fn][1](*cols)
    if tag == "un":
        _, op, a = node
        c = _to_column(a, bind)
        if op == "-":
            return -c
        if op == "!":
            return _b2d(~_truthy(c))
        # ~ : long bitwise complement, back to double
        return F.bitwise_not(c.cast("long")).cast("double")
    if tag == "bin":
        _, op, l, r = node
        a, b = _to_column(l, bind), _to_column(r, bind)
        if op in ("+", "-", "*", "/", "%"):
            if op == "/":
                # Java double semantics: x/0 → ±Inf / NaN (Spark's
                # Divide yields NULL there)
                return (F.when(b == F.lit(0.0),
                               F.when(a > 0, F.lit(math.inf))
                               .when(a < 0, F.lit(-math.inf))
                               .otherwise(F.lit(math.nan)))
                        .otherwise(a / b))
            if op == "%":
                return (F.when(b == F.lit(0.0), F.lit(math.nan))
                        .otherwise(a % b))
            return {"+": a + b, "-": a - b, "*": a * b}[op]
        if op in ("<", "<=", ">", ">=", "==", "!="):
            return _b2d({"<": a < b, "<=": a <= b, ">": a > b,
                         ">=": a >= b, "==": a == b, "!=": a != b}[op])
        if op == "&&":
            return _b2d(_truthy(a) & _truthy(b))
        if op == "||":
            return _b2d(_truthy(a) | _truthy(b))
        al, bl = a.cast("long"), b.cast("long")
        if op == "&":
            return (al.bitwiseAND(bl)).cast("double")
        if op == "|":
            return (al.bitwiseOR(bl)).cast("double")
        if op == "^":
            return (al.bitwiseXOR(bl)).cast("double")
        cnt = bl.bitwiseAND(F.lit(_SHIFT_MASK)).cast("int")
        fn = {"<<": "shiftleft", ">>": "shiftright",
              ">>>": "shiftrightunsigned"}[op]
        return F.call_function(fn, al, cnt).cast("double")
    # ternary
    _, c, a, b = node
    return (F.when(_truthy(_to_column(c, bind)), _to_column(a, bind))
            .otherwise(_to_column(b, bind)))


def _eval_py(node, env) -> float:
    tag = node[0]
    if tag == "num":
        return node[1]
    if tag == "var":
        return float(env[node[1]])
    if tag == "call":
        _, fn, args = node
        return float(FUNCTIONS[fn][2](*(_eval_py(a, env) for a in args)))
    if tag == "un":
        _, op, a = node
        v = _eval_py(a, env)
        if op == "-":
            return -v
        if op == "!":
            return 0.0 if v != 0.0 else 1.0
        return float(~int(v))           # ~ : (long) complement
    if tag == "bin":
        _, op, l, r = node
        a, b = _eval_py(l, env), _eval_py(r, env)
        if op in ("+", "-", "*", "/", "%"):
            if op == "/":
                return (math.inf if a > 0 else -math.inf if a < 0
                        else math.nan) if b == 0 else a / b
            if op == "%":
                return math.nan if b == 0 else math.fmod(a, b)
            return {"+": a + b, "-": a - b, "*": a * b}[op]
        if op in ("<", "<=", ">", ">=", "==", "!="):
            return 1.0 if {"<": a < b, "<=": a <= b, ">": a > b,
                           ">=": a >= b, "==": a == b,
                           "!=": a != b}[op] else 0.0
        if op == "&&":
            return 1.0 if (a != 0.0 and b != 0.0) else 0.0
        if op == "||":
            return 1.0 if (a != 0.0 or b != 0.0) else 0.0

        def _l(x):                      # java (long) cast
            return int(x) & 0xFFFFFFFFFFFFFFFF

        def _s(x):                      # back to signed
            return x - (1 << 64) if x & (1 << 63) else x
        al, bl = _l(a), _l(b)
        cnt = bl & _SHIFT_MASK
        if op == "&":
            return float(_s(al & bl))
        if op == "|":
            return float(_s(al | bl))
        if op == "^":
            return float(_s(al ^ bl))
        if op == "<<":
            return float(_s((al << cnt) & 0xFFFFFFFFFFFFFFFF))
        if op == ">>":
            return float(_s(al) >> cnt)
        return float(al >> cnt)         # >>>
    _, c, a, b = node
    return (_eval_py(a, env) if _eval_py(c, env) != 0.0
            else _eval_py(b, env))


class Expression:
    """A compiled expression (JavascriptCompiler.compile analog).

    `variables` is the sorted set of free variable names;
    `to_column(bindings)` produces the Catalyst Column (bindings maps
    every variable to a Column — SimpleBindings); `evaluate(**vars)` is
    the driver-side double evaluation used for tests/explain."""

    def __init__(self, source: str, node):
        self.source, self._node = source, node
        vs: set = set()
        _collect_vars(node, vs)
        self.variables = tuple(sorted(vs))

    def to_column(self, bindings: dict) -> Column:
        missing = [v for v in self.variables if v not in bindings]
        if missing:
            raise KeyError(f"unbound expression variables: {missing} "
                           f"(have {sorted(bindings)})")
        bind = {k: (F.col(v) if isinstance(v, str) else v)
                for k, v in bindings.items()}
        return _to_column(self._node, bind)

    def evaluate(self, **env) -> float:
        return _eval_py(self._node, env)

    def __repr__(self):
        return f"Expression({self.source!r}, vars={self.variables})"


def compile_expression(source: str) -> Expression:
    """JavascriptCompiler.compile: parse once on the driver; validate
    function names/arity eagerly (the reference throws ParseException at
    compile time, not evaluation time)."""
    node = _Parser(_tokenize(source)).parse()

    def _check(n):
        if n[0] == "call":
            fn, args = n[1], n[2]
            if fn not in FUNCTIONS:
                raise ValueError(f"unknown function {fn!r} "
                                 f"(have {sorted(FUNCTIONS)})")
            if FUNCTIONS[fn][0] != len(args):
                raise ValueError(f"{fn} expects {FUNCTIONS[fn][0]} args, "
                                 f"got {len(args)}")
            for a in args:
                _check(a)
        elif n[0] == "un":
            _check(n[2])
        elif n[0] == "bin":
            _check(n[2])
            _check(n[3])
        elif n[0] == "tern":
            for a in n[1:]:
                _check(a)
    _check(node)
    return Expression(source, node)


# ---------------------------------------------------------------------------
# search surfaces
# ---------------------------------------------------------------------------

def expression_score(searcher, query, docs: DataFrame, source: str,
                     bindings: dict | None = None) -> DataFrame:
    """FunctionScoreQuery over a compiled expression → (doc_id, score).
    `_score` binds to the wrapped query's kernel score; every other
    variable binds to the docs column of the same name (overridable via
    `bindings`)."""
    expr = source if isinstance(source, Expression) else (
        compile_expression(source))
    hits = searcher.score_all(query, mode="f64")
    bind = {"_score": F.col("_qscore")}
    need = [v for v in expr.variables if v != "_score"]
    for v in need:
        bind[v] = F.col(v)
    if bindings:
        bind.update(bindings)
    side = (docs.select("doc_id", *need) if need
            else docs.select("doc_id"))
    joined = hits.withColumnRenamed("score", "_qscore").join(side, "doc_id")
    return joined.select("doc_id",
                         expr.to_column(bind).cast("double").alias("score"))


def expression_sort(searcher, query, docs: DataFrame, source: str, k: int,
                    bindings: dict | None = None,
                    ascending: bool = False) -> DataFrame:
    """Expression#getSortField: top-k of `query`'s hits ordered by the
    compiled expression (desc by default, doc_id tiebreak) →
    (doc_id, score). One projection + TakeOrderedAndProject — the
    expression itself never adds a shuffle."""
    scored = expression_score(searcher, query, docs, source, bindings)
    key = F.asc("score") if ascending else F.desc("score")
    return scored.orderBy(key, F.asc("doc_id")).limit(k)
