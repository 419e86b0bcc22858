"""SimpleQueryParser — the lenient end-user query syntax.

Reference: `lucene/queryparser/src/java/org/apache/lucene/queryparser/
simple/SimpleQueryParser.java:99-661`. Re-expression of its exact
character-level state machine:

- operators: ``+`` AND, ``|`` OR, ``-`` NOT (stacked negations cancel,
  :197-205,439-444), ``"…"`` phrase with optional ``~N`` slop (NEAR,
  :302-319), trailing ``*`` prefix (:386,406-410), ``~N`` term fuzziness
  (default 2 when bare, capped at 2 = LevenshteinAutomata.
  MAXIMUM_SUPPORTED_DISTANCE, negative/garbage → 0, :396-405,482-518),
  ``( … )`` precedence, ``\\`` escaping (:71-95), whitespace delimits.
- LENIENT: syntax errors never raise — an unmatched ``(`` or ``"`` is
  extraneous (:262-265,327-330), an extraneous ``)`` is skipped (:169),
  an operator with nothing before it is ignored (:175-196).
- tree building (buildQueryTree :435-476): same-operator clauses fold
  into the current BooleanQuery; an operator CHANGE wraps the whole
  tree so far as one clause of a fresh node — the documented
  right-to-left precedence ("token1 | token2 + token3" evaluates the
  OR first). NOT wraps its operand as
  BooleanQuery(MUST_NOT x, SHOULD MatchAll) (:439-444).
- ``*`` alone → MatchAllQuery (:148-150); nothing parseable →
  MatchNoQuery (:157-158).
- term text goes through the full analyzer (a token like ``term-1``
  analyzing to several terms combines them with the default operator,
  createBooleanQuery); prefix/fuzzy text is only NORMALIZED
  (lowercased), per newPrefixQuery/newFuzzyQuery (:559-608).

Flags (feature gating, :105-124) carried verbatim; ``flags=-1``
enables everything. Single-field form only (the multi-field weights
loop is per-field boost sugar our BoostQuery composition provides).

The parser is driver-side string handling; execution is the ordinary
distributed kernel.
"""

from __future__ import annotations

from .ast import (DEFAULT_FIELD, BooleanQuery, Clause, FuzzyQuery,
                  MatchAllQuery, MatchNoQuery, Occur, PhraseQuery,
                  PrefixQuery, TermQuery)

AND_OPERATOR = 1 << 0
NOT_OPERATOR = 1 << 1
OR_OPERATOR = 1 << 2
PREFIX_OPERATOR = 1 << 3
PHRASE_OPERATOR = 1 << 4
PRECEDENCE_OPERATORS = 1 << 5
ESCAPE_OPERATOR = 1 << 6
WHITESPACE_OPERATOR = 1 << 7
FUZZY_OPERATOR = 1 << 8
NEAR_OPERATOR = 1 << 9

_MAX_EDITS = 2      # LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE
_WS = " \t\n\r"


class _State:
    __slots__ = ("data", "index", "length", "current_op", "previous_op",
                 "not_count", "top")

    def __init__(self, data: str, index: int, length: int):
        self.data = data
        self.index = index
        self.length = length
        self.current_op = None
        self.previous_op = None
        self.not_count = 0
        self.top = None


class SimpleQueryParser:
    def __init__(self, analyzer, field: str = DEFAULT_FIELD,
                 flags: int = -1,
                 default_operator: Occur = Occur.SHOULD):
        if default_operator not in (Occur.SHOULD, Occur.MUST):
            raise ValueError("only SHOULD or MUST are allowed")
        self.analyzer = analyzer
        self.field = field
        self.flags = flags
        self.default_operator = default_operator

    # -- public --------------------------------------------------------

    def parse(self, query_text: str):
        if query_text.strip() == "*":
            return MatchAllQuery()
        state = _State(query_text, 0, len(query_text))
        self._parse_sub_query(state)
        return state.top if state.top is not None else MatchNoQuery()

    # -- state machine (parseSubQuery :164-223) -------------------------

    def _on(self, flag: int) -> bool:
        return (self.flags & flag) != 0

    def _parse_sub_query(self, st: _State) -> None:
        while st.index < st.length:
            ch = st.data[st.index]
            if ch == "(" and self._on(PRECEDENCE_OPERATORS):
                self._consume_sub_query(st)
            elif ch == ")" and self._on(PRECEDENCE_OPERATORS):
                st.index += 1
            elif ch == '"' and self._on(PHRASE_OPERATOR):
                self._consume_phrase(st)
            elif ch == "+" and self._on(AND_OPERATOR):
                if st.current_op is None and st.top is not None:
                    st.current_op = Occur.MUST
                st.index += 1
            elif ch == "|" and self._on(OR_OPERATOR):
                if st.current_op is None and st.top is not None:
                    st.current_op = Occur.SHOULD
                st.index += 1
            elif ch == "-" and self._on(NOT_OPERATOR):
                st.not_count += 1
                st.index += 1
                continue    # keep the not count across the next char
            elif ch in _WS and self._on(WHITESPACE_OPERATOR):
                st.index += 1
            else:
                self._consume_token(st)
            st.not_count = 0

    def _consume_sub_query(self, st: _State) -> None:
        start = st.index = st.index + 1
        precedence, escaped = 1, False
        while st.index < st.length:
            ch = st.data[st.index]
            if not escaped:
                if ch == "\\" and self._on(ESCAPE_OPERATOR):
                    escaped = True
                    st.index += 1
                    continue
                if ch == "(":
                    precedence += 1
                elif ch == ")":
                    precedence -= 1
                    if precedence == 0:
                        break
            escaped = False
            st.index += 1
        if st.index == st.length:          # no closing ')': extraneous '('
            st.index = start
        elif st.index == start:            # empty '()': op would have
            st.current_op = None           # applied to it — reset
            st.index += 1
        else:
            sub = _State(st.data, start, st.index)
            self._parse_sub_query(sub)
            self._build_query_tree(st, sub.top)
            st.index += 1

    def _consume_phrase(self, st: _State) -> None:
        start = st.index = st.index + 1
        buf, escaped, has_slop = [], False, False
        while st.index < st.length:
            ch = st.data[st.index]
            if not escaped:
                if ch == "\\" and self._on(ESCAPE_OPERATOR):
                    escaped = True
                    st.index += 1
                    continue
                if ch == '"':
                    if (st.length > st.index + 1
                            and st.data[st.index + 1] == "~"
                            and self._on(NEAR_OPERATOR)):
                        st.index += 1
                        if st.length > st.index + 1:
                            has_slop = True
                        break
                    break
            escaped = False
            buf.append(ch)
            st.index += 1
        if st.index == st.length:          # no closing '"': extraneous
            st.index = start
        elif st.index == start:            # empty '""'
            st.current_op = None
            st.index += 1
        else:
            phrase = "".join(buf)
            slop = self._parse_fuzziness(st) if has_slop else 0
            self._build_query_tree(st, self._new_phrase_query(phrase, slop))
            st.index += 1

    def _consume_token(self, st: _State) -> None:
        buf, escaped, prefix, fuzzy = [], False, False, False
        while st.index < st.length:
            ch = st.data[st.index]
            if not escaped:
                if ch == "\\" and self._on(ESCAPE_OPERATOR):
                    escaped = True
                    prefix = False
                    st.index += 1
                    continue
                if self._token_finished(st):
                    break
                if buf and ch == "~" and self._on(FUZZY_OPERATOR):
                    fuzzy = True
                    break
                prefix = (bool(buf) and ch == "*"
                          and self._on(PREFIX_OPERATOR))
            escaped = False
            buf.append(ch)
            st.index += 1
        if not buf:
            return
        if fuzzy:
            token = "".join(buf)
            edits = min(self._parse_fuzziness(st), _MAX_EDITS)
            branch = (self._new_default_query(token) if edits == 0
                      else FuzzyQuery(self._normalize(token), edits,
                                      self.field))
        elif prefix:
            branch = PrefixQuery(self._normalize("".join(buf[:-1])),
                                 self.field)
        else:
            branch = self._new_default_query("".join(buf))
        self._build_query_tree(st, branch)

    # -- tree building (:435-476) ---------------------------------------

    def _build_query_tree(self, st: _State, branch) -> None:
        if branch is None:
            return
        if st.not_count % 2 == 1:
            branch = BooleanQuery((Clause(Occur.MUST_NOT, branch),
                                   Clause(Occur.SHOULD, MatchAllQuery())))
        if st.top is None:
            st.top = branch
        else:
            if st.current_op is None:
                st.current_op = self.default_operator
            if st.previous_op is not st.current_op:
                st.top = BooleanQuery((Clause(st.current_op, st.top),))
            st.top = BooleanQuery(st.top.clauses
                                  + (Clause(st.current_op, branch),),
                                  st.top.min_should_match)
            st.previous_op = st.current_op
        st.current_op = None

    # -- helpers ---------------------------------------------------------

    def _parse_fuzziness(self, st: _State) -> int:
        if st.index >= st.length or st.data[st.index] != "~":
            return 0
        digits = []
        while st.index < st.length:
            st.index += 1
            if st.index < st.length:
                if self._token_finished(st):
                    break
                digits.append(st.data[st.index])
        text = "".join(digits)
        if text == "":
            return 2                      # bare '~' = automatic fuzziness
        try:
            n = int(text)
        except ValueError:
            return 0
        return max(n, 0)

    def _token_finished(self, st: _State) -> bool:
        ch = st.data[st.index]
        return ((ch == '"' and self._on(PHRASE_OPERATOR))
                or (ch == "|" and self._on(OR_OPERATOR))
                or (ch == "+" and self._on(AND_OPERATOR))
                or (ch in "()" and self._on(PRECEDENCE_OPERATORS))
                or (ch in _WS and self._on(WHITESPACE_OPERATOR)))

    def _normalize(self, text: str) -> str:
        # Analyzer#normalize: the normalization chain only (lowercase),
        # no tokenization/stopping — prefixes and fuzzy sources must
        # not be split or stop-dropped
        return text.lower()

    def _new_default_query(self, text: str):
        """createBooleanQuery: full analysis; several produced tokens
        combine with the default operator; none → null branch."""
        toks = self.analyzer.tokens(text)
        if not toks:
            return None
        if len(toks) == 1:
            return TermQuery(toks[0], self.field)
        return BooleanQuery(tuple(
            Clause(self.default_operator, TermQuery(t, self.field))
            for t in toks))

    def _new_phrase_query(self, text: str, slop: int):
        toks = self.analyzer.tokens(text)
        if not toks:
            return None
        if len(toks) == 1:
            return TermQuery(toks[0], self.field)
        return PhraseQuery(tuple(toks), self.field, slop=slop)
