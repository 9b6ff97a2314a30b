"""Solr-ish query-string parser → :class:`Query` AST.

The reference's callers write edismax query STRINGS — buildSearchExpression
emits shapes like ``+("BRAF" OR "B-RAF") +("V600E" OR "Val600Glu")``
(`service/SolrServiceImpl.java:336-413`), TextService issues proximity
strings like ``"<gene> <keyword>"~15`` (`TextServiceImpl.java:531`), and
SolrClientTool.find takes the raw string (`util/SolrClientTool.java:162-214`).
A user switching from the reference keeps those strings: this module parses
the subset the reference actually generates into the engine's AST.

Grammar (whitespace-separated clauses; every clause is REQUIRED — edismax
``mm=100%``, `SolrClientTool.java:130,144,166,181`):

    query      := clause+
    clause     := '+'? group | '+'? atom | '-' term | field ':' value
    group      := '(' atom (OR atom)* ')'
    atom       := phrase | regex | term
    field      := 'text' (scoring atom) | role|tool|conv_id (non-scoring
                  exact-match fq on the metadata column; value may be quoted —
                  `authors:"…"` shape, SolrServiceImpl.java:397-404)
    phrase     := '"' text '"' ('~' int)?          # slop>0 → proximity
    regex      := '/' pattern '/'                  # Lucene regex term query
    term       := word('~' int?)?                  # '~' → fuzzy (default 1)
                | word with '*'/'?'                # wildcard

Kind selection mirrors the engine's executors: wildcard/regex/fuzzy atoms
must be the whole query (Lucene rewrites them CONSTANT_SCORE; the reference
flips them to the ws field, `SolrServiceImpl.java:434`); any OR inside a
group → ``or_groups``; a lone multi-token quoted atom → phrase/proximity;
otherwise ``and``.
"""

from __future__ import annotations

import re

from intuition_spark.query.ast import Query

_TOKEN_RE = re.compile(
    r"""
    \s*(
        \+?\(                 # group open (leading + optional)
      | \)                    # group close
      | OR\b
      | \+?[A-Za-z_]\w*:"(?:[^"\\]|\\.)*"   # field-qualified quoted value
      | "(?:[^"\\]|\\.)*"(?:~\d+)?   # quoted phrase, optional slop
      | /(?:[^/\\]|\\.)+/     # regex atom
      | \+?[^\s()]+           # bare term / wildcard / fuzzy
    )""",
    re.VERBOSE,
)

# a field-qualified clause: `role:assistant` / `authors:"some value"`
# (buildSearchExpression field atoms, SolrServiceImpl.java:397-404)
_FIELD_RE = re.compile(r'\+?([A-Za-z_]\w*):("(?:[^"\\]|\\.)*"|[^\s()]+)$')


class QueryParseError(ValueError):
    pass


def _lex(s: str) -> list[str]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            if s[pos:].strip() == "":
                break
            raise QueryParseError(f"cannot lex query at: {s[pos:]!r}")
        out.append(m.group(1))
        pos = m.end()
    return out


def _classify_atom(tok: str) -> tuple[str, str, int]:
    """→ (atom_kind, payload, slop). atom_kind ∈ term|phrase|proximity|
    wildcard|regex|fuzzy."""
    if tok.startswith('"'):
        m = re.fullmatch(r'"((?:[^"\\]|\\.)*)"(?:~(\d+))?', tok)
        if not m:
            raise QueryParseError(f"bad phrase: {tok!r}")
        body, slop = m.group(1).replace('\\"', '"'), m.group(2)
        if slop is not None:
            return "proximity", body, int(slop)
        return ("phrase" if " " in body.strip() else "term"), body, 0
    if tok.startswith("/") and tok.endswith("/") and len(tok) > 2:
        return "regex", tok[1:-1], 0
    m = re.fullmatch(r"([^~]+)~(\d*)", tok)
    if m:
        payload = m.group(1)
        if any(c in payload for c in "*?/"):
            # 'te*t~1' is neither a valid fuzzy nor a wildcard — Lucene's
            # parser rejects mixed multi-term syntax; so do we
            raise QueryParseError(
                f"wildcard/regex metacharacters are not allowed in fuzzy atoms: {tok!r}"
            )
        return "fuzzy", payload, int(m.group(2) or 1)
    if "*" in tok or "?" in tok:
        return "wildcard", tok, 0
    return "term", tok, 0


def parse_query(
    s: str, query_id: str = "q", k: int = 10, analyzer: str = "standard", **kw
) -> Query:
    """Parse a reference-style query string into a :class:`Query`.

    Extra keyword args (filter_docs, ts_after, require_no_tool) pass through —
    they are fq parameters in the reference, not part of the q string.
    """
    toks = _lex(s)
    if not toks:
        raise QueryParseError("empty query")
    groups: list[list[tuple[str, str, int]]] = []
    exclude: list[str] = []
    field_eq: dict[str, str] = {}
    i = 0
    while i < len(toks):
        t = toks[i]
        if t in (")", "OR"):
            raise QueryParseError(f"unexpected {t!r}")
        if t.startswith("-") and len(t) > 1:
            # MUST_NOT clause (the reference's `-field:*` negation shape)
            ak, payload, _ = _classify_atom(t[1:])
            if ak != "term":
                raise QueryParseError(f"only single terms can be negated: {t!r}")
            exclude.append(payload)
            i += 1
            continue
        fm = _FIELD_RE.fullmatch(t)
        if fm and not t.endswith("("):
            fname, fval = fm.group(1), fm.group(2)
            if fval.startswith('"'):
                fval = fval[1:-1].replace('\\"', '"')
            if fname == "text":
                # default-field qualification is just a scoring atom
                groups.append([_classify_atom(fval)])
            else:
                from intuition_spark.query.ast import FIELD_EQ_COLS

                if fname not in FIELD_EQ_COLS:
                    # edismax semantics: an unrecognized field name is NOT an
                    # error — the whole token degrades to a plain scoring atom
                    # (queries legitimately contain colons: URLs, key:value
                    # fragments, timestamps — and 'test:runner' is one edit
                    # from 'text', so hard-failing near-misses breaks real
                    # queries). Guard rails (ADVICE r3): a NEAR-MISS of a
                    # real field name (edit distance ≤ 1, e.g. `rol:assistant`)
                    # degrades like any other token but emits a visible
                    # warning naming the likely intended field; and wildcard
                    # metachars in the degraded payload (`url:http*`) are
                    # stripped explicitly — the token is scored as a term,
                    # never half-promoted to a multi-term query.
                    from intuition_spark.query.engine import _lev_le

                    near = [
                        f for f in (*FIELD_EQ_COLS, "text")
                        if _lev_le(fname.lower(), f, 1)
                    ]
                    if near:
                        import warnings

                        warnings.warn(
                            f"unknown field {fname!r} (did you mean {near[0]!r}?) "
                            "— degrading to a scoring atom, not a field filter",
                            stacklevel=2,
                        )
                    payload = t.lstrip("+").replace("*", "").replace("?", "")
                    groups.append([("term", payload, 0)])
                    i += 1
                    continue
                if fname in field_eq:
                    raise QueryParseError(f"duplicate field predicate: {fname!r}")
                field_eq[fname] = fval
            i += 1
            continue
        if t.endswith("("):
            group: list[tuple[str, str, int]] = []
            i += 1
            want_atom = True
            while i < len(toks) and toks[i] != ")":
                if toks[i] == "OR":
                    if want_atom:
                        raise QueryParseError("OR without left atom")
                    want_atom = True
                else:
                    if toks[i].startswith("-"):
                        raise QueryParseError(
                            "negation inside groups is not supported "
                            f"(negate at the top level): {toks[i]!r}"
                        )
                    group.append(_classify_atom(toks[i].lstrip("+")))
                    want_atom = False
                i += 1
            if i == len(toks):
                raise QueryParseError("unclosed group")
            if group and want_atom:
                raise QueryParseError("OR without right atom")
            i += 1  # consume ')'
            if not group:
                raise QueryParseError("empty group")
            groups.append(group)
        else:
            groups.append([_classify_atom(t.lstrip("+"))])
            i += 1

    if not groups:
        raise QueryParseError("query has only negations/filters — nothing to score")
    if exclude:
        kw = dict(kw, exclude=exclude)
    if field_eq:
        kw = dict(kw, field_eq=field_eq)
    kinds = {ak for g in groups for ak, _, _ in g}
    multi = kinds & {"wildcard", "regex", "fuzzy"}
    if multi:
        if len(groups) != 1 or len(groups[0]) != 1:
            raise QueryParseError(
                "wildcard/regex/fuzzy must be the whole query "
                "(CONSTANT_SCORE multi-term rewrite)"
            )
        ak, payload, extra = groups[0][0]
        if ak == "fuzzy":
            if extra == 0:
                # Lucene parses ~0 as an exact term query — lower it the same way
                return Query(query_id, "term", [[payload]], k=k, analyzer=analyzer, **kw)
            if extra != 1:
                # the engine's dictionary expansion is Levenshtein<=1 (the
                # reference's fuzzy shape, GeneMINDImpl.java:74-83); reject
                # rather than silently running a different edit distance
                raise QueryParseError(f"only fuzzy distance 1 is supported, got ~{extra}")
        return Query(query_id, ak, [[payload]], k=k, analyzer=analyzer, **kw)

    slops = {slop for g in groups for ak, _, slop in g if ak == "proximity"}
    if len(groups) == 1 and len(groups[0]) == 1:
        ak, payload, slop = groups[0][0]
        if ak == "proximity":
            return Query(query_id, "proximity", [[payload]], slop=slop,
                         k=k, analyzer=analyzer, **kw)
        if ak == "phrase":
            return Query(query_id, "phrase", [[payload]], k=k, analyzer=analyzer, **kw)
        return Query(query_id, "term", [[payload]], k=k, analyzer=analyzer, **kw)
    if "proximity" in kinds:
        if len(slops) > 1:
            raise QueryParseError("mixed slops in one query are not supported")
        if "phrase" in kinds:
            # Query carries ONE slop applied to every multi-token atom, so an
            # exact phrase would silently become sloppy — refuse instead
            raise QueryParseError(
                "mixing exact phrases and sloppy phrases in one query is not supported"
            )
        slop = slops.pop()
        return Query(query_id, "proximity",
                     [[p for _, p, _ in g] for g in groups],
                     slop=slop, k=k, analyzer=analyzer, **kw)
    kind = "or_groups" if any(len(g) > 1 for g in groups) else "and"
    return Query(query_id, kind, [[p for _, p, _ in g] for g in groups],
                 k=k, analyzer=analyzer, **kw)
