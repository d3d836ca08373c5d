"""N3 / N-Triples serialization.

Reimplements the *behavior* of the reference Writer
(/root/reference/lib/rdf/n3/writer.rb:49-788) — prefix headers, subject
ordering, predicate ordering with `a` sugar, `[ ]` inlining of
single-referenced bnodes, `( )` reconstruction of rdf:first/rest
ladders, `{ }` formula rendering — as a pure function over a quad set.
Round-trip tests assert parse(serialize(G)) ≅ G under bnode
isomorphism; additionally the surface format (punctuation, bracket
spacing, @base relativization, prefix headers, property order) is
pinned by tests transcribed from the reference's own writer_spec.rb
regexp expectations (tests/test_writer.py).  Full byte parity beyond
those assertions stays out of scope (SURVEY.md §7 hard part (e)).

Ray mapping (SURVEY.md §2.1): N-Triples is a stateless vectorizable
map_batches render; canonical N3 is per-document
``groupby(conv_id, turn_idx).map_groups(render)`` — formulae/documents
are small, so in-group work is bounded.
"""
from __future__ import annotations

import re as _re
from collections import defaultdict

import pandas as pd

from .. import terms as T

Quad = tuple[str, str, str, str | None]

# formula-node label conventions: the parser mints _:_form_N, the
# engine mints _:{kind}_form_{hash} (engine._content_graph_id) — both
# identify a formula even when it has NO quads in the writer's input
# (an empty formula must render "{}", not degrade to a bnode "[]").
# The regex is only a FALLBACK heuristic for callers that hand the
# writer a bare quad set: a user-authored bnode matching the pattern
# would false-positive (the reference avoids that because its writer
# sees the repository's formula map, writer.rb:630-649).  Callers that
# KNOW their formula set (parser ParseResult.formula_labels, the
# engine's graph map) pass `formula_labels=` explicitly, which
# replaces the heuristic entirely.
_FORMULA_LABEL_RE = _re.compile(r"_:([A-Za-z0-9]+)?_form_")

# writer.rb:248-263 predicate_order — rdf:type, rdfs:label, dc:title first
_PREDICATE_ORDER = {
    T.RDF_TYPE: 0,
    f"<{T.RDFS_NS}label>": 1,
    "<http://purl.org/dc/terms/title>": 2,
}

_DEFAULT_PREFIXES = {
    "rdf": T.RDF_NS,
    "rdfs": T.RDFS_NS,
    "xsd": T.XSD_NS,
    "log": T.LOG_NS,
    "math": T.MATH_NS,
    "list": T.LIST_NS,
    "string": T.STR_NS,
    "time": T.TIME_NS,
    "owl": T.OWL_NS,
}

# well-known vocabularies offered when standard_prefixes is set (the
# reference pulls these from RDF::Vocabulary, writer_spec.rb:126-137)
_STANDARD_PREFIXES = {
    "foaf": "http://xmlns.com/foaf/0.1/",
    "dc": "http://purl.org/dc/terms/",
    "dce": "http://purl.org/dc/elements/1.1/",
    "skos": "http://www.w3.org/2004/02/skos/core#",
    "schema": "http://schema.org/",
    "geo": "http://www.w3.org/2003/01/geo/wgs84_pos#",
}

import re as _lex_re

_INT_LEX_RE = _lex_re.compile(r"[+-]?[0-9]+\Z")
_DEC_LEX_RE = _lex_re.compile(r"[+-]?[0-9]*\.[0-9]+\Z")
_DBL_LEX_RE = _lex_re.compile(r"[+-]?(?:[0-9]+\.[0-9]*|\.?[0-9]+)[eE][+-]?[0-9]+\Z")
# exactly the shape terms.canonical_double PRODUCES on success
_DBL_CANON_RE = _lex_re.compile(r"-?[0-9]+\.[0-9]+E-?[0-9]+\Z")

_PNAME_SAFE_RE = _re.compile(r"[A-Za-z0-9_\-\.]*[A-Za-z0-9_\-]$|^$")


def _pname_safe(local: str) -> bool:
    """Conservative check that `local` can serialize as a pname local part
    without escaping (writer.rb pname minting uses the full PN_LOCAL
    grammar; we fall back to <iri> form for anything exotic)."""
    if local == "":
        return True
    if local[0] in ".-":
        return False
    return bool(_PNAME_SAFE_RE.match(local)) and "/" not in local and "#" not in local


def to_ntriples(quads: list[Quad]) -> str:
    """Fast path: one line per default-graph triple, quads in formulae
    rendered as N-Quads-style with the formula node as graph label."""
    lines = []
    for s, p, o, g in quads:
        if g:
            lines.append(f"{s} {p} {o} {g} .")
        else:
            lines.append(f"{s} {p} {o} .")
    return "\n".join(lines) + ("\n" if lines else "")


def ntriples_batch(batch) -> "pd.DataFrame":
    """Vectorized Dataset stage: triple rows -> N-Triples line column."""
    graph = batch["graph"].fillna("")
    line = batch["subj"] + " " + batch["pred"] + " " + batch["obj"]
    line = line.where(graph == "", line + " " + graph) + " ."
    return pd.DataFrame({"conv_id": batch["conv_id"], "turn_idx": batch["turn_idx"], "line": line})


def _flat_list_members(t: str):
    """All leaf terms inside a first-class list term (nested included)."""
    def walk(x):
        if isinstance(x, list):
            for m in x:
                yield from walk(m)
        else:
            yield x

    yield from walk(T.parse_list_term(t) or [])


class N3Writer:
    """Pretty N3 serializer for one (small) quad set/document."""

    def __init__(self, quads: list[Quad], prefixes: dict[str, str] | None = None,
                 base_uri: str | None = None, standard_prefixes: bool = False,
                 canonicalize: bool = False,
                 formula_labels: set | frozenset | None = None):
        self.quads = list(dict.fromkeys(quads))
        self.canonicalize = canonicalize
        # None -> label-pattern heuristic; a set (possibly empty) is the
        # caller's authoritative formula map and disables the heuristic
        self.formula_labels = (None if formula_labels is None
                               else set(formula_labels))
        self.base_uri = base_uri
        self.prefixes = dict(prefixes or {})
        if standard_prefixes:
            self.prefixes = {**_STANDARD_PREFIXES, **self.prefixes}
        self.graphs: dict[str | None, list[Quad]] = defaultdict(list)
        for q in self.quads:
            self.graphs[q[3]].append(q)
        # reference counts per graph (writer.rb:673-684).  Predicate
        # occurrences count too: a bnode used as a predicate (path
        # sugar `:a!:b` mints those) must keep its LABEL everywhere —
        # inlining its object occurrence as [ ... ] would sever the
        # identity between the two positions on reparse
        self.ref_count: dict[tuple[str | None, str], int] = defaultdict(int)

        def count_term(g, t):
            if T.is_list_term(t):
                # members of a first-class list render through _term,
                # which may INLINE a bnode member as [ ... ]; count
                # them like any other occurrence so a bnode shared
                # between a list member and another position keeps its
                # label (identity would sever on reparse otherwise)
                for m in _flat_list_members(t):
                    count_term(g, m)
                return
            self.ref_count[(g, t)] += 1

        for s, p, o, g in self.quads:
            # subjects do NOT count as references (writer.rb:673-684);
            # a subject-position LIST's members are object-like though
            if T.is_list_term(s):
                count_term(g, s)
            count_term(g, o)
            if T.is_bnode(p):
                self.ref_count[(g, p)] += 1
        self.serialized: set[tuple] = set()

    def _is_formula_label(self, t: str) -> bool:
        """Is `t` a formula node even without quads in this input?
        Explicit formula_labels (authoritative) beats the label-pattern
        heuristic (fallback for bare quad-set callers)."""
        if self.formula_labels is not None:
            return t in self.formula_labels
        return bool(_FORMULA_LABEL_RE.match(t))

    # -- prefix handling (writer.rb:416-450 preprocess) -----------------
    def _used_namespaces(self) -> dict[str, str]:
        used = {}
        merged = {**_DEFAULT_PREFIXES, **self.prefixes}
        # the parser stores the default prefix under key None; emit it
        # as the legal empty pname prefix ("@prefix : <...>"), with an
        # explicit "" entry (if any) taking precedence
        names = {}
        if None in merged:
            names[""] = merged.pop(None)
        names.update(merged)
        # user prefixes override defaults for the same namespace (dict
        # inversion keeps the LAST writer); the empty prefix ("") is a
        # legal prefix name (writer_spec "pname URIs with empty prefix")
        by_ns = {v: k for k, v in names.items()}
        def flat_terms(t):
            if T.is_list_term(t):
                for m in _flat_list_members(t):
                    yield m
            else:
                yield t

        for s, p, o, g in self.quads:
            for pos in (s, p, o):
                for t in flat_terms(pos):
                    if T.is_iri(t):
                        v = T.iri_value(t)
                    elif T.is_literal(t):
                        # datatype IRIs shorten too (writer.rb:424
                        # get_pname(statement.object.datatype))
                        v = T.literal_parts(t)[1]
                        if v is None:
                            continue
                    else:
                        continue
                    if self._relativize(v) is not None:
                        continue  # relativized form wins over pname
                    for ns, pfx in by_ns.items():
                        if v.startswith(ns) and _pname_safe(v[len(ns):]):
                            used[pfx] = ns
                            break
        return used

    def _relativize(self, v: str) -> str | None:
        """Relative form of IRI `v` under base_uri, or None.  Pragmatic
        subset of RDF::URI#relativize (writer.rb:315): exact base -> "",
        prefix-of-base when the remainder starts cleanly."""
        b = self.base_uri
        if not b:
            return None
        if v == b:
            return ""
        if v.startswith(b):
            rest = v[len(b):]
            if b.endswith(("/", "#")) or rest.startswith(("#", "?")):
                return rest
        return None

    def _term(self, t: str, graph: str | None, inline_depth: int = 0) -> str:
        if T.is_list_term(t):
            # first-class list term (list_terms mode): re-render every
            # member through _term so numeric/boolean sugar and pname
            # shortening apply inside `( )` exactly as they do at the
            # top level (the ladder path below already does; rendering
            # the raw encoding verbatim printed `("1"^^xsd:integer)`
            # where the reference writes `(1)`, writer.rb:497-512)
            members = T.parse_list_term(t) or []

            def render(m) -> str:
                if isinstance(m, list):
                    return ("(" + " ".join(render(x) for x in m) + ")")
                return self._term(m, graph, inline_depth)

            return "(" + " ".join(render(m) for m in members) + ")"
        if T.is_iri(t):
            if t == T.RDF_NIL:
                return "()"  # the empty collection (before pname sugar)
            v = T.iri_value(t)
            rel = self._relativize(v)
            if rel is not None:
                return f"<{rel}>"
            for pfx, ns in self._active.items():
                local = v[len(ns):]
                if v.startswith(ns) and _pname_safe(local):
                    return f"{pfx}:{local}"
            return t
        if T.is_literal(t):
            value, dt, lang = T.literal_parts(t)
            if self.canonicalize and lang is None:
                # writer canonicalize option (writer_spec.rb:339-513
                # literal tables; RDF::Literal#canonicalize semantics)
                if dt == T.XSD_INTEGER:
                    value = T.canonical_integer(value)
                elif dt == T.XSD_DECIMAL:
                    value = T.canonical_decimal(value)
                elif dt == T.XSD_DOUBLE:
                    # the N3 writer downcases the exponent marker
                    # (writer.rb:295 `.sub('E', 'e')`) — but ONLY when
                    # canonicalization succeeded (canonical_double
                    # passes invalid lexicals like "brokEn" or NaN
                    # through unchanged; a blanket replace would mutate
                    # their content).  The reader-side canonical form
                    # keeps XSD's uppercase E.
                    cv = T.canonical_double(value)
                    if _DBL_CANON_RE.match(cv):
                        cv = cv.replace("E", "e")
                    value = cv
                elif dt == T.XSD_BOOLEAN:
                    value = T.canonical_boolean(value)
                t = T.literal(value, datatype=dt)
            # bare tokens only for lexically valid forms — "abc"^^xsd:integer
            # rendered bare would be unparseable, and "1"^^xsd:boolean
            # would re-parse as an integer
            if dt == T.XSD_INTEGER and _INT_LEX_RE.match(value):
                return value
            if dt == T.XSD_DECIMAL and _DEC_LEX_RE.match(value):
                return value
            if dt == T.XSD_BOOLEAN and value in ("true", "false"):
                return value
            if dt == T.XSD_DOUBLE and ("e" in value or "E" in value) \
                    and _DBL_LEX_RE.match(value):
                return value
            if dt is not None:
                # pname-shorten the datatype IRI (writer.rb format_uri
                # via format_literal's `^^#{format_uri(...)}`)
                for pfx, ns in self._active.items():
                    local = dt[len(ns):]
                    if dt.startswith(ns) and _pname_safe(local):
                        return t[: t.rfind("^^") + 2] + f"{pfx}:{local}"
            return t  # keep full form incl lang/datatype
        if T.is_var(t):
            return t
        if T.is_bnode(t):
            # formula node? (see _FORMULA_LABEL_RE for the empty case)
            if t in self.graphs or self._is_formula_label(t):
                return self._formula(t)
            if self._is_list_head(t, graph):
                if self.ref_count[(graph, t)] > 1:
                    # shared list: inlining here would consume the ladder
                    # at the FIRST reference and leave later references
                    # dangling — keep the label; the subject pass renders
                    # the ladder explicitly once
                    return t
                head_quads = [q for q in self.graphs.get(graph, [])
                              if q[0] == t]
                if all(q in self.serialized for q in head_quads):
                    # ladder already emitted under its explicit label
                    # (it was an earlier subject) — reference the label;
                    # re-inlining would duplicate the list
                    return t
                return self._as_list(t, graph)
            if inline_depth < 8 and self._inlinable(t, graph):
                props = [q for q in self.graphs.get(graph, [])
                         if q[0] == t and q not in self.serialized]
                had_any = any(q[0] == t for q in self.graphs.get(graph, []))
                if props or not had_any:
                    return self._bnode_props(t, graph, inline_depth)
                # its statements were already rendered under the _: label
                # (it was an earlier subject) — reference that label,
                # never an empty []
            return t
        return t

    # -- list reconstruction (writer.rb:705-786 with_graph rebuild) -----
    def _is_list_head(self, head: str, graph: str | None,
                      allow_head_extra: bool = False) -> bool:
        """Structural probe WITHOUT side effects: _as_list marks quads
        serialized and renders items, so it must only run when the list
        is actually being emitted."""
        node, seen = head, set()
        while node != T.RDF_NIL:
            if node in seen or not T.is_bnode(node):
                return False
            seen.add(node)
            outgoing = [q for q in self.graphs.get(graph, []) if q[0] == node]
            firsts = [q for q in outgoing if q[1] == T.RDF_FIRST]
            rests = [q for q in outgoing if q[1] == T.RDF_REST]
            if len(firsts) != 1 or len(rests) != 1:
                return False
            if len(outgoing) != 2 and not (allow_head_extra and node == head):
                return False
            if firsts[0] in self.serialized or rests[0] in self.serialized:
                # part of the ladder was already rendered explicitly
                # (chain nodes sorted before the head as subjects);
                # folding now would re-emit the items as FRESH nodes
                # and duplicate the structure (gk-list-issue-12.n3)
                return False
            node = rests[0][2]
        return True

    def _as_list(self, head: str, graph: str | None,
                 allow_head_extra: bool = False) -> str | None:
        """Render a first/rest ladder as "( ... )", marking ONLY the
        ladder quads serialized (a head with extra properties keeps them
        for its predicateObjectList when allow_head_extra is set)."""
        items, seen = [], set()
        ladder: list[Quad] = []
        node = head
        while node != T.RDF_NIL:
            if node in seen or not T.is_bnode(node):
                return None
            seen.add(node)
            outgoing = [q for q in self.graphs.get(graph, []) if q[0] == node]
            firsts = [q for q in outgoing if q[1] == T.RDF_FIRST]
            rests = [q for q in outgoing if q[1] == T.RDF_REST]
            if len(firsts) != 1 or len(rests) != 1:
                return None
            if len(outgoing) != 2 and not (allow_head_extra and node == head):
                return None
            if firsts[0] in self.serialized or rests[0] in self.serialized:
                return None  # see _is_list_head
            ladder += [firsts[0], rests[0]]
            items.append(firsts[0][2])
            node = rests[0][2]
        for q in ladder:
            self.serialized.add(q)
        # no inner padding — the reference writes "(a b)"
        # (writer.rb:497-512 collection; writer_spec "implication"
        # expects the strict %r{\(17\) a :TestCase} form)
        return "(" + " ".join(self._term(i, graph) for i in items) + ")"

    def _cyclic_bnodes(self, graph: str | None) -> set:
        """Bnodes on a directed bnode->bnode cycle in this graph (incl.
        self-loops).  Inlining any of them as [ ... ] would either drop
        statements or emit a label pointing at an anonymous node, so
        they always render with explicit _: labels."""
        cache = getattr(self, "_cycles_cache", None)
        if cache is None:
            cache = self._cycles_cache = {}
        if graph in cache:
            return cache[graph]
        edges: dict[str, set] = defaultdict(set)
        for s, p, o, g in self.graphs.get(graph, []):
            if T.is_bnode(s) and T.is_bnode(o):
                edges[s].add(o)
        cyclic: set = set()
        WHITE, GRAY, BLACK = 0, 1, 2
        color: dict[str, int] = defaultdict(int)
        path: list[str] = []

        # iterative DFS (explicit stack): long bnode chains in generated
        # graphs would blow Python's recursion limit
        for root in list(edges):
            if color[root] != WHITE:
                continue
            stack = [(root, iter(edges.get(root, ())))]
            color[root] = GRAY
            path.append(root)
            while stack:
                u, it = stack[-1]
                advanced = False
                for v in it:
                    if color[v] == GRAY:
                        idx = path.index(v)
                        cyclic.update(path[idx:])
                    elif color[v] == WHITE:
                        color[v] = GRAY
                        path.append(v)
                        stack.append((v, iter(edges.get(v, ()))))
                        advanced = True
                        break
                if not advanced:
                    stack.pop()
                    path.pop()
                    color[u] = BLACK
        cache[graph] = cyclic
        return cyclic

    def _inlinable(self, t: str, graph: str | None) -> bool:
        return (self.ref_count[(graph, t)] <= 1
                and t not in self._cyclic_bnodes(graph))

    def _bnode_props(self, t: str, graph: str | None, depth: int) -> str:
        props = [q for q in self.graphs.get(graph, []) if q[0] == t and q not in self.serialized]
        for q in props:
            self.serialized.add(q)
        if not props:
            return "[]"
        # no inner padding: the reference writes "[ex:c ex:d]"
        # (writer.rb:616-622 blankNodePropertyList)
        return "[" + self._predicate_object_list(props, graph, depth + 1) + "]"

    def _formula(self, node: str) -> str:
        memo = getattr(self, "_formula_memo", None)
        if memo is None:
            memo = self._formula_memo = {}
        if node in memo:
            # second reference to the same formula: repeat the rendered
            # body (the first pass already marked its quads serialized;
            # re-rendering would emit an empty {})
            return memo[node]
        inner = self.graphs.get(node, [])
        body = self._render_graph(node)
        for q in inner:
            self.serialized.add(q)
        body = body.strip()
        out = "{" + (f" {body} " if body else "") + "}"
        memo[node] = out
        return out

    def _predicate_object_list(self, quads: list[Quad], graph: str | None, depth: int = 0) -> str:
        by_pred: dict[str, list[str]] = defaultdict(list)
        for s, p, o, g in quads:
            by_pred[p].append(o)
        parts = []
        for p in sorted(by_pred, key=lambda x: (_PREDICATE_ORDER.get(x, 9), x)):
            if p == T.RDF_TYPE:
                pred = "a"
            elif p == T.LOG_IMPLIES:
                pred = "=>"
            elif p == T.RDF_NIL:
                pred = p  # "()" is not legal in predicate position
            elif T.is_bnode(p) and not (p in self.graphs
                                        or self._is_formula_label(p)):
                # plain bnode predicate: always the label — "[...]"
                # sugar in predicate position mints a FRESH node on
                # reparse, breaking identity with other occurrences
                pred = p
            else:
                pred = self._term(p, graph)
            objs = ", ".join(self._term(o, graph, depth) for o in by_pred[p])
            parts.append(f"{pred} {objs}")
        # ";" attaches to the object, next property indented
        # (writer.rb:594 predicateObjectList)
        return ";\n    ".join(parts)

    def _subject_sort_key(self, s: str, quads: list[Quad]):
        # writer.rb:372-413 order_subjects: base first, classes, then
        # (bnode?, ref count, term)
        is_base = self.base_uri and T.is_iri(s) and T.iri_value(s) == self.base_uri
        is_class = any(q[1] == T.RDF_TYPE and q[2] == f"<{T.RDFS_NS}Class>" for q in quads if q[0] == s)
        return (0 if is_base else 1, 0 if is_class else 1, 1 if T.is_bnode(s) else 0, s)

    def _render_graph(self, graph: str | None) -> str:
        quads = self.graphs.get(graph, [])
        subjects = list(dict.fromkeys(q[0] for q in quads))
        subjects.sort(key=lambda s: self._subject_sort_key(s, quads))
        # referenced list-head bnodes go LAST: their reference site
        # usually inlines the ladder as "( ... )" (writer.rb marks cons
        # cells subject_done up front), leaving nothing to render here;
        # whatever is NOT inlined (shared lists, predicate-position
        # heads) still renders below, by label, after its referencer
        deferred = [s for s in subjects
                    if T.is_bnode(s) and s not in self.graphs
                    and not self._is_formula_label(s)
                    and self.ref_count[(graph, s)] > 0
                    and self._is_list_head(s, graph)]
        if deferred:
            dset = set(deferred)
            subjects = [s for s in subjects if s not in dset] + deferred
        out = []
        for s in subjects:
            sq = [q for q in quads if q[0] == s and q not in self.serialized]
            if not sq:
                continue
            if T.is_bnode(s) and s not in self.graphs \
                    and not self._is_formula_label(s) \
                    and self.ref_count[(graph, s)] == 0 \
                    and self._is_list_head(s, graph, allow_head_extra=True):
                # subject-position list: "(ex:a ex:b) ." / "(ex:a) :p :o ."
                # (writer_spec.rb "bare list" / "list as subject")
                lst = self._as_list(s, graph, allow_head_extra=True)
                if lst is not None:
                    rest = [q for q in quads
                            if q[0] == s and q not in self.serialized]
                    for q in rest:
                        self.serialized.add(q)
                    if rest:
                        out.append(
                            f"{lst} {self._predicate_object_list(rest, graph)} .")
                    else:
                        out.append(f"{lst} .")
                    continue
            if T.is_bnode(s) and s not in self.graphs \
                    and self._is_formula_label(s):
                # empty formula as subject: "{} <b> <c> ."
                for q in sq:
                    self.serialized.add(q)
                out.append(f"{{}} {self._predicate_object_list(sq, graph)} .")
                continue
            if T.is_bnode(s) and s not in self.graphs \
                    and not self._is_list_head(s, graph) \
                    and self.ref_count[(graph, s)] == 0:
                # root bnode: render as [ ... ] statement
                for q in sq:
                    self.serialized.add(q)
                out.append(f"[{self._predicate_object_list(sq, graph)}] .")
                continue
            if T.is_bnode(s) and s not in self.graphs:
                # subject position: any bnode (including list-ladder
                # heads — _is_list_head is false once a head has extra
                # props) keeps its explicit label; inlining its own
                # props here would consume this statement's quads
                subj = s
            else:
                subj = self._term(s, graph)
            sq = [q for q in self.graphs.get(graph, []) if q[0] == s and q not in self.serialized]
            if not sq:
                continue
            for q in sq:
                self.serialized.add(q)
            out.append(f"{subj} {self._predicate_object_list(sq, graph)} .")
        return "\n".join(out)

    def serialize(self) -> str:
        self._active = self._used_namespaces()
        header = "".join(
            f"@prefix {p}: <{ns}> .\n"
            for p, ns in sorted(self._active.items(), key=lambda kv: str(kv[0]))
        )
        if self.base_uri:
            header = f"@base <{self.base_uri}> .\n" + header
        body = self._render_graph(None)
        # Formula graphs never referenced from an outer statement (e.g.
        # parsed from a subject-only statement — the N3 grammar's
        # `triples ::= subject predicateObjectList?` makes `{ ... } .`
        # valid surface syntax) would otherwise lose their quads.  Emit
        # each orphan ROOT as a subject-only `{ ... } .` statement;
        # rendering a root consumes any orphan formulae it references,
        # so iterate to a fixpoint (sorted order keeps output
        # deterministic; the arbitrary-pick fallback breaks reference
        # cycles between orphans).
        extra = []
        while True:
            pending = {g for g, qs in self.graphs.items()
                       if g is not None
                       and any(q not in self.serialized for q in qs)}
            if not pending:
                break
            referenced = set()
            for g in pending:
                for q in self.graphs[g]:
                    if q in self.serialized:
                        continue
                    for t in (q[0], q[1], q[2]):
                        if t in pending:
                            referenced.add(t)
            roots = sorted(pending - referenced) or [sorted(pending)[0]]
            for g in roots:
                if any(q not in self.serialized for q in self.graphs[g]):
                    if T.is_iri(g) or (T.is_bnode(g)
                                       and not self._is_formula_label(g)):
                        # NAMED graph (N-Quads 4-term input / TriG-style
                        # label): the name must survive — render as
                        # `<name> = { ... } .` (writer_spec.rb:572-597
                        # "named with URI"/"named with BNode").  Minted
                        # formula labels keep the bare `{ ... } .` form.
                        name = self._term(g, None) if T.is_iri(g) else g
                        extra.append(f"{name} = " + self._formula(g) + " .")
                    else:
                        extra.append(self._formula(g) + " .")
        if extra:
            body = body + ("\n" if body else "") + "\n".join(extra)
        return header + ("\n" if header and body else "") + body + ("\n" if body else "")


def serialize_n3(quads: list[Quad], prefixes: dict[str, str] | None = None,
                 base_uri: str | None = None,
                 standard_prefixes: bool = False,
                 canonicalize: bool = False,
                 formula_labels: set | frozenset | None = None) -> str:
    return N3Writer(quads, prefixes=prefixes, base_uri=base_uri,
                    standard_prefixes=standard_prefixes,
                    canonicalize=canonicalize,
                    formula_labels=formula_labels).serialize()


def serialize_documents(triples_ds):
    """Dataset stage: per-(conv_id, turn_idx) canonical N3 rendering.

    groupby is the shuffle; each group (one turn's emission) is small —
    the writer runs in-group (SURVEY.md §3.2).
    """
    def render_bucket(bucket_df: pd.DataFrame) -> pd.DataFrame:
        # coarse shuffle bucket; the per-document split happens inside
        # (pandas groupby) — Ray's map_groups is once-per-group, and
        # per-(conv,turn) groups would be pathologically tiny
        rows = []
        for (conv, turn), g in bucket_df.groupby(["conv_id", "turn_idx"], sort=True):
            quads = [
                (r.subj, r.pred, r.obj, r.graph if isinstance(r.graph, str) else None)
                for r in g.itertuples()
            ]
            rows.append({"conv_id": conv, "turn_idx": turn, "n3": serialize_n3(quads)})
        return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "n3"])

    # salted bucket key hash(conv_id, turn_idx): rendering only needs
    # one TURN together, so a hot conversation (conv_id skew at scale)
    # spreads across all buckets instead of melting one reducer
    from ..stages.partitioning import turn_bucket

    keyed = triples_ds.map_batches(
        lambda b: turn_bucket(b, num_buckets=64, col="db"),
        batch_format="pandas",
    )
    return keyed.groupby("db").map_groups(render_bucket, batch_format="pandas")
