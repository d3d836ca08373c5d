"""Local N3 reasoning engine — fixed-point forward chaining.

Reimplements the reference's Reasoner + Formula algebra
(/root/reference/lib/rdf/n3/reasoner.rb:112-148,
/root/reference/lib/rdf/n3/algebra/formula.rb:121-189,
/root/reference/lib/rdf/n3/algebra/log/implies.rb:28-96) over encoded
quad lists:

- knowledge base = quad set; fixed point on count growth (`think`),
  single pass otherwise (reasoner.rb:123-140)
- per iteration the top formula is rebuilt from the KB: variable
  patterns BGP-join against the KB, builtins evaluated in rank order
  (fewest unbound inputs first, re-ranked after each success —
  formula.rb:163-186), `log:implies` antecedents queried and
  consequents instantiated with `inferred` marking
- blank nodes inside quoted graphs are promoted to non-distinguished
  existential variables (extensions.rb:121-125 `to_ndvar`,
  label "<id>_<scope>_undext"); unbound existentials in a consequent
  materialize as blank nodes interned by variable label
  (formula.rb:236-244)

This engine is deliberately in-memory: per-turn documents are small
(SURVEY.md §3.3).  The distributed fixed point over a large KB lives in
pipelines/reasoning.py, which broadcasts rules and turns the BGP match
into Dataset joins; both share this module's instantiation semantics.
"""
from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field

from .. import terms as T
from .builtins import NOT_IMPLEMENTED, REGISTRY, EvalContext, input_vars, is_var

Quad = tuple[str, str, str, str | None]

LOG_IMPLIES_IRI = T.LOG_IMPLIES
LOG = T.LOG_NS


@dataclass
class ReasonResult:
    quads: list[Quad]          # full closure (default + quoted graphs)
    inferred: list[Quad]       # subset added by rules
    strings: str               # ordered log:outputString concatenation
    iterations: int = 0
    # reader-declared prefixes, carried so a writer can reuse them the
    # way the reference CLI does (script/reason passes reader prefixes
    # to the writer); None when constructed from bare quads
    prefixes: dict | None = None

    def data(self) -> list[Quad]:
        """Ground default-graph projection (reasoner.rb:184-209)."""
        graphs = {g for _, _, _, g in self.quads if g}
        out = []
        for s, p, o, g in self.quads:
            if g is not None:
                continue
            if any(is_var(t) or t in graphs for t in (s, p, o)):
                continue
            out.append((s, p, o, g))
        return out

    def conclusions(self) -> list[Quad]:
        """Inferred statements plus the contents of any formula they
        reference (Implies#each yields form_statements through the same
        inferred-marking block, implies.rb:70-96 + formula.rb:276-287)."""
        by_graph = defaultdict(list)
        for q in self.quads:
            if q[3] is not None:
                by_graph[q[3]].append(q)
        out = list(self.inferred)
        seen_g, stack = set(), []
        for s, p, o, g in self.inferred:
            for t in (s, o):
                if t in by_graph:
                    stack.append(t)
        while stack:
            g = stack.pop()
            if g in seen_g:
                continue
            seen_g.add(g)
            for q in by_graph[g]:
                if q not in out:
                    out.append(q)
                for t in (q[0], q[2]):
                    if t in by_graph and t not in seen_g:
                        stack.append(t)
        return out


class Engine:
    def __init__(self, quads: list[Quad], ctx: EvalContext | None = None):
        self.ctx = ctx or EvalContext()
        self.kb: list[Quad] = []
        self.kb_set: set[Quad] = set()
        self.inferred: list[Quad] = []
        self.fresh_counter = 0
        self._graphs_memo = None
        self._kb_index = None  # persistent (by_pred, by_pred_subj, wild)
        self._cons_memo = None  # rdf:first/rest cell map for _expand_list
        self._list_cells_memo = None
        self._top_bgp_cache: tuple[int, list] = (0, [])
        for q in quads:
            self._insert(q)
        self.ctx.expand_list = self._expand_list
        self.ctx.formula_quads = self._formula_quads

    # -- kb helpers -----------------------------------------------------
    def _insert(self, q: Quad, inferred: bool = False) -> bool:
        if q in self.kb_set:
            return False
        self.kb_set.add(q)
        self.kb.append(q)
        # KB is append-only, so the graph memo and the persistent fact
        # index extend incrementally instead of invalidating — the
        # O(|KB|)-per-iteration rebuilds would make deep fixpoints
        # quadratic in the closure size
        if self._graphs_memo is not None:
            self._graphs_memo[q[3]].append(q)
        if self._kb_index is not None and q[3] is None:
            self._index_fact(self._kb_index, q)
        if self._cons_memo is not None and q[1] in (T.RDF_FIRST, T.RDF_REST):
            self._cons_memo[q[0]][q[1]] = q[2]
        self._list_cells_memo = None
        if inferred:
            self.inferred.append(q)
        return True

    def _graphs(self) -> dict[str | None, list[Quad]]:
        # memoized: engine builtins call this once per solution per
        # ranked-loop pass, and an O(|KB|) rebuild each time made
        # log:includes O(solutions x KB)
        memo = getattr(self, "_graphs_memo", None)
        if memo is not None:
            return memo
        graphs: dict[str | None, list[Quad]] = defaultdict(list)
        for q in self.kb:
            graphs[q[3]].append(q)
        self._graphs_memo = graphs
        return graphs

    def _formula_quads(self, g: str) -> list[Quad]:
        memo = self._graphs_memo
        if memo is not None:
            return memo.get(g, [])
        return [q for q in self.kb if q[3] == g]

    def _expand_list(self, head: str) -> list | None:
        """Expand an rdf:first/rest ladder headed at `head` (any graph).
        The cell map extends incrementally from _insert (append-only
        KB), so repeated expansions don't rescan the KB."""
        by_subj = self._cons_memo
        if by_subj is None:
            by_subj = self._cons_memo = defaultdict(dict)
            for s, p, o, _g in self.kb:
                if p in (T.RDF_FIRST, T.RDF_REST):
                    by_subj[s][p] = o
        out, node, seen = [], head, set()
        while node != T.RDF_NIL:
            if node in seen or node not in by_subj:
                return None
            seen.add(node)
            cell = by_subj[node]
            if T.RDF_FIRST not in cell or T.RDF_REST not in cell:
                return None
            out.append(cell[T.RDF_FIRST])
            node = cell[T.RDF_REST]
        return out

    # -- variable promotion (to_ndvar) ----------------------------------
    def _promote(self, term: str, scope: str, formula_nodes: set[str]) -> str:
        """bnodes in quoted graphs -> existential vars (recursing into
        list terms); formula refs kept."""
        if isinstance(term, str) and T.is_bnode(term) and term not in formula_nodes:
            return f"?{T.bnode_label(term)}_{scope}_undext"
        if isinstance(term, str) and T.is_list_term(term):
            def walk(e):
                if isinstance(e, list):
                    return [walk(x) for x in e]
                return self._promote(e, scope, formula_nodes)
            return T.encode_list([walk(e) for e in T.parse_list_term(term)])
        return term

    # -- pattern matching ----------------------------------------------
    def _unify(self, pat, ground, sol: dict, alpha: dict | None = None):
        # hot path: inlined is_var (type(t) is str and t[:1] == "?")
        if type(pat) is str and pat[:1] == "?":
            pat = sol.get(pat, pat)
        if type(pat) is str and pat[:1] == "?":
            if alpha is not None and is_var(ground):
                # inside formula-formula unification a pattern variable
                # meeting a quoted universal is alpha-correspondence, not
                # a binding (cwm alpha-equivalence; var-var bindings in
                # `sol` would be dropped at formula.rb:154 parity)
                prev = alpha.get(pat)
                if prev is None:
                    if ground in alpha.values():
                        return None
                    alpha[pat] = ground
                    return sol
                return sol if prev == ground else None
            if alpha is not None and pat in alpha:
                # this var already corresponds to a quoted universal in
                # the formula being unified — binding it to a concrete
                # term as well would fake alpha-equivalence
                return None
            s2 = dict(sol)
            # nested ground elements arrive as Python lists — re-encode
            # so bindings stay in the engine's string term space
            s2[pat] = T.encode_list(ground) if isinstance(ground, list) else ground
            return s2
        if alpha is None and is_var(ground):
            # ground-side universal (e.g. a legacy @forAll data fact
            # '?x :p :o'): universal instantiation — it matches any
            # pattern term, binding nothing
            return sol
        if isinstance(pat, list) or (isinstance(pat, str) and T.is_list_term(pat)):
            # nested elements from parse_list_term arrive as Python lists
            pl = pat if isinstance(pat, list) else T.parse_list_term(pat)
            if isinstance(ground, list):
                gl = ground
            elif isinstance(ground, str) and T.is_list_term(ground):
                gl = T.parse_list_term(ground)
            elif isinstance(ground, str) and T.is_bnode(ground):
                gl = self._expand_list(ground)
            else:
                gl = None
            if ground == T.RDF_NIL:
                gl = []
            if gl is None or len(pl) != len(gl):
                return None
            s2 = sol
            for pe, ge in zip(pl, gl):
                s2 = self._unify(pe, ge, s2, alpha)
                if s2 is None:
                    return None
            return s2
        if (pat != ground and self._is_formula_node(pat)
                and self._is_formula_node(ground)):
            # structural (alpha-equivalent) unification of quoted
            # formulae — beyond the reference (its RDF::Query compares
            # graph names), needed for the cwm unify goldens
            return self._unify_formula_terms(
                pat, ground, sol, alpha if alpha is not None else {})
        if pat == ground:
            return sol
        if (pat == T.RDF_NIL and ground == "()") or (
                pat == "()" and ground == T.RDF_NIL):
            # the empty list: rdf:nil IRI and the parser's list_terms
            # encoding '()' denote the same term
            return sol
        return None

    def _is_formula_node(self, t) -> bool:
        return (isinstance(t, str) and T.is_bnode(t)
                and ("_form_" in t or t in self._graphs()))

    def _unify_formula_terms(self, pg: str, gg: str, sol: dict,
                             alpha: dict):
        """Unify two quoted formulae statement-by-statement (first
        consistent matching wins), binding pattern variables to ground
        terms in `sol` and tracking quoted-universal correspondences in
        `alpha` only.  Formulae of different sizes never unify."""
        pq = self._formula_quads(pg)
        gq = self._formula_quads(gg)
        if len(pq) != len(gq):
            return None

        def bt(i: int, sol_i: dict, used: frozenset):
            if i == len(pq):
                return sol_i
            ps, pp, po, _ = pq[i]
            for j, (gs, gp, go, _) in enumerate(gq):
                if j in used:
                    continue
                saved = dict(alpha)
                s1 = self._unify(pp, gp, sol_i, alpha)
                s2 = self._unify(ps, gs, s1, alpha) if s1 is not None else None
                s3 = self._unify(po, go, s2, alpha) if s2 is not None else None
                if s3 is not None:
                    r = bt(i + 1, s3, used | {j})
                    if r is not None:
                        return r
                alpha.clear()
                alpha.update(saved)
            return None

        return bt(0, sol, frozenset())

    # a list longer than this gets no synthesized cells (the suffix
    # encodings are O(n^2) in the list length); cwm-style structural
    # rules over lists this big are out of contract
    _MAX_CELL_LIST = 512

    def _list_cell_facts(self, facts: list[Quad]) -> list[Quad]:
        """Synthesized rdf:first/rdf:rest facts for every list term (and
        every suffix/nested list) appearing in `facts` — cwm's llyn
        store keeps real cons cells, so rules may pattern-match list
        structure (examples/list/builtin_generated_match.n3); the
        reference's ListTerm-style encoding (ours too) hides it, so
        expose it here.  Derived from the facts being matched (not the
        whole KB) so log:includes over a quoted formula sees only that
        formula's lists.  The empty tail is '()' (the parser's
        list_terms encoding); `_unify` treats '()' and rdf:nil as the
        same term, so `rdf:rest rdf:nil` patterns match the last cell."""
        if facts is self.kb:
            memo = getattr(self, "_list_cells_memo", None)
            if memo is not None:
                return memo
        cells: list[Quad] = []
        seen: set[str] = set()

        def walk(term):
            # iterative over suffixes; recursion only for nesting depth
            while True:
                if isinstance(term, list):
                    elems, enc = term, T.encode_list(term)
                elif isinstance(term, str) and T.is_list_term(term):
                    elems, enc = T.parse_list_term(term), term
                else:
                    return
                if enc in seen or not elems or len(elems) > self._MAX_CELL_LIST:
                    return
                seen.add(enc)
                head = (T.encode_list(elems[0])
                        if isinstance(elems[0], list) else elems[0])
                tail = elems[1:]
                cells.append((enc, T.RDF_FIRST, head, None))
                cells.append((enc, T.RDF_REST, T.encode_list(tail), None))
                walk(elems[0])
                term = tail  # continue with the suffix cell

        for s_, _p, o_, g_ in facts:
            if g_ is not None:  # same graph filter as the match loop
                continue
            walk(s_)
            walk(o_)
        if facts is self.kb:
            self._list_cells_memo = cells
        return cells

    @staticmethod
    def _index_fact(idx, q: Quad) -> None:
        """Classify one default-graph fact into the (by_pred,
        by_pred_subj, wild) index buckets: wildcard for var/structured
        predicates (unify with anything), the (p, s) probe only for
        plain ground subjects."""
        by_pred, by_pred_subj, wild = idx
        fs, fp = q[0], q[1]
        if is_var(fp) or fp.startswith("("):
            wild.append(q)
            return
        by_pred[fp].append(q)
        if not (is_var(fs) or fs.startswith("(")):
            by_pred_subj[(fp, fs)].append(q)

    @classmethod
    def _build_index(cls, facts: list[Quad]):
        idx = (defaultdict(list), defaultdict(list), [])
        for q in facts:
            if q[3] is None:
                cls._index_fact(idx, q)
        return idx

    def _match_bgp(self, patterns: list[tuple], facts: list[Quad], init: dict):
        return self._match_bgp_multi(patterns, facts, [dict(init)])

    def _match_bgp_multi(self, patterns: list[tuple], facts: list[Quad],
                         solutions: list[dict], idx=None):
        """BGP join over a list of starting solutions: most-bound
        pattern first, with a per-call fact index on predicate and
        (predicate, subject) so each solution only probes
        plausibly-matching facts instead of the whole KB — the
        difference between O(|sols|·|KB|) and ~O(|sols|) per pattern,
        which is what lets 1000-triple closures (the inputs the
        reference's own CI tags SLOW) run in seconds.  Taking the
        starting solutions as a batch keeps the index build a one-time
        cost for semi-naive seeds; `idx` lets a caller reuse an index it
        already built over `facts`."""
        from_kb = facts is self.kb
        if any(p in (T.RDF_FIRST, T.RDF_REST) or is_var(p)
               for _s, p, _o in patterns):
            cells = self._list_cell_facts(facts)
            if cells:
                facts = facts + cells
                from_kb = False  # combined list needs an ad-hoc index
                idx = None
        if idx is None:
            if from_kb:
                # persistent index over the append-only KB, extended
                # incrementally by _insert — never rebuilt per iteration
                idx = self._kb_index
                if idx is None:
                    idx = self._kb_index = self._build_index(self.kb)
            else:
                idx = self._build_index(facts)
        by_pred, by_pred_subj, wild = idx

        loose_memo: dict[str, list[Quad]] = {}

        def candidates(rp, rs):
            if (is_var(rp) or not isinstance(rp, str) or rp.startswith("(")
                    or rp == T.RDF_NIL or self._is_formula_node(rp)):
                # unindexable pattern predicate (var, structured, nil's
                # '()' alias, or formula node): scan everything
                return None
            bucket = by_pred.get(rp, [])
            if (rs is not None and isinstance(rs, str) and not is_var(rs)
                    and not rs.startswith("(") and rs != T.RDF_NIL
                    and not self._is_formula_node(rs)):
                # subject ground and unstructured: (p, s) probe, plus
                # facts whose subject is a var/list (unify may still hit)
                exact = by_pred_subj.get((rp, rs), [])
                loose = loose_memo.get(rp)
                if loose is None:
                    loose = loose_memo[rp] = [
                        q for q in bucket
                        if is_var(q[0]) or q[0].startswith("(")]
                if not loose and not wild:
                    return exact
                return exact + loose + wild
            if not wild:
                return bucket
            return bucket + wild

        remaining = list(patterns)
        while remaining:
            # choose pattern with fewest unbound vars under first solution
            probe = solutions[0] if solutions else {}
            remaining.sort(key=lambda p: input_vars(p[0], p[2], probe) + (0 if not is_var(p[1]) else 1))
            s, p, o = remaining.pop(0)
            nxt = []
            uni = self._unify
            append = nxt.append
            for sol in solutions:
                rp = sol.get(p, p) if is_var(p) else p
                rs = sol.get(s, s) if is_var(s) else s
                cands = candidates(rp, rs)
                if cands is None:
                    cands = [q for q in facts if q[3] is None]
                for fs, fp, fo, fg in cands:
                    # identical GROUND terms unify trivially; vars still
                    # go through _unify so a var meeting its same-named
                    # ground twin binds var-to-var and is dropped by the
                    # formula.rb:154 filter exactly like any other name
                    s1 = (sol if p == fp and p[:1] != "?"
                          else uni(p, fp, sol))
                    if s1 is None:
                        continue
                    s2 = (s1 if s == fs and s[:1] != "?"
                          else uni(s, fs, s1))
                    if s2 is None:
                        continue
                    s3 = (s2 if o == fo and o[:1] != "?"
                          else uni(o, fo, s2))
                    if s3 is not None:
                        append(s3)
            solutions = _uniq(nxt)
            if not solutions:
                return []
        return solutions

    # -- formula structure ----------------------------------------------
    def _formula_patterns(self, g: str | None, graphs) -> tuple[list, list]:
        """Split a formula's statements into (patterns, builtin_ops).

        Mirrors Formula.from_enumerable (formula.rb:28-93): statements
        whose predicate maps to an operator class become sub-ops, the
        rest are patterns; bnodes in quoted graphs become ndvars.
        """
        formula_nodes = {k for k in graphs if k}
        stmts = graphs.get(g, [])
        if g is None:
            # the top graph is append-only and huge in deep fixpoints:
            # resume classification from the cached prefix instead of
            # re-splitting the whole graph every iteration
            cache = getattr(self, "_top_split_cache", None)
            if cache is None or cache[0] > len(stmts):
                cache = (0, [], [])
            start, patterns, ops = cache
        else:
            start, patterns, ops = 0, [], []
        scope = g or "base"
        for s, p, o, _ in stmts[start:]:
            if g is not None:
                s = self._promote(s, scope, formula_nodes)
                o = self._promote(o, scope, formula_nodes)
            pred_iri = T.iri_value(p) if T.is_iri(p) else None
            if pred_iri and (
                pred_iri in REGISTRY
                or pred_iri == T.iri_value(LOG_IMPLIES_IRI)
                or pred_iri in _ENGINE_BUILTINS
                or pred_iri in NOT_IMPLEMENTED
            ):
                ops.append((s, pred_iri, o))
            else:
                patterns.append((s, p, o))
        if g is None:
            self._top_split_cache = (len(stmts), patterns, ops)
        return patterns, ops

    # -- builtin evaluation ----------------------------------------------
    def _eval_op(self, s, pred_iri, o, solutions: list[dict]):
        """Evaluate one sub-op over current solutions; None = no effect
        (op not ready), [] = eliminates all solutions."""
        if pred_iri in NOT_IMPLEMENTED:
            return None
        out, any_effect = [], False
        for sol in solutions:
            if pred_iri in _ENGINE_BUILTINS:
                res = _ENGINE_BUILTINS[pred_iri](self, s, o, sol)
            else:
                res = REGISTRY[pred_iri].evaluate(s, o, sol, self.ctx)
            if res is None:
                out.append(sol)
            else:
                any_effect = True
                out.extend(res)
        if not any_effect:
            return None
        return _uniq(out)

    # -- rule application -------------------------------------------------
    def _antecedent_universals(self, g: str, graphs) -> set:
        pats, ops = self._formula_patterns(g, graphs)
        vars_ = set()
        for s, p, o in pats + [(a, T.iri(b), c) for a, b, c in ops]:
            for t in (s, p, o):
                _collect_vars(t, vars_)
        return {v for v in vars_ if not v.endswith("_undext")}

    def _run_formula(self, g: str | None, graphs, init: dict):
        """Formula#execute: BGP then ranked builtins (formula.rb:121-189)."""
        patterns, ops = self._formula_patterns(g, graphs)
        if g is None:
            # top formula: ground statements trivially match themselves;
            # the var-pattern filter resumes from its cached prefix
            # (patterns is the append-only cached top split)
            n0, bgp = self._top_bgp_cache
            if n0 > len(patterns):
                n0, bgp = 0, []
            for p_ in patterns[n0:]:
                if _has_var(p_):
                    bgp.append(p_)
            self._top_bgp_cache = (len(patterns), bgp)
        else:
            # antecedent: ground patterns must hold in the KB too
            bgp = patterns
        solutions = self._match_bgp(bgp, self.kb, init) if bgp else [dict(init)]
        if not solutions:
            return [], []
        # drop solutions binding variables to variables (formula.rb:154)
        solutions = [s for s in solutions if all(not is_var(v) for v in s.values())]
        rules = [(s, p, o) for s, p, o in ops if p == T.iri_value(LOG_IMPLIES_IRI)]
        others = [(s, p, o) for s, p, o in ops if p != T.iri_value(LOG_IMPLIES_IRI)]
        # NOT_IMPLEMENTED predicates can never evaluate.  The reference
        # RAISES NotImplementedError (algebra.rb:142,178, crashing the
        # run); we tolerate them as inert instead of letting the
        # kill-on-stall rule below zero the formula (documented
        # divergence — a stubbed builtin should not silently falsify).
        remaining = [op_ for op_ in others if op_[1] not in NOT_IMPLEMENTED]
        # ranked evaluation loop (formula.rb:163-186)
        while remaining and solutions:
            remaining.sort(key=lambda op_: input_vars(op_[0], op_[2], solutions[0]))
            progressed = None
            for op_ in remaining:
                res = self._eval_op(op_[0], op_[1], op_[2], solutions)
                if res is None:
                    continue
                solutions = res
                progressed = op_
                break
            if progressed is None:
                # formula.rb:180-184 "unless last_op": no sub-op could
                # evaluate over the current solutions — the formula has
                # NO solutions.  An unprovable builtin (e.g. math:sum
                # on a non-list subject) must falsify the antecedent,
                # never pass through as vacuously true.
                solutions = []
                break
            remaining.remove(progressed)
            if not solutions:
                solutions = []
                break
        return solutions, rules

    def _match_bgp_delta(self, patterns, facts, delta, init: dict):
        """Semi-naive BGP: union over seed positions k of the solutions
        where pattern k matches a fact from `delta` (facts new since the
        previous iteration) and the remaining patterns match the full
        KB.  Any solution built solely from old facts was already found
        in an earlier iteration, so restricting one position to the
        delta loses nothing for monotonic (pure-pattern) rules while
        cutting each iteration from O(|KB|-joins) to O(|delta|-joins)."""
        out = []
        delta_idx = self._build_index(delta)  # shared across seed positions
        for k in range(len(patterns)):
            seeds = self._match_bgp_multi(
                [patterns[k]], delta, [dict(init)], idx=delta_idx)
            if not seeds:
                continue
            rest = patterns[:k] + patterns[k + 1:]
            if not rest:
                out.extend(seeds)
                continue
            out.extend(self._match_bgp_multi(rest, facts, seeds))
        return _uniq(out)

    def _apply_rule(self, ant: str, cons: str, graphs, outer_solutions,
                    delta: list | None = None):
        """log:implies (implies.rb:28-96): query antecedent, keep
        solutions binding all its universals, instantiate consequent.

        `delta` (facts inserted since the previous fixpoint iteration)
        enables semi-naive evaluation for pure-pattern antecedents; any
        rule with builtin sub-ops, or running under non-trivial outer
        bindings, falls back to full evaluation."""
        new_quads = []
        for outer in outer_solutions:
            ant_g = outer.get(ant, ant) if is_var(ant) else ant
            cons_g = outer.get(cons, cons) if is_var(cons) else cons
            if ant_g not in graphs or is_var(ant_g):
                continue
            if delta is not None and not outer:
                pats, ops = self._formula_patterns(ant_g, graphs)
                if pats and not ops:
                    seeded = self._match_bgp_delta(pats, self.kb, delta, {})
                    # same var-var drop as _run_formula (formula.rb:154)
                    solutions = [s for s in seeded
                                 if all(not is_var(v) for v in s.values())]
                else:
                    solutions, _ = self._run_formula(ant_g, graphs, outer)
            else:
                solutions, _ = self._run_formula(ant_g, graphs, outer)
            universals = self._antecedent_universals(ant_g, graphs)
            solutions = [
                s for s in solutions if all(v in s for v in universals)
            ]
            for sol in solutions:
                new_quads.extend(self._instantiate(cons_g, graphs, sol))
        return _uniq_quads(new_quads)

    def _instantiate(self, g: str, graphs, sol: dict, target_graph: str | None = None):
        """Materialize a consequent formula under a solution.

        Unbound existential vars are interned as bnodes by label
        (formula.rb:236-244); nested formulae are re-instantiated under
        fresh graph ids (deep_dup semantics, formula.rb:99-107).
        """
        if g not in graphs:
            return []
        # `graphs` is the live (incrementally-extended) memo, so graphs
        # created DURING this iteration by engine builtins
        # (conjunction/parsedAsN3/conclusion) are already in it —
        # formula_nodes covers every quoted graph, old or new
        formula_nodes = {k for k in graphs if k}
        bound_formulae: set[str] = set()

        def inst_formula(fg: str) -> tuple[str, list]:
            """Recursively instantiate nested formula `fg`; returns
            (content-hashed id, quads).  Deterministic ids make
            re-instantiation at the next think iteration a no-op, so
            the fixed point converges (deep_dup's operand-hash naming,
            formula.rb:99-107)."""
            inner: list[tuple] = []
            extra: list = []
            for s, p, o, _ in graphs.get(fg, []):
                ns, ne = subst(s, fg)
                np, pe = subst(p, fg)
                no_, oe = subst(o, fg)
                inner.append((ns, np, no_))
                extra.extend(ne + pe + oe)
            new_id = _content_graph_id("inf", inner)
            quads = [(s, p, o, new_id) for s, p, o in inner] + extra
            return new_id, quads

        def subst(t, scope):
            """Returns (term, extra_quads_from_nested_formulae)."""
            if isinstance(t, str) and T.is_bnode(t):
                if t in formula_nodes:
                    return inst_formula(t)
                t = f"?{T.bnode_label(t)}_{scope}_undext"
            if is_var(t):
                if t in sol:
                    v = sol[t]
                    # a solution binding a formula carries that formula's
                    # statements along (formula.rb:236-258 form_statements)
                    if isinstance(v, str) and v in formula_nodes:
                        bound_formulae.add(v)
                    return v, []
                if t.endswith("_undext"):
                    # unbound EXISTENTIALS intern as bnodes by label
                    # (formula.rb:236-244); universals pass through
                    return T.bnode(t[1:]), []
                return t, []
            if isinstance(t, str) and T.is_list_term(t):
                parts = []
                acc: list = []
                for e in T.parse_list_term(t):
                    v, ex = subst(e, scope)
                    parts.append(v)
                    acc.extend(ex)
                return T.encode_list(parts), acc
            return t, []

        out = []
        scope = g or "base"
        for s, p, o, _ in graphs.get(g, []):
            ns, se = subst(s, scope)
            np, pe = subst(p, scope)
            no_, oe = subst(o, scope)
            out.append((ns, np, no_, target_graph))
            out.extend(se + pe + oe)
        # emit referenced-formula contents (recursively), graph ids kept
        emitted = set()
        stack = list(bound_formulae)
        while stack:
            fg = stack.pop()
            if fg in emitted:
                continue
            emitted.add(fg)
            fq = graphs.get(fg) or []
            for s, p, o, _ in fq:
                out.append((s, p, o, fg))
                for t in (s, o):
                    if t in formula_nodes and t not in emitted:
                        stack.append(t)
        return out

    # -- main loop --------------------------------------------------------
    def reason(self, think: bool = False, max_iterations: int = 100) -> ReasonResult:
        iterations = 0
        count = -1
        prev_top_len: int | None = None  # KB size at the previous
        # iteration's start; facts past it are that iteration's delta
        seen_rules: set[tuple] = set()  # rules that have run full once
        while len(self.kb) > count and iterations < max_iterations:
            count = len(self.kb)
            iterations += 1
            graphs = self._graphs()
            delta = (self.kb[prev_top_len:]
                     if prev_top_len is not None else None)
            prev_top_len = len(self.kb)
            solutions, rules = self._run_formula(None, graphs, {})
            # inferred statements from rules — collected first, inserted
            # after all rules ran, so rule consequents land between
            # iterations (kb << formula happens after formula.execute,
            # reasoner.rb:137-139).  NOTE: `graphs` is the LIVE memo,
            # not a frozen snapshot — engine builtins that insert
            # mid-iteration (parsedAsN3/conjunction/conclusion) are
            # visible to later antecedents in the same iteration, as
            # they already were via self.kb in _match_bgp; anything that
            # truly needs a frozen view must copy
            new_inferred = []
            for ant, _, cons in rules:
                rid = (ant, cons)
                # a rule first seen this iteration (including every rule
                # on iteration 1, and rules derived by other rules) must
                # run against the whole KB once before going semi-naive
                d = delta if rid in seen_rules else None
                seen_rules.add(rid)
                new_inferred.extend(
                    self._apply_rule(ant, cons, graphs, solutions or [{}],
                                     delta=d)
                )
            for q in new_inferred:
                self._insert(q, inferred=True)
            # top-formula patterns instantiated under solutions
            # (formula#each via `kb << formula`, reasoner.rb:139)
            patterns, _ = self._formula_patterns(None, graphs)
            for sol in solutions:
                if not sol:
                    continue
                for s, p, o in patterns:
                    if not _has_var((s, p, o)):
                        continue
                    ns = sol.get(s, s) if is_var(s) else s
                    np = sol.get(p, p) if is_var(p) else p
                    no = sol.get(o, o) if is_var(o) else o
                    if not any(is_var(t) for t in (ns, np, no)):
                        self._insert((ns, np, no, None))
            if not think:
                break
        strings = "".join(
            "".join(v) for _, v in sorted(self.ctx.strings.items())
        )
        return ReasonResult(
            quads=list(self.kb),
            inferred=list(self.inferred),
            strings=strings,
            iterations=iterations,
        )


# ---------------------------------------------------------------------------
# engine-level log: builtins (need formula/KB access)
# ---------------------------------------------------------------------------

def _includes(engine: Engine, s, o, sol, negate=False):
    """log:includes / notIncludes — formula A matched by patterns of B
    (log/includes.rb:10-69, not_includes.rb:9-27)."""
    s_g = sol.get(s, s) if is_var(s) else s
    o_g = sol.get(o, o) if is_var(o) else o
    graphs = engine._graphs()
    if is_var(s_g) or s_g not in graphs or o_g not in graphs:
        return None
    patterns, _ = engine._formula_patterns(o_g, graphs)
    facts = [(a, b, c, None) for a, b, c, _ in graphs.get(s_g, [])]
    solns = engine._match_bgp(patterns, facts, sol)
    if negate:
        return [sol] if not solns else []
    return _uniq(solns) if solns else []


def _formula_object_check(engine: Engine, new_g: str, o, sol):
    """Ground-object case of formula-producing builtins (ResourceOperator
    semantics, resource_operator.rb:19-71): the computed formula must
    match the bound object's formula by graph isomorphism — keep the
    solution on match, eliminate it otherwise (returning None here would
    leave the op "not ready" forever after its side effects ran)."""
    o_v = sol.get(o, o) if is_var(o) else o
    if is_var(o_v):
        return [{**sol, o_v: new_g}]
    from ..isomorphism import isomorphic

    graphs = engine._graphs()
    if o_v not in graphs:
        return []
    mine = [(a, b, c, None) for a, b, c, _ in graphs.get(new_g, [])]
    theirs = [(a, b, c, None) for a, b, c, _ in graphs[o_v]]
    return [sol] if isomorphic(mine, theirs) else []


def _conjunction(engine: Engine, s, o, sol):
    """log:conjunction — merge formulae list into one formula
    (log/conjunction.rb:17-36)."""
    from .builtins import _to_list

    lst = _to_list(s, sol, engine.ctx)
    if lst is None:
        return None
    graphs = engine._graphs()
    merged = []
    for f in lst:
        if f not in graphs:
            return None
        merged.extend((a, b, c) for a, b, c, _ in graphs[f])
    # deterministic content-hashed id: re-evaluation at the next think
    # iteration reuses the same formula, so the fixed point converges
    new_g = _content_graph_id("conj", merged)
    for a, b, c in dict.fromkeys(merged):
        engine._insert((a, b, c, new_g))
    if is_var(o):
        return [{**sol, o: new_g}]
    return _formula_object_check(engine, new_g, o, sol)


def _reachable_quads(graphs: dict, s_g: str) -> list:
    """Quads of formula `s_g` plus every formula reachable through its
    terms: the root's quads land in the default graph, nested formulae
    keep their graph label (so the writer renders nested { ... })."""
    out = []
    stack = [s_g]
    seen: set = set()
    while stack:
        g = stack.pop()
        if g in seen:
            continue
        seen.add(g)
        for a, b, c, _ in graphs.get(g, []):
            out.append((a, b, c, None if g == s_g else g))
            for t in (a, c):
                if t in graphs and t not in seen:
                    stack.append(t)
    return out


def _n3string(engine: Engine, s, o, sol):
    """log:n3String — serialize formula via the Writer (log/n3_string.rb).
    Nested formulae are included transitively: serializing only the
    direct quads would render inner {A}=>{B} terms as empty formulae."""
    from ..serializer.n3_writer import serialize_n3

    s_g = sol.get(s, s) if is_var(s) else s
    graphs = engine._graphs()
    if s_g not in graphs:
        return None
    text = serialize_n3(_reachable_quads(graphs, s_g))
    lit = T.literal(text)
    if is_var(o):
        return [{**sol, o: lit}]
    return [sol] if lit == o else []


def _parsed_as_n3(engine: Engine, s, o, sol):
    """log:parsedAsN3 — parse a literal via the Reader
    (log/parsed_as_n3.rb:21)."""
    from ..parser.n3_parser import parse_n3
    from .builtins import string_value

    s_v = sol.get(s, s) if is_var(s) else s
    if is_var(s_v) or not (isinstance(s_v, str) and T.is_literal(s_v)):
        return None
    # inner parse inherits the outer document's base (parsed_as_n3.rb:21
    # merges @options, which carry base_uri) — without it the parsed
    # formula's relative IRIs stay relative and never unify
    result = parse_n3(string_value(s_v), list_terms=True,
                      base_uri=engine.ctx.base_uri)
    new_g = _content_graph_id("parsed", [(a, b, c) for a, b, c, _ in result.quads])

    def remap(t):
        # parser-local formula ids (_:_form_N) would collide with the
        # outer document's own formulae — prefix them with the content id
        if isinstance(t, str) and t.startswith("_:_form_"):
            return f"_:{new_g[2:]}_{t[2:]}"
        return t

    for a, b, c, g in result.quads:
        gg = remap(g) if g is not None else new_g
        engine._insert((remap(a), b, remap(c), gg))
    if is_var(o):
        return [{**sol, o: new_g}]
    return _formula_object_check(engine, new_g, o, sol)


def _conclusion(engine: Engine, s, o, sol):
    """log:conclusion — deductive closure of the subject formula
    (log/conclusion.rb: nested Reasoner with think: true)."""
    s_g = sol.get(s, s) if is_var(s) else s
    graphs = engine._graphs()
    if s_g not in graphs:
        return None
    # formula contents + anything reachable (nested formulae)
    sub_quads = _reachable_quads(graphs, s_g)
    # the nested reasoner inherits clock, fetcher AND base: a rule
    # inside the subject formula may itself use parsedAsN3/content
    nested = Engine(sub_quads, ctx=EvalContext(
        now=engine.ctx.now, fetcher=engine.ctx.fetcher,
        base_uri=engine.ctx.base_uri))
    closure = nested.reason(think=True)
    new_g = _content_graph_id("concl", [(a, b, c) for a, b, c, g in closure.quads])
    for a, b, c, g in closure.quads:
        engine._insert((a, b, c, new_g if g is None else g))
    if is_var(o):
        return [{**sol, o: new_g}]
    return _formula_object_check(engine, new_g, o, sol)


def _resource_to_path(term) -> str | None:
    """file:// IRI -> local filesystem path.

    DELIBERATE DIVERGENCE from the reference: its ResourceOperator
    resolve() (log/content.rb:20-33) accepts `resource.literal? ||
    resource.uri?`, i.e. a plain string literal is also dereferenced as
    a path.  Here only IRIs are dereferenceable — a security hardening
    so data-driven rules cannot read arbitrary local files via literal
    subjects.  Reference-suite cases exercising literal-path
    log:content/log:semantics will therefore (intentionally) not bind;
    see SURVEY.md §2.1 parity notes.  http(s) is also unsupported (no
    network in this engine's deployment)."""
    if isinstance(term, str) and T.is_iri(term):
        v = T.iri_value(term)
        if v.startswith("file://"):
            from urllib.parse import unquote, urlsplit

            return unquote(urlsplit(v).path)
    return None


def _fetch_text(engine: Engine, s_v) -> tuple[str, str] | None:
    """Dereference an IRI term to (text, base_uri) for
    log:content/log:semantics.  An injected ctx.fetcher (EvalContext)
    takes precedence and may support any scheme — the seam that
    restores the reference's web dereference (log/content.rb:20-33)
    in networked deployments; otherwise only file:// resolves."""
    fetcher = getattr(engine.ctx, "fetcher", None)
    if fetcher is not None and isinstance(s_v, str) and T.is_iri(s_v):
        iri = T.iri_value(s_v)
        try:
            text = fetcher(iri)
        except Exception:
            # a web fetcher naturally raises on schemes it does not
            # speak (file://) or transient errors — fall THROUGH to the
            # local file path rather than disabling it
            text = None
        if text is not None:
            return text, iri
    path = _resource_to_path(s_v)
    if path is None:
        return None
    try:
        with open(path, encoding="utf-8") as f:
            return f.read(), T.iri_value(s_v)
    except OSError:
        return None


def _content(engine: Engine, s, o, sol):
    """log:content — resource's contents as a string literal
    (log/content.rb:20-33; file:// or injected fetcher)."""
    s_v = sol.get(s, s) if is_var(s) else s
    fetched = _fetch_text(engine, s_v)
    if fetched is None:
        return None
    lit = T.literal(fetched[0])
    if is_var(o):
        return [{**sol, o: lit}]
    return [sol] if lit == o else []


def _semantics(engine: Engine, s, o, sol):
    """log:semantics — parse the resource into a formula
    (log/semantics.rb:21-40; file:// or injected fetcher)."""
    from ..parser.n3_parser import parse_n3

    s_v = sol.get(s, s) if is_var(s) else s
    fetched = _fetch_text(engine, s_v)
    if fetched is None:
        return None
    text, base_uri = fetched
    result = parse_n3(text, base_uri=base_uri, list_terms=True)
    if result.errors:
        return None
    new_g = _content_graph_id(
        "sem", [(a, b, c) for a, b, c, _ in result.quads])

    def remap(t):
        if isinstance(t, str) and t.startswith("_:_form_"):
            return f"_:{new_g[2:]}_{t[2:]}"
        return t

    for a, b, c, g in result.quads:
        gg = remap(g) if g is not None else new_g
        engine._insert((remap(a), b, remap(c), gg))
    if is_var(o):
        return [{**sol, o: new_g}]
    return _formula_object_check(engine, new_g, o, sol)


_ENGINE_BUILTINS = {
    LOG + "includes": lambda e, s, o, sol: _includes(e, s, o, sol),
    LOG + "notIncludes": lambda e, s, o, sol: _includes(e, s, o, sol, negate=True),
    LOG + "conjunction": _conjunction,
    LOG + "n3String": _n3string,
    LOG + "parsedAsN3": _parsed_as_n3,
    LOG + "conclusion": _conclusion,
    LOG + "content": _content,
    LOG + "semantics": _semantics,
}


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _content_graph_id(kind: str, triples) -> str:
    """Deterministic formula node from content (deep_dup's hash-renaming,
    formula.rb:99-107, made stable across runs)."""
    import hashlib

    h = hashlib.sha1(
        "\x00".join(sorted("|".join(t) for t in triples)).encode()
    ).hexdigest()[:12]
    return f"_:{kind}_form_{h}"


def _has_var(triple) -> bool:
    found = set()
    for t in triple:
        _collect_vars(t, found)
        if found:
            return True
    return False


def _collect_vars(t, out: set):
    if isinstance(t, str):
        if is_var(t):
            out.add(t)
        elif T.is_list_term(t):
            for e in T.parse_list_term(t):
                _collect_vars(e, out)
    elif isinstance(t, list):
        for e in t:
            _collect_vars(e, out)


def _uniq(solutions: list[dict]) -> list[dict]:
    seen, out = set(), []
    for s in solutions:
        key = tuple(sorted((k, str(v)) for k, v in s.items()))
        if key not in seen:
            seen.add(key)
            out.append(s)
    return out


def _uniq_quads(quads: list[Quad]) -> list[Quad]:
    seen, out = set(), []
    for q in quads:
        if q not in seen:
            seen.add(q)
            out.append(q)
    return out


def reason(quads: list[Quad], think: bool = False,
           ctx: EvalContext | None = None,
           max_iterations: int = 100) -> ReasonResult:
    """Run the reasoner over parsed quads (Reasoner#execute,
    reasoner.rb:112-148)."""
    return Engine(quads, ctx=ctx).reason(
        think=think, max_iterations=max_iterations)


def reason_n3(text: str, think: bool = False, base_uri: str | None = None,
              legacy: bool = False,
              max_iterations: int = 100,
              fetcher=None) -> ReasonResult:
    """Parse (list_terms mode, as the reference CLI does —
    format.rb:49) then reason.  ``legacy`` opts into the cwm-era
    @forAll/@forSome/@keywords directives (parse_n3 docstring);
    ``max_iterations`` bounds the fixpoint (deep closures like an
    n-node chain need n iterations); ``fetcher`` plugs web dereference
    for log:content/log:semantics (sources/webfetch.urllib_fetcher is
    the stdlib-only ready-made)."""
    from ..parser.n3_parser import parse_n3

    r = parse_n3(text, base_uri=base_uri, list_terms=True, legacy=legacy)
    result = reason(r.quads, think=think, max_iterations=max_iterations,
                    ctx=EvalContext(base_uri=base_uri, fetcher=fetcher))
    result.prefixes = dict(r.prefixes)
    return result
