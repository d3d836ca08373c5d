"""Recursive-descent N3/Turtle/N-Triples parser.

Reimplements the grammar productions of the reference reader
(/root/reference/lib/rdf/n3/reader.rb:218-900, EBNF at
/root/reference/etc/n3.ebnf) as a pure function over a token list:
``parse_n3(text, ...) -> ParseResult`` with quads encoded as N-Triples
lexical strings (see rdf_n3_ray.terms).

Faithfulness notes (each maps to a reference behavior):
- verb sugar `a`/`has`/`is..of`/`<-`/`<=`/`=>`/`=` incl. inversion
  (reader.rb:392-420)
- paths `!`/`^` with chained bnode allocation (reader.rb:431-458,702-719)
- literal lexical-quirk canonicalization: leading-"." decimals get "0"
  prefixed, ".E" doubles get ".0E" (reader.rb:466-507)
- collections: `list_terms` mode yields a first-class list term,
  otherwise an rdf:first/rdf:rest ladder is emitted
  (reader.rb:560-583, list.rb:389-411)
- formulae `{}` named `_form_<n>` by an incrementing uniquifier; inner
  statements carry graph_name = formula node (reader.rb:592-645)
- deterministic bnode labels `b0,b1,...` allocated from a Ruby-succ
  labeler, labeled bnodes interned per formula scope (reader.rb:743-758)
- quickvars `?x` are document-scoped universals (reader.rb:681-689)
- directives mutate a document-global prefix/base environment;
  `@prefix` must be '.'-terminated, SPARQL `PREFIX` must not
  (reader.rb:258-303); operator namespaces preseeded (reader.rb:105-117)

This is a pure function: no I/O, no globals mutated — safe to run in
parallel inside Ray map_batches workers and deterministic under retry.
"""
from __future__ import annotations

import re
from dataclasses import dataclass, field
from urllib.parse import urljoin

from .. import terms as T
from .lexer import LexerError, Token, tokenize

# preseeded operator namespaces (reader.rb:105-117)
# XSD lexical spaces checked in validate mode (RDF::Literal#valid?
# equivalents for the datatypes the reference's validation spec covers)
_LEXICAL_RES = {
    "http://www.w3.org/2001/XMLSchema#integer": re.compile(r"[+-]?\d+"),
    "http://www.w3.org/2001/XMLSchema#decimal":
        re.compile(r"[+-]?(\d+(\.\d*)?|\.\d+)"),
    "http://www.w3.org/2001/XMLSchema#double":
        re.compile(r"[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?|[+-]?INF|NaN"),
    "http://www.w3.org/2001/XMLSchema#boolean":
        re.compile(r"true|false|1|0"),
}

_SEED_PREFIXES = {
    "rdf": T.RDF_NS,
    "rdfs": T.RDFS_NS,
    "xsd": T.XSD_NS,
    "crypto": T.CRYPTO_NS,
    "list": T.LIST_NS,
    "log": T.LOG_NS,
    "math": T.MATH_NS,
    "rei": T.REI_NS,
    "time": T.TIME_NS,
}

_PN_LOCAL_ESC_RE = re.compile(r"\\([_~\.\-\!\$&'\(\)\*\+,;=/\?#@%])")

Quad = tuple[str, str, str, str | None]


class ParseError(Exception):
    def __init__(self, message: str, token: Token | None = None):
        super().__init__(message)
        self.token = token


@dataclass
class ParseResult:
    quads: list[Quad] = field(default_factory=list)
    errors: list[str] = field(default_factory=list)
    prefixes: dict[str | None, str] = field(default_factory=dict)
    # every formula node minted for this document (including EMPTY `{}`
    # formulae, which have no quads) — pass to the writer as
    # `formula_labels=` so round-trips never misread a user-authored
    # `_:x_form_y` bnode as a formula (ADVICE r2)
    formula_labels: set = field(default_factory=set)

    @property
    def ok(self) -> bool:
        return not self.errors


class ListTerm(tuple):
    """First-class list term (``list_terms`` mode) — a tuple of encoded
    terms; rendered `( a b c )` when placed in a statement slot.
    Mirrors RDF::N3::List used as a term (list.rb:6-88)."""

    def encode(self) -> str:
        return "(" + " ".join(
            e.encode() if isinstance(e, ListTerm) else e for e in self
        ) + ")"


def encode_term(t) -> str:
    return t.encode() if isinstance(t, ListTerm) else t


# Legacy-cwm directives (opt-in `legacy=True` extension; the reference
# grammar has no production for these and rejects them, as do we by
# default — pinned NegativeSyntax in tests/fixtures/n3_suite.py).
_LEGACY_DIRECTIVES = frozenset({"@forAll", "@forSome", "@keywords"})
# Words with a syntactic role that `@keywords` may list (cwm accepts any
# of its keyword set; these are the ones with dedicated terminals here).
_SYNTAX_WORDS = frozenset({"a", "is", "of", "has", "true", "false"})


class N3Parser:
    def __init__(
        self,
        text: str,
        base_uri: str | None = None,
        prefixes: dict[str | None, str] | None = None,
        list_terms: bool = False,
        validate: bool = False,
        canonicalize: bool = False,
        anon_base: str = "b0",
        legacy: bool = False,
    ):
        self.validate = validate
        self.canonicalize = canonicalize
        self.list_terms = list_terms
        # Opt-in legacy-cwm extension (NOT in the reference grammar —
        # reader.rb rejects these, and so do we when legacy=False):
        # @forAll/@forSome quantifier directives and @keywords bareword
        # mode, needed to run the cwm-era goldens the reference ships
        # but skips (examples/{list,unify,includes,reason}/*).
        self.legacy = legacy
        self.keywords: set[str] | None = None  # None = barewords invalid
        self.quant_scopes: list[dict[str, str]] = [{}]  # iri -> var/bnode
        self.quant_starts: list[int] = [0]  # result.quads index at scope open
        self.base_uri = base_uri
        self.result = ParseResult()
        self.prefixes: dict[str | None, str] = {}
        if not validate:
            self.prefixes.update(_SEED_PREFIXES)
        if prefixes:
            self.prefixes.update(prefixes)
        if base_uri:
            self.prefixes[None] = (
                base_uri if base_uri[-1] in "#/" else base_uri + "#"
            )
        # bnode machinery (reader.rb:92-98,743-758)
        self.formulae: list[str] = []
        self.label_uniquifier = "0"
        self.bnodes: set[str] = set()
        self.bn_labler = anon_base
        self.bn_mapper: dict[str, dict[str, str]] = {}
        self.variables: dict[str, str] = {}

        try:
            self.tokens, lex_errors = tokenize(text, recover=not validate)
            self.result.errors.extend(lex_errors)
        except LexerError as e:
            raise ParseError(str(e)) from e
        self.pos = 0

    # --- token stream helpers ----------------------------------------
    def first(self) -> Token | None:
        return self.tokens[self.pos] if self.pos < len(self.tokens) else None

    def shift(self) -> Token | None:
        tok = self.first()
        if tok is not None:
            self.pos += 1
        return tok

    def error(self, message: str, token: Token | None = None) -> None:
        """Record an error; raise in validate mode OR to trigger recovery."""
        raise ParseError(message, token)

    def soft_error(self, message: str) -> None:
        """An error the reference logs without aborting the production
        (e.g. terminator/downcase style violations, undefined prefixes
        outside validate mode)."""
        if self.validate:
            raise ParseError(message)
        self.result.errors.append(message)

    # --- public entry -------------------------------------------------
    def parse(self) -> ParseResult:
        # [1] n3Doc ::= (n3Statement '.' | sparqlDirective)*   (reader.rb:218-235)
        while self.first() is not None:
            try:
                tok = self.first()
                if tok.type in ("BASE", "PREFIX"):
                    self.read_directive()
                elif (self.legacy and tok.type == "LANGTAG"
                      and tok.value in _LEGACY_DIRECTIVES):
                    self.read_legacy_directive()
                else:
                    self.read_n3Statement()
                    dot = self.shift()
                    if dot is None or dot.value != ".":
                        self.error("Expected '.' following n3Statement", dot)
            except ParseError as e:
                self.result.errors.append(str(e))
                if self.validate:
                    break
                self._recover({"."})
        # document-level legacy quantifiers apply to the whole document
        # (retroactive, like cwm's formula-scoped @forAll/@forSome)
        self._apply_quant_scope(self.quant_scopes[0], 0)
        self.result.prefixes = dict(self.prefixes)
        return self.result

    def _recover(self, follow: set[str]) -> None:
        """Skip tokens until one of `follow`, then consume it
        (reader.rb:848-900 follow-set recovery, simplified to the
        document/formula level)."""
        while (tok := self.first()) is not None:
            self.pos += 1
            if tok.value in follow and tok.type is None:
                return

    # --- productions ---------------------------------------------------
    def read_n3Statement(self) -> None:
        # [2] n3Statement ::= n3Directive | triples  (reader.rb:243-252)
        if self.first() is None:
            self.error("Unexpected end of file")
        self.read_triples()

    def read_directive(self) -> None:
        # [3] n3Directive ::= prefixID | base  (reader.rb:258-303)
        token = self.first()
        if token.type == "BASE":
            self.shift()
            terminated = token.value.startswith("@")  # @Base et al.
            # are still the terminated form (reader.rb:258-303 only logs
            # a downcase warning)
            iri_tok = self.shift()
            if iri_tok is None or iri_tok.type != "IRIREF":
                self.error("Expected IRIREF", iri_tok)
            new_base = self.process_iri(re.sub(r"\s", "", iri_tok.value[1:-1]))
            self.base_uri = T.iri_value(new_base)
            self.prefixes[None] = (
                self.base_uri
                if self.base_uri.endswith("#")
                else self.base_uri + "#"
            )
            if token.value.startswith("@") and token.value != "@base":
                self.soft_error(f"{token.value} should be downcased")
            self._directive_terminator(terminated, token)
        elif token.type == "PREFIX":
            self.shift()
            terminated = token.value.startswith("@")
            pfx, iri_tok = self.shift(), self.shift()
            if pfx is None or pfx.type not in ("PNAME_NS",):
                self.error("Expected PNAME_NS", pfx)
            if iri_tok is None or iri_tok.type != "IRIREF":
                self.error("Expected IRIREF", iri_tok)
            ns_iri = self.process_iri(re.sub(r"\s", "", iri_tok.value[1:-1]))
            self.namespace(pfx.value[:-1] or None, T.iri_value(ns_iri))
            if token.value.startswith("@") and token.value != "@prefix":
                self.soft_error(f"{token.value} should be downcased")
            self._directive_terminator(terminated, token)

    def read_legacy_directive(self) -> None:
        """Legacy-cwm `@forAll` / `@forSome` / `@keywords` (opt-in via
        ``legacy=True``; cwm notation3.py semantics).  The reference
        reader rejects all three (no production in reader.rb / the N3 CG
        grammar), which stays our default behavior.

        - ``@forAll :x, :y.``  — listed IRIs become universal variables
          scoped to the current formula (document scope at top level).
        - ``@forSome :x.``     — listed IRIs become existentials (blank
          nodes) scoped to the current formula.
        - ``@keywords a, is, of.`` — enables bareword mode: barewords are
          default-namespace names; only the listed words keep their
          syntactic role.

        Known simplification: an ``@forAll :x`` universal and a ``?x``
        quickvar share one name space (both become ``?x``), mirroring
        the N3 shorthand reading of ``?x`` as a document universal; cwm
        distinguishes them when the declared prefix differs from the
        document namespace.
        """
        directive = self.shift()  # the LANGTAG token
        kind = directive.value
        if kind == "@keywords":
            words: list[str] = []
            tok = self.first()
            while tok is not None and not (tok.type is None and tok.value == "."):
                if tok.type == "BAREWORD" or tok.type in ("PREFIX", "BASE") or (
                    tok.type is None and tok.value in _SYNTAX_WORDS
                ):
                    # PREFIX/BASE: `@keywords a, prefix.` lists the word
                    # `prefix`, which lexes as the directive terminal
                    words.append(tok.value)
                    self.shift()
                else:
                    self.error("Expected keyword name in @keywords", tok)
                nxt = self.first()
                if nxt is not None and nxt.type is None and nxt.value == ",":
                    self.shift()
                    tok = self.first()
                    continue
                break
            dot = self.shift()
            if dot is None or dot.type is not None or dot.value != ".":
                self.error("Expected '.' terminating @keywords", dot)
            self.keywords = set(words)
            return
        # @forAll / @forSome: comma-separated iri list, '.'-terminated
        iris: list[str] = []
        while True:
            tok = self.first()
            if tok is None:
                self.error(f"Unexpected end of file in {kind}", tok)
            if tok.type == "IRIREF":
                self.shift()
                iri_ = self.process_iri(re.sub(r"\s+", "", tok.value[1:-1]))
            elif tok.type in ("PNAME_LN", "PNAME_NS"):
                self.shift()
                iri_ = self.process_pname(tok.value)
            elif tok.type == "BAREWORD" and self.keywords is not None:
                self.shift()
                iri_ = self.ns(None, tok.value)
            else:
                self.error(f"Expected IRI in {kind} list", tok)
            iris.append(iri_)
            nxt = self.first()
            if nxt is not None and nxt.type is None and nxt.value == ",":
                self.shift()
                continue
            break
        dot = self.shift()
        if dot is None or dot.type is not None or dot.value != ".":
            self.error(f"Expected '.' terminating {kind}", dot)
        scope = self.quant_scopes[-1]
        for iri_ in iris:
            if kind == "@forAll":
                local = re.split(r"[#/]", iri_.strip("<>"))[-1] or "v"
                name = local
                n = 1
                while name in self.variables:
                    name = f"{local}_{n}"
                    n += 1
                self.variables[name] = T.var(name)
                scope[iri_] = self.variables[name]
            else:  # @forSome -> existential in the current formula
                scope[iri_] = self.bnode()

    def _directive_terminator(self, terminated: bool, token: Token) -> None:
        nxt = self.first()
        if terminated:
            if nxt is None or nxt.value != ".":
                self.error(f"Expected {token.value} to be terminated", nxt)
            self.shift()
        elif nxt is not None and nxt.value == "." and nxt.type is None:
            self.error(f"Expected {token.value} not to be terminated", nxt)

    def read_triples(self) -> None:
        # [9] triples ::= subject predicateObjectList?  (reader.rb:311-327)
        token = self.first()
        if token is None:
            self.error("Unexpected end of file")
        if token.type == "IPLSTART":
            subject = self.read_iriPropertyList()
        elif token.value == "[" and token.type is None:
            subject = self.read_blankNodePropertyList()
        else:
            subject = self.read_path()
            if subject is None:
                self.error("Failed to parse subject", token)
        self.read_predicateObjectList(subject)

    def read_predicateObjectList(self, subject) -> None:
        # [10] predicateObjectList ::= verb objectList (';' (verb objectList)?)*
        # (reader.rb:336-352)
        tok = self.first()
        if tok is None or (tok.type is None and tok.value in (".", "}")):
            return
        while True:
            verb, invert = self.read_verb()
            if verb is None:
                break
            self.read_objectList(subject, verb, invert)
            tok = self.first()
            if tok is None or tok.value != ";" or tok.type is not None:
                break
            while (tok := self.first()) is not None and tok.value == ";" and tok.type is None:
                self.shift()
            tok = self.first()
            if tok is None or (tok.type is None and tok.value in (".", "}", "]", ")")):
                break

    def read_objectList(self, subject, predicate, invert: bool) -> None:
        # [11] objectList ::= object (',' object)*  (reader.rb:360-377)
        # Each ',' must be followed by exactly one object: `:o ,, :q`
        # and a trailing `, .` are syntax errors.
        while True:
            obj = self.read_path()
            if obj is None:
                self.error("Expected objectList", self.first())
            if invert:
                self.add_statement(obj, predicate, subject)
            else:
                self.add_statement(subject, predicate, obj)
            tok = self.first()
            if tok is None or tok.value != "," or tok.type is not None:
                break
            self.shift()

    def read_verb(self) -> tuple[str | None, bool]:
        # [12] verb  (reader.rb:392-420)
        token = self.first()
        if token is None:
            self.error("Unexpected end of file")
        v = token.value if token.type is None else None
        if self.legacy and token.type == "LANGTAG" and token.value == "@a":
            # cwm escape form: `@a` is always rdf:type, even when
            # @keywords stripped bare `a` of its syntactic role
            self.shift()
            return T.RDF_TYPE, False
        if self.legacy and token.type == "KWESC" and token.value == "@has":
            # cwm escape form of the `has` verb (notation3.py keyword
            # escapes; exercised by N3Tests cwm_list/last.n3)
            self.shift()
            return self.read_path(), False
        if self.legacy and token.type == "KWESC" and token.value == "@is":
            # cwm escape form of `is ... of` (accepts `of` or `@of`)
            self.shift()
            verb = self.read_path()
            nxt = self.first()
            if nxt is None or not (
                    (nxt.type is None and nxt.value == "of")
                    or (nxt.type == "LANGTAG" and nxt.value == "@of")):
                self.error("Expected 'of'", nxt)
            self.shift()
            return verb, True
        if (self.keywords is not None and v in ("a", "has", "is")
                and v not in self.keywords):
            # @keywords mode with this word undeclared: it is a plain
            # default-namespace name, not syntax (cwm semantics)
            v = None
        if v == "a":
            self.shift()
            return T.RDF_TYPE, False
        if v == "has":
            self.shift()
            return self.read_path(), False
        if v == "is":
            self.shift()
            verb = self.read_path()
            nxt = self.first()
            if nxt is None or nxt.value != "of":
                self.error("Expected 'of'", nxt)
            self.shift()
            return verb, True
        if v == "<-":
            self.shift()
            return self.read_path(), True
        if v == "<=":
            self.shift()
            return T.LOG_IMPLIES, True
        if v == "=>":
            self.shift()
            return T.LOG_IMPLIES, False
        if v == "=":
            self.shift()
            return T.OWL_SAMEAS, False
        return self.read_path(), False

    def read_path(self):
        # [17] path ::= pathItem ('!' path | '^' path)?  (reader.rb:431-458)
        tok = self.first()
        if tok is None or (tok.type is None and tok.value in (".", "}", ")", "]")):
            return None
        # build the chain then emit with process_path semantics (reader.rb:702-719)
        pathitem = self.read_pathItem()
        if pathitem is None:
            return None
        while (tok := self.first()) is not None and tok.type is None and tok.value in ("!", "^"):
            direction = "forward" if self.shift().value == "!" else "reverse"
            nxt = self.read_pathItem()
            if nxt is None:
                self.error("Expected pathItem after path operator", self.first())
            bn = self.bnode()
            if direction == "reverse":
                self.add_statement(bn, nxt, pathitem)
            else:
                self.add_statement(pathitem, nxt, bn)
            pathitem = bn
        return pathitem

    def read_pathItem(self):
        # (reader.rb:437-447)
        r = self.read_iri()
        if r is not None:
            return r
        r = self.read_blankNode()
        if r is not None:
            return r
        r = self.read_quickVar()
        if r is not None:
            return r
        r = self.read_collection()
        if r is not None:
            return r
        r = self.read_blankNodePropertyList()
        if r is not None:
            return r
        r = self.read_iriPropertyList()
        if r is not None:
            return r
        r = self.read_literal()
        if r is not None:
            return r
        return self.read_formula()

    def read_literal(self):
        # [19] literal  (reader.rb:466-507)
        token = self.first()
        if token is None:
            self.error("Unexpected end of file")
        tt = token.type
        if tt == "INTEGER":
            self.shift()
            value = token.value
            if self.canonicalize:
                value = T.canonical_integer(value)
            return T.literal(value, datatype=T.XSD_INTEGER)
        if tt == "DECIMAL":
            self.shift()
            value = token.value
            if value.startswith("."):
                value = "0" + value
            if self.canonicalize:
                value = T.canonical_decimal(value)
            return T.literal(value, datatype=T.XSD_DECIMAL)
        if tt == "DOUBLE":
            self.shift()
            value = re.sub(r"\.([eE])", r".0\1", token.value)
            if self.canonicalize:
                value = T.canonical_double(value)
            return T.literal(value, datatype=T.XSD_DOUBLE)
        if tt is None and token.value in ("true", "false"):
            self.shift()
            return T.literal(token.value, datatype=T.XSD_BOOLEAN)
        if tt in ("STRING_LITERAL_QUOTE", "STRING_LITERAL_SINGLE_QUOTE",
                  "STRING_LITERAL_LONG_QUOTE", "STRING_LITERAL_LONG_SINGLE_QUOTE"):
            self.shift()
            if tt in ("STRING_LITERAL_QUOTE", "STRING_LITERAL_SINGLE_QUOTE"):
                value = token.value[1:-1]
            else:
                value = token.value[3:-3]
            nxt = self.first()
            if nxt is not None and nxt.type == "LANGTAG":
                self.shift()
                return T.literal(value, lang=nxt.value[1:].lower())
            if nxt is not None and nxt.type == "KWESC" and not self.legacy:
                # bare @is (Icelandic) / @has (Haisla): the reference's
                # LANGTAG lookahead (terminals.rb:51) rejects these (it
                # also rejects is/has-PREFIXED tags, which we accept —
                # see lexer.py LANGTAG) so they cannot be language tags
                # — at parity we reject too, but LOUDLY: silently
                # leaving the token unconsumed used to drop the tag
                # from the literal in recovery mode (pinned
                # NegativeSyntax case r3b_neg_langtag_is)
                self.error(
                    f"{nxt.value!r} cannot be a language tag (reference "
                    "LANGTAG excludes is/has, terminals.rb:51)", nxt)
            if nxt is not None and nxt.type is None and nxt.value == "^^":
                self.shift()
                dt = self.read_iri()
                if dt is None:
                    self.error("Expected datatype IRI", self.first())
                dtv = T.iri_value(dt)
                if self.validate and dtv in _LEXICAL_RES:
                    # the reference raises on ill-typed numeric/boolean
                    # literals in validate mode (reader_spec.rb:1349-1364
                    # via RDF::Literal#valid?)
                    if not _LEXICAL_RES[dtv].fullmatch(value):
                        self.error(
                            f"Ill-typed literal {value!r} for <{dtv}>",
                            token)
                if self.canonicalize:
                    if dtv == T.XSD_INTEGER:
                        value = T.canonical_integer(value)
                    elif dtv == T.XSD_DECIMAL:
                        value = T.canonical_decimal(value)
                    elif dtv == T.XSD_DOUBLE:
                        value = T.canonical_double(value)
                    elif dtv == T.XSD_BOOLEAN:
                        value = T.canonical_boolean(value)
                return T.literal(value, datatype=dtv)
            return T.literal(value)
        return None

    def read_blankNodePropertyList(self):
        # [20] blankNodePropertyList ::= '[' predicateObjectList ']'
        # (reader.rb:515-529)
        token = self.first()
        if token is None or token.type is not None or token.value != "[":
            return None
        self.shift()
        node = self.bnode()
        self.read_predicateObjectList(node)
        nxt = self.first()
        if nxt is None or nxt.value != "]":
            self.error("blankNodePropertyList: Expected closing ']'", nxt)
        self.shift()
        return node

    def read_iriPropertyList(self):
        # [21] iriPropertyList ::= IPLSTART iri predicateObjectList ']'
        # (reader.rb:537-551)
        token = self.first()
        if token is None or token.type != "IPLSTART":
            return None
        self.shift()
        node = self.read_iri()
        if node is None:
            self.error("iriPropertyList: expected iri", self.first())
        self.read_predicateObjectList(node)
        nxt = self.first()
        if nxt is None or nxt.value != "]":
            self.error("iriPropertyList: Expected closing ']'", nxt)
        self.shift()
        return node

    def read_collection(self):
        # [21] collection ::= '(' object* ')'  (reader.rb:560-583)
        token = self.first()
        if token is None or token.type is not None or token.value != "(":
            return None
        self.shift()
        objects = []
        while (tok := self.first()) is not None and not (tok.type is None and tok.value == ")"):
            obj = self.read_path()
            if obj is None:
                break
            objects.append(obj)
        nxt = self.first()
        if nxt is None or nxt.value != ")":
            self.error("collection: Expected closing ')'", nxt)
        self.shift()
        if self.list_terms:
            return ListTerm(objects)
        return self._emit_list_ladder(objects)

    def _emit_list_ladder(self, objects: list) -> str:
        """rdf:first/rdf:rest ladder (list.rb:389-411); cells allocated
        from the deterministic bnode labeler instead of random nodes —
        graph-isomorphic to the reference's emission."""
        if not objects:
            return T.RDF_NIL
        cells = [self.bnode() for _ in objects]
        for i, obj in enumerate(objects):
            self.add_statement(cells[i], T.RDF_FIRST, obj)
            rest = cells[i + 1] if i + 1 < len(cells) else T.RDF_NIL
            self.add_statement(cells[i], T.RDF_REST, rest)
        return cells[0]

    def read_formula(self):
        # [22] formula ::= '{' formulaContent? '}'  (reader.rb:592-611)
        token = self.first()
        if token is None or token.type is not None or token.value != "{":
            return None
        self.shift()
        node = f"_:_form_{self._unique_label()}"
        self.result.formula_labels.add(node)
        self.formulae.append(node)
        self.quant_scopes.append({})  # legacy @forAll/@forSome scope
        self.quant_starts.append(len(self.result.quads))
        try:
            self.read_formulaContent()
        finally:
            closing = self.shift()
            if closing is None or closing.value != "}":
                self.formulae.pop()
                self._pop_quant_scope()
                self.error("formula: Expected closing '}'", closing)
            self.formulae.pop()
            self._pop_quant_scope()
        return node

    def read_formulaContent(self) -> None:
        # [23] formulaContent ::= n3Statement ('.' formulaContent?)?
        # (reader.rb:617-645)
        tok = self.first()
        if tok is not None and tok.type is None and tok.value == "}":
            return
        while True:
            token = self.first()
            if token is None:
                self.error("read_formulaContent: Unexpected end of file")
            if token.type in ("BASE", "PREFIX"):
                self.read_directive()
                nxt = self.first()
                if nxt is not None and nxt.type is None and nxt.value == "}":
                    break
            elif (self.legacy and token.type == "LANGTAG"
                  and token.value in _LEGACY_DIRECTIVES):
                self.read_legacy_directive()
                nxt = self.first()
                if nxt is not None and nxt.type is None and nxt.value == "}":
                    break
            else:
                try:
                    self.read_n3Statement()
                except ParseError as e:
                    if self.validate:
                        raise
                    self.result.errors.append(str(e))
                    self._recover({".", "}"})
                    # if we consumed the '}', put it back for read_formula
                    if self.pos > 0 and self.tokens[self.pos - 1].value == "}":
                        self.pos -= 1
                nxt = self.first()
                if nxt is None:
                    self.error("Expected '.' or '}' following n3Statement", nxt)
                if nxt.value == "." and nxt.type is None:
                    self.shift()
                    ahead = self.first()
                    if ahead is not None and ahead.type is None and ahead.value == "}":
                        break
                    if ahead is None:
                        self.error("formula: Expected closing '}'", None)
                elif nxt.value == "}" and nxt.type is None:
                    break
                else:
                    self.error(
                        "Expected '.' or '}' following n3Statement", nxt
                    )

    def read_iri(self):
        # (rule iri "26" (alt IRIREF prefixedName))  (reader.rb:653-663)
        token = self.first()
        if token is None:
            return None
        if token.type == "IRIREF":
            self.shift()
            return self._quant_subst(
                self.process_iri(re.sub(r"\s+", "", token.value[1:-1])))
        if token.type in ("PNAME_LN", "PNAME_NS"):
            self.shift()
            return self._quant_subst(self.process_pname(token.value))
        if token.type == "BAREWORD" and self.keywords is not None:
            # legacy @keywords mode: barewords are default-namespace names
            # (cwm notation3.py semantics; opt-in only — the reference
            # reader has no such production)
            self.shift()
            return self._quant_subst(self.ns(None, token.value))
        if (self.keywords is not None and token.type is None
                and token.value in _SYNTAX_WORDS
                and token.value not in self.keywords):
            # undeclared syntax word in @keywords mode: plain name
            self.shift()
            return self._quant_subst(self.ns(None, token.value))
        return None

    def _pop_quant_scope(self) -> None:
        """Close a legacy quantifier scope, retroactively substituting
        its declarations over every quad emitted inside the scope —
        cwm's @forAll/@forSome govern the whole enclosing formula, even
        occurrences parsed before the directive."""
        scope = self.quant_scopes.pop()
        start = self.quant_starts.pop()
        self._apply_quant_scope(scope, start)

    def _apply_quant_scope(self, scope: dict[str, str], start: int) -> None:
        if not scope:
            return
        quads = self.result.quads
        for i in range(start, len(quads)):
            s, p, o, g = quads[i]
            ns = self._subst_deep(s, scope)
            np_ = self._subst_deep(p, scope)
            no = self._subst_deep(o, scope)
            if (ns, np_, no) != (s, p, o):
                quads[i] = (ns, np_, no, g)

    def _subst_deep(self, t, scope: dict[str, str]):
        if not isinstance(t, str):
            return t
        mapped = scope.get(t)
        if mapped is not None:
            return mapped
        if T.is_list_term(t) and any(iri[1:-1] in t for iri in scope):
            def walk(e):
                if isinstance(e, list):
                    return [walk(x) for x in e]
                return scope.get(e, e) if isinstance(e, str) else e

            return T.encode_list(walk(T.parse_list_term(t)))
        return t

    def _quant_subst(self, iri: str) -> str:
        """Map an IRI declared by a legacy @forAll/@forSome in any
        enclosing scope to its quantified term (innermost wins)."""
        if self.legacy:
            for scope in reversed(self.quant_scopes):
                mapped = scope.get(iri)
                if mapped is not None:
                    return mapped
        return iri

    def read_blankNode(self):
        # [29] blankNode ::= BLANK_NODE_LABEL | ANON  (reader.rb:667-677)
        token = self.first()
        if token is None:
            return None
        if token.type == "BLANK_NODE_LABEL":
            self.shift()
            return self.bnode(token.value[2:])
        if token.type == "ANON":
            self.shift()
            return self.bnode()
        return None

    def read_quickVar(self):
        # [30] quickVar — document ("global") scope  (reader.rb:681-689)
        token = self.first()
        if token is None or token.type != "QUICK_VAR_NAME":
            return None
        self.shift()
        name = token.value[1:]
        return self.variables.setdefault(name, T.var(name))

    # --- term construction helpers -------------------------------------
    def process_iri(self, value: str) -> str:
        # resolve against base (reader.rb:721-723, iri join :796-809)
        resolved = resolve_iri(self.base_uri, value)
        if self.canonicalize:
            resolved = T.canonical_iri_value(resolved)
        return T.iri(resolved)

    def process_pname(self, value: str) -> str:
        # (reader.rb:725-739)
        prefix, _, name = value.partition(":")
        if prefix and prefix in self.prefixes:
            return self.ns(prefix, name)
        if prefix:
            self.soft_error(f"Use of undefined prefix {prefix!r}")
            return self.ns(None, name)
        return self.ns(None, name)

    def ns(self, prefix: str | None, suffix: str) -> str:
        # (reader.rb:825-833)
        if prefix is None and None not in self.prefixes:
            base = self.base_uri or ""
            self.prefixes[None] = base + "#" if not base.endswith(("#", "/")) else base
        base = self.prefixes.get(prefix, "")
        suffix = _PN_LOCAL_ESC_RE.sub(r"\1", suffix)
        if "#" in base and suffix.startswith("#"):
            suffix = suffix[1:]
        return T.iri(base + suffix)

    def namespace(self, prefix: str | None, iri_value: str) -> None:
        # (reader.rb:786-793)
        if iri_value == "#":
            iri_value = self.prefixes.get(None, "") + "#"
        self.prefixes[prefix] = iri_value

    def bnode(self, label: str | None = None) -> str:
        # deterministic incrementing labeler, per-formula label scoping
        # (reader.rb:743-758)
        form_id = self.formulae[-1] if self.formulae else "_bn_ground"
        if label is not None:
            mapped = self.bn_mapper.get(form_id, {}).get(label)
            if mapped is not None:
                return mapped
        while self.bn_labler in self.bnodes:
            self.bn_labler = T.ruby_succ(self.bn_labler)
        bn_label = self.bn_labler
        self.bnodes.add(bn_label)
        bn = T.bnode(bn_label)
        if label is not None:
            self.bn_mapper.setdefault(form_id, {})[label] = bn
        return bn

    def _unique_label(self) -> str:
        label = self.label_uniquifier
        self.label_uniquifier = T.ruby_succ(self.label_uniquifier)
        return label

    def add_statement(self, subject, predicate, obj) -> None:
        # (reader.rb:774-784): statements inside a formula carry its node
        graph = self.formulae[-1] if self.formulae else None
        self.result.quads.append(
            (encode_term(subject), encode_term(predicate), encode_term(obj), graph)
        )


def resolve_iri(base: str | None, value: str) -> str:
    """RFC 3986 resolution matching RDF::URI#join (reader.rb:721-723).

    Without a base, the value is kept as-is (relative IRIs survive, as in
    the reference when no base_uri option is given).
    """
    if not base:
        return value
    if re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:", value):
        return value  # already absolute
    if value.startswith("#"):
        return base.split("#", 1)[0] + value
    out = urljoin(base, value)
    # urljoin drops an empty fragment: join(base, "doc#") -> ".../doc".
    # RDF::URI#join preserves it (needed for @prefix : <doc#>. bases).
    if value.endswith("#") and not out.endswith("#"):
        out += "#"
    return out


def parse_n3(
    text: str,
    base_uri: str | None = None,
    prefixes: dict[str | None, str] | None = None,
    list_terms: bool = False,
    validate: bool = False,
    canonicalize: bool = False,
    anon_base: str = "b0",
    legacy: bool = False,
) -> ParseResult:
    """Parse one N3 document into quads of N-Triples-encoded terms.

    Pure and deterministic: same text + options → same quads (including
    bnode labels), mirroring the reference's repeatable labeler — the
    property that makes parallel, retry-safe Ray execution emit identical
    output (SURVEY.md §2.2).

    ``legacy=True`` opts into the cwm-era `@forAll`/`@forSome`/`@keywords`
    directives the reference grammar dropped (rejected by default, matching
    the reference) — used to run the cwm goldens the reference ships but
    skips.
    """
    try:
        parser = N3Parser(
            text,
            base_uri=base_uri,
            prefixes=prefixes,
            list_terms=list_terms,
            validate=validate,
            canonicalize=canonicalize,
            anon_base=anon_base,
            legacy=legacy,
        )
        return parser.parse()
    except ParseError as e:
        r = ParseResult()
        r.errors.append(str(e))
        return r


def parse_ntriples(text: str, validate: bool = True,
                   base_uri: str | None = None) -> ParseResult:
    """Line-oriented N-Triples / N-Quads fast path, symmetric with
    serializer.to_ntriples (which emits a 4th graph term for quads in
    formulae).  The full N3 grammar cannot accept 4-term statements —
    this reader exists so an engine-written dump (KB reload, shard
    exchange) round-trips losslessly without the recursive-descent
    machinery.  Terms use the same lexer terminals; statements are
    `s p o [g] .` only.  `base_uri` resolves relative IRIs exactly
    like the N3 reader (spec-valid N-Triples is absolute-only, but
    lenient inputs exist)."""
    from .lexer import LexerError, tokenize

    result = ParseResult()
    try:
        tokens, lex_errors = tokenize(text, recover=not validate)
    except LexerError as e:
        result.errors.append(str(e))
        return result
    result.errors.extend(lex_errors)

    def term_at(i):
        """(encoded term, next index) or (None, i) on malformed input."""
        if i >= len(tokens):
            return None, i
        t = tokens[i]
        if t.type == "IRIREF":
            if base_uri is not None:
                return f"<{resolve_iri(base_uri, t.value[1:-1])}>", i + 1
            return t.value, i + 1
        if t.type == "BLANK_NODE_LABEL":
            return t.value, i + 1
        if t.type == "QUICK_VAR_NAME":
            # not N-Triples proper, but engine dumps of RULE quads
            # contain ?vars and must reload losslessly
            return t.value, i + 1
        if t.type in ("STRING_LITERAL_QUOTE",
                      "STRING_LITERAL_SINGLE_QUOTE",
                      "STRING_LITERAL_LONG_QUOTE",
                      "STRING_LITERAL_LONG_SINGLE_QUOTE"):
            value = t.value[3:-3] if t.value[:3] in ('"""', "'''") \
                else t.value[1:-1]
            j = i + 1
            if j < len(tokens) and tokens[j].type == "LANGTAG":
                return T.literal(value, lang=tokens[j].value[1:].lower()), \
                    j + 1
            if (j + 1 < len(tokens) and tokens[j].type is None
                    and tokens[j].value == "^^"
                    and tokens[j + 1].type == "IRIREF"):
                # datatype IRIs resolve against base_uri exactly like
                # the s/p/o positions (the full N3 path does)
                dt = tokens[j + 1].value[1:-1]
                if base_uri is not None:
                    dt = resolve_iri(base_uri, dt)
                return T.literal(value, datatype=dt), j + 2
            return T.literal(value), j
        if t.type == "INTEGER":
            return T.literal(t.value, datatype=T.XSD_INTEGER), i + 1
        if t.type == "DECIMAL":
            return T.literal(t.value, datatype=T.XSD_DECIMAL), i + 1
        if t.type == "DOUBLE":
            # same ".E" -> ".0E" lexical fix-up as the N3 reader
            # (reader.rb:476) so both paths mint the identical term
            return T.literal(re.sub(r"\.([eE])", r".0\1", t.value),
                             datatype=T.XSD_DOUBLE), i + 1
        if t.type is None and t.value in ("true", "false"):
            return T.literal(t.value, datatype=T.XSD_BOOLEAN), i + 1
        if t.type is None and t.value == "(":
            # first-class list term: an engine dump in list_terms mode
            # prints `( ... )` terms verbatim (to_ntriples is a raw
            # term join); rebuild the encoded list so those dumps
            # reload losslessly like ladders and formula quads do
            items = []
            j = i + 1
            while j < len(tokens) and not (tokens[j].type is None
                                           and tokens[j].value == ")"):
                inner, j2 = term_at(j)
                if inner is None:
                    return None, i
                items.append(inner)
                j = j2
            if j >= len(tokens):
                return None, i
            return T.encode_list(items), j + 1
        return None, i

    i, n = 0, len(tokens)
    while i < n:
        terms = []
        start = i
        while len(terms) < 4:
            term, j = term_at(i)
            if term is None:
                break
            terms.append(term)
            i = j
        if (len(terms) in (3, 4) and i < n and tokens[i].type is None
                and tokens[i].value == "."):
            i += 1
            g = terms[3] if len(terms) == 4 else None
            result.quads.append((terms[0], terms[1], terms[2], g))
            if g is not None and T.is_bnode(g):
                # only bnode graph terms are engine-dump formula labels;
                # an IRI named graph is NOT a formula (marking it would
                # make the writer treat the graph as an unreferenced
                # formula and drop it)
                result.formula_labels.add(g)
            continue
        msg = (f"malformed N-Triples statement at token {start}: "
               f"{tokens[start].value!r}")
        result.errors.append(msg)
        if validate:
            break
        # recover: skip to just past the next '.'
        while i < n and not (tokens[i].type is None
                             and tokens[i].value == "."):
            i += 1
        i += 1
    return result
