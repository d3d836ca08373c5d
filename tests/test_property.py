"""Property-based tests (hypothesis): round-trip and total-parser
robustness.  The reference's equivalent guarantee is the W3C suite +
rspec examples; hypothesis explores the same contracts adversarially."""
import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rdf_n3_ray.isomorphism import isomorphic
from rdf_n3_ray.parser.n3_parser import parse_n3
from rdf_n3_ray.serializer.n3_writer import serialize_n3, to_ntriples

# --- term generators -------------------------------------------------------

_localname = st.text(alphabet=string.ascii_letters + string.digits,
                     min_size=1, max_size=8).filter(lambda s: s[0].isalpha())

_iri = _localname.map(lambda s: f"<http://ex.org/{s}>")
_bnode = st.integers(0, 5).map(lambda i: f"_:b{i}")

_plain_text = st.text(min_size=0, max_size=12).filter(
    lambda s: "\udc80" not in s and all(ord(c) < 0x10000 or True for c in s))


def _mk_literal(s, kind, tag):
    # build through the term model so the encoding is canonical
    # (escaping, control chars) — hand-built strings drift from it
    from rdf_n3_ray import terms as T

    if kind == "plain":
        return T.literal(s)
    if kind == "lang":
        return T.literal(s, lang=tag)
    # NB not xsd:string — that is the PLAIN literal in RDF 1.1 and the
    # parser normalizes it away; use a distinct datatype
    return T.literal(s, datatype="http://ex.org/dt")


_literal = st.builds(
    _mk_literal,
    _plain_text,
    st.sampled_from(["plain", "lang", "typed"]),
    st.sampled_from(["en", "de", "en-us"]),
)

_subject = st.one_of(_iri, _bnode)
_object = st.one_of(_iri, _bnode, _literal)
# predicates: mostly IRIs, occasionally a bnode (legal N3 — path sugar
# mints them; the writer must keep label identity across positions)
_predicate = st.one_of(_iri, _iri, _iri, _bnode)

_quad = st.tuples(_subject, _predicate, _object, st.none())
_graph = st.lists(_quad, min_size=1, max_size=12, unique=True)


@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_graph)
def test_serialize_parse_round_trip(quads):
    """parse(serialize(G)) must be isomorphic to G — for the pretty N3
    writer AND the N-Triples fast path."""
    out = serialize_n3(list(quads))
    back = parse_n3(out, base_uri="http://ex.org/")
    assert not back.errors, (out, back.errors)
    assert isomorphic(list(quads), back.quads), (quads, out, back.quads)

    nt = to_ntriples(list(quads))
    back2 = parse_n3(nt, base_uri="http://ex.org/")
    assert not back2.errors, (nt, back2.errors)
    assert isomorphic(list(quads), back2.quads)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=120))
def test_parser_total_on_garbage(text):
    """Recovery-mode parsing must never raise, whatever the input
    (reader.rb:848-900 follow-set recovery; validate:false)."""
    r = parse_n3(text, base_uri="http://ex.org/")
    assert isinstance(r.quads, list)


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet=':;,.(){}[]<>"\'@?!^=#ab \n', max_size=60))
def test_parser_total_on_adversarial_syntax_soup(text):
    """Dense N3 punctuation soup — the recovery hot path."""
    r = parse_n3(text, base_uri="http://ex.org/")
    assert isinstance(r.quads, list)


# --- formula-graph round-trip: quads carry formula nodes as graphs ---
_fnode = st.integers(0, 2).map(lambda i: f"_:_form_{i}")
_fquad = st.tuples(_subject, _predicate, _object,
                   st.one_of(st.none(), _fnode))


def _anchor_formulae(quads):
    """Make the generated quad set N3-representable: (a) bnodes are
    formula-SCOPED in N3 (reader.rb:743-758 interning), so a bnode
    shared across graph scopes cannot survive any serialization —
    rename bnodes graph-locally; (b) formulae unreachable from the
    default graph are (correctly) not rendered — anchor each with a
    default-graph statement."""
    def scoped(t, g):
        if isinstance(t, str) and t.startswith("_:") \
                and not t.startswith("_:_form_"):
            return f"{t}_{(g or 'def').replace(':', '')}"
        return t

    out = [(scoped(s, g), scoped(p, g), scoped(o, g), g)
           for s, p, o, g in quads]
    for g in {q[3] for q in quads if q[3]}:
        out.append((g, "<http://ex.org/anchored>",
                    "<http://ex.org/true>", None))
    # graph-scoped renames can collide previously-unique rows
    return list(dict.fromkeys(out))


@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_fquad, min_size=1, max_size=10, unique=True))
def test_formula_quads_round_trip(quads):
    quads = _anchor_formulae(quads)
    labels = {q[3] for q in quads if q[3]}
    out = serialize_n3(quads, formula_labels=labels)
    back = parse_n3(out, base_uri="http://ex.org/")
    assert not back.errors, (out, back.errors)
    assert isomorphic(quads, back.quads), (quads, out, back.quads)


@settings(max_examples=200, deadline=None)
@given(st.text(
    alphabet=':;,.(){}[]<>"@?!^=#ab \n' + 'forAlSmekywd',
    max_size=80))
def test_legacy_parser_total_and_deterministic(text):
    """The opt-in legacy mode (@forAll/@forSome/@keywords, barewords,
    retroactive scope substitution) must be as total as the default
    reader — never raise in recovery mode, and be bit-deterministic."""
    doc = "@keywords a, is, of .\n" + text
    r1 = parse_n3(doc, base_uri="http://ex.org/", legacy=True)
    r2 = parse_n3(doc, base_uri="http://ex.org/", legacy=True)
    assert isinstance(r1.quads, list)
    assert r1.quads == r2.quads and r1.errors == r2.errors


@settings(max_examples=120, deadline=None)
@given(st.text(alphabet=':.(){} <>@forAlSmeb?x \n', max_size=60))
def test_legacy_quantifier_soup_total(text):
    """Quantifier-directive soup — exercises read_legacy_directive
    error paths and scope pop/retro-substitution on malformed input."""
    doc = "@prefix : <http://ex/> .\n@forAll :x .\n" + text
    r = parse_n3(doc, base_uri="http://ex.org/", legacy=True)
    assert isinstance(r.quads, list)


# --- data-ops oracle-parity properties (no Ray: kernel vs DuckDB) -----

_WS_TEXT = st.text(
    alphabet=list("ab \t\n\f\r\v") + [" "], max_size=30)


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_WS_TEXT, max_size=12))
def test_n_words_matches_sql_fragment(texts):
    """_n_words (non-ASCII-WS run count) is bit-equal to _N_WORDS_SQL
    (RE2 '\\s+' split + drop-empty) on arbitrary whitespace soup,
    including \\v and NBSP which are token chars on BOTH engines."""
    import duckdb
    import pandas as pd

    from rdf_n3_ray.pipelines.relational import _N_WORDS_SQL, _n_words

    df = pd.DataFrame({"text": pd.Series(texts, dtype="object")})
    con = duckdb.connect()
    con.register("t", df)
    sql = _N_WORDS_SQL.replace("coalesce(text, '')", "coalesce(t.text, '')")
    got = con.execute(f"SELECT {sql} AS n FROM t").fetchdf()["n"]
    assert got.astype("int64").tolist() == _n_words(df["text"]).tolist()


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.integers(min_value=0, max_value=600),
                min_size=1, max_size=25))
def test_pack_group_matches_sql_recurrence(tokens):
    """The greedy packing kernel (bin-boundary searchsorted walk) is
    bit-equal to the doc-by-doc CASE recurrence PACK_SEQUENCES_SQL
    unrolls, for arbitrary token-count sequences including zero-token
    docs and oversize docs."""
    import pandas as pd

    from rdf_n3_ray.pipelines.relational import _pack_group

    g = pd.DataFrame({"doc_id": range(len(tokens)),
                      "source": "s",
                      "n_tokens": pd.Series(tokens, dtype="int64")})
    got = _pack_group(g.copy(), budget=256)

    # reference: the SQL recurrence, literally
    bin_id, off, running, exp = 0, 0, 0, []
    for i, t in enumerate(tokens):
        if i == 0:
            exp.append((0, 0))
            running = t
            continue
        if running + t > 256:
            bin_id, off, running = bin_id + 1, 0, t
        else:
            off, running = running, running + t
        exp.append((bin_id, off))
    assert list(zip(got["bin_id"], got["off"])) == exp


@settings(max_examples=200, deadline=None)
@given(st.lists(
    st.tuples(st.text(min_size=0, max_size=12),
              st.text(min_size=0, max_size=12),
              st.text(min_size=0, max_size=12)),
    min_size=1, max_size=50, unique=True))
def test_nul_join_injective_and_hash_separates(rows):
    """stages/keys: for NUL-free columns, nul_join is injective
    (distinct tuples -> distinct key strings) and hash128 separates
    the keys — the property the dedup/anti-join exactness argument
    now rests on (keys.py module docstring)."""
    import pandas as pd

    from rdf_n3_ray.stages.keys import hash128, nul_join

    # strip NULs: the engine's term columns cannot contain raw NUL in
    # field-ambiguous positions (IRIs/bnodes exclude control chars);
    # hypothesis text may include them, which WOULD alias boundaries
    rows = sorted({tuple(c.replace("\x00", " ") for c in t)
                   for t in rows})
    a, b, c = (pd.Series([r[i] for r in rows], dtype=object)
               for i in range(3))
    key = nul_join(a, b, c)
    vals = key.to_pylist()
    assert len(set(vals)) == len(rows), "nul_join must be injective"
    h1, h2 = hash128(key)
    seen = set(zip(h1.tolist(), h2.tolist()))
    assert len(seen) == len(rows), "hash128 collided on tiny input"
