"""Reasoner tests mirroring /root/reference/spec/reasoner_spec.rb cases
and examples/reason golden pairs.  reason() defaults follow the spec
helper (reasoner_spec.rb:1143-1156): think=true, compare conclusions or
data projection by graph isomorphism.
"""
import pytest

from rdf_n3_ray.algebra.engine import reason_n3
from rdf_n3_ray.isomorphism import isomorphic
from rdf_n3_ray.parser.n3_parser import parse_n3

BASE = "http://example.com/"


def run(input_n3, think=True):
    return reason_n3(input_n3, think=think, base_uri=BASE)


def parse(n3):
    r = parse_n3(n3, base_uri=BASE, list_terms=True)
    assert not r.errors, r.errors
    return r.quads


def check_conclusions(input_n3, expect_n3):
    got = run(input_n3).conclusions()
    expected = parse(expect_n3)
    assert isomorphic(got, expected), f"GOT: {got}\nWANT: {expected}"


def check_data(input_n3, expect_n3):
    got = run(input_n3).data()
    expected = parse(expect_n3)
    assert isomorphic(got, expected), f"GOT: {got}\nWANT: {expected}"


def test_socrates():
    check_data(
        """@prefix : <socrates#>.
        :socrates a :Man.
        { ?who a :Man } => { ?who a :Mortal }.""",
        """@prefix : <socrates#>.
        :socrates a :Man, :Mortal .""",
    )


def test_t1_ground():
    check_data("<a> <b> <c>.", "<a> <b> <c>.")


def test_t8_existential_consequent():
    # {<a> <b> ?x} => { ?x <b2> <c2> } over <a> <b> []
    got = run("<a> <b> [].\n{<a> <b> ?x} => { ?x <b2> <c2> }.").data()
    expected = parse("<a> <b> _:x. _:x <b2> <c2>.")
    assert isomorphic(got, expected), got


def test_implies_r1_list_unification():
    check_conclusions(
        """( "one"  "two" ) a :whatever.
        { (?a ?b) a :whatever } log:implies { ?a a :SUCCESS. ?b a :SUCCESS }.""",
        '"one" a :SUCCESS. "two" a :SUCCESS.',
    )


def test_implies_unify2():
    check_conclusions(
        """( 17 ) a :TestCase.
        { ( ?x ) a :TestCase}  => { ?x a :RESULT }.""",
        "17 a :RESULT.",
    )


def test_list_in_via_property():
    check_conclusions(
        """:thing1 :prop1 ( :test5a :test5b :test5c ) .
        { ?item list:in [ is :prop1 of :thing1 ] } => { ?item a :SUCCESS } .""",
        ":test5a a :SUCCESS. :test5b a :SUCCESS. :test5c a :SUCCESS.",
    )


def test_list_append_const():
    check_conclusions(
        "{ ((1 2 3 4 5) (6)) list:append (1 2 3 4 5 6)} => {:test1 a :success}.",
        ":test1 a :success.",
    )


def test_list_append_var():
    check_conclusions(
        "{ ((1 2 3 4 5) (6)) list:append ?item} => {:test2 :is ?item}.",
        ":test2 :is (1 2 3 4 5 6).",
    )


def test_list_append_empty():
    check_conclusions(
        "{ (() (1)) list:append ?item} => {:test4 :is ?item}.",
        ":test4 :is (1).",
    )


def test_list_append_via_bnode_heads():
    check_conclusions(
        """:thing1 :prop1 ( 1 2 3 ) .
        :thing2 :prop1 ( 4 ) .
        { ([is :prop1 of :thing1] [is :prop1 of :thing2]) list:append ?item }
          => { :test5 :is ?item } .""",
        ":test5 :is (1 2 3 4).",
    )


def test_list_member_const():
    check_conclusions(
        "{ (  1 2 3 4 5 ) list:member 1 } => { :test4a a :SUCCESS }.",
        ":test4a a :SUCCESS .",
    )


def test_list_member_var_fanout():
    check_conclusions(
        "{ (  1 2 3 4 5 ) list:member ?x } => { :test4a :is ?x }.",
        ":test4a :is 1 . :test4a :is 2 . :test4a :is 3 . :test4a :is 4 . :test4a :is 5 .",
    )


def test_list_member_pythag_path():
    check_conclusions(
        "{   ((3) (5))!list:member list:member ?z } => { ?z a :Pythagorean }.",
        "3 a :Pythagorean. 5 a :Pythagorean.",
    )


def test_list_iterate_fanout():
    check_conclusions(
        """@prefix list: <http://www.w3.org/2000/10/swap/list#>.
        {(1 2 3 4) list:iterate ?R} => {(1 2 3 4) :has ?R}.""",
        "(1 2 3 4) :has (0 1),  (1 2), (2 3), (3 4).",
    )


def test_list_iterate_index_lookup():
    check_conclusions(
        """{(\"a\" \"b\" \"c\") list:iterate (2 ?y)} => {:value :is ?y}.""",
        ':value :is "c".',
    )


def test_math_sum():
    check_conclusions(
        "{ (3 5) math:sum ?x } => { :result :is ?x }.",
        ":result :is 8.",
    )


def test_math_comparisons():
    check_conclusions(
        "{ 5 math:greaterThan 3 } => { :gt a :SUCCESS }. "
        "{ 3 math:lessThan 5 } => { :lt a :SUCCESS }. "
        "{ 5 math:lessThan 3 } => { :bad a :FAIL }.",
        ":gt a :SUCCESS. :lt a :SUCCESS.",
    )


def test_math_chain():
    check_conclusions(
        "{ (2 3) math:product ?p . (?p 1) math:difference ?d } => { :r :is ?d }.",
        ":r :is 5.",
    )


def test_str_ops():
    # `string:` is NOT preseeded (commented out at reader.rb:114) —
    # must be declared, matching the reference.
    pre = "@prefix string: <http://www.w3.org/2000/10/swap/string#>.\n"
    check_conclusions(
        pre
        + '{ ("hello" "world") string:concatenation ?c } => { :c :is ?c }. '
        '{ "hello" string:startsWith "he" } => { :sw a :SUCCESS }. '
        '{ ("abcdef" "ab(..)ef") string:scrape ?x } => { :scr :is ?x }.',
        ':c :is "helloworld". :sw a :SUCCESS. :scr :is "cd".',
    )


def test_ground_antecedent_checked_against_kb():
    # a ground antecedent that is NOT in the KB must not fire
    got = run(":a :b :c . { :x :y :z } => { :bad a :FAIL }.").conclusions()
    assert got == []


def test_log_equalTo():
    check_conclusions(
        "{ :a log:equalTo :a } => { :eq a :SUCCESS }. "
        "{ :a log:equalTo :b } => { :bad a :FAIL }. "
        "{ :a log:notEqualTo :b } => { :neq a :SUCCESS }.",
        ":eq a :SUCCESS. :neq a :SUCCESS.",
    )


def test_log_conjunction():
    check_conclusions(
        """{ ({:sky :color :blue} {:sky :color :green})
             log:conjunction ?F } => { ?F a :result} .""",
        "{:sky :color :blue, :green } a :result .",
    )


def test_log_includes():
    check_conclusions(
        "{ { :a :b :c . :d :e :f } log:includes { :a :b :c } } => { :inc a :SUCCESS }. "
        "{ { :a :b :c } log:notIncludes { :x :y :z } } => { :ninc a :SUCCESS }.",
        ":inc a :SUCCESS. :ninc a :SUCCESS.",
    )


def test_time_components():
    check_conclusions(
        '{ "2024-03-15T10:30:05Z"^^<http://www.w3.org/2001/XMLSchema#dateTime> time:year ?y } => { :y :is ?y }. '
        '{ "2024-03-15"^^<http://www.w3.org/2001/XMLSchema#date> time:month ?m } => { :m :is ?m }. '
        '{ "2024-03-15"^^<http://www.w3.org/2001/XMLSchema#date> time:day ?d } => { :d :is ?d }.',
        ":y :is 2024. :m :is 3. :d :is 15.",
    )


def test_think_chains_rules():
    check_data(
        """@prefix : <http://ex/>.
        :a a :A.
        { ?x a :A } => { ?x a :B }.
        { ?x a :B } => { ?x a :C }.""",
        """@prefix : <http://ex/>.
        :a a :A, :B, :C.""",
    )


def test_no_think_single_pass():
    got = run(
        """@prefix : <http://ex/>.
        :a a :A.
        { ?x a :A } => { ?x a :B }.
        { ?x a :B } => { ?x a :C }.""",
        think=False,
    ).data()
    # single pass: :C not yet derived
    objs = {o for s, p, o, g in got}
    assert "<http://ex/B>" in objs and "<http://ex/C>" not in objs


def test_output_string():
    r = run(
        '{ :a :b :c } => { "1" log:outputString "hello " . "2" log:outputString "world" } . :a :b :c .'
    )
    assert r.strings == "hello world"


def test_rule_producing_rule():
    check_data(
        """@prefix : <http://ex/>.
        :a a :A.
        { :a a :A } => { { ?x a :A } => { ?x a :Z } }.""",
        """@prefix : <http://ex/>.
        :a a :A, :Z.""",
    )


# --- additional spec-table cases (reasoner_spec.rb contexts) ---------------

def test_math_greaterthan_string_coercion():
    # reasoner_spec.rb:726-740 — strings coerce to numbers: "008" < "70"
    check_conclusions(
        '@prefix math: <http://www.w3.org/2000/10/swap/math#>.\n'
        '{ "008" math:greaterThan "70" } => { :t10 a :FAILURE }.\n'
        '{ "70" math:greaterThan "008" } => { :t10 a :success }.',
        ':t10 a :success .',
    )


def test_str_concatenation_numeric_value_cast():
    # reasoner_spec.rb:1002-1009 "integer" case: members cast via
    # xs:string (concatenation.rb:21 Expression.cast), so 01 -> "1"
    # and the result is "11" — NOT raw-lexical "101" (the previous pin
    # here mis-transcribed the reference expectation)
    check_conclusions(
        '@prefix string: <http://www.w3.org/2000/10/swap/string#>.\n'
        '{ (1 01) string:concatenation ?x } => { :t :is ?x }.',
        ':t :is "11" .',
    )


def test_math_negation_bidirectional():
    # math/negation.rb: either side computable from the other
    check_conclusions(
        '@prefix math: <http://www.w3.org/2000/10/swap/math#>.\n'
        '{ 5 math:negation ?x } => { :fwd :is ?x }.\n'
        '{ ?y math:negation 7 } => { :rev :is ?y }.',
        ':fwd :is -5 . :rev :is -7 .',
    )


def test_log_dtlit_langlit():
    check_conclusions(
        '@prefix log: <http://www.w3.org/2000/10/swap/log#>.\n'
        '@prefix xsd: <http://www.w3.org/2001/XMLSchema#>.\n'
        '{ ("1" xsd:integer) log:dtlit ?x } => { :dt :is ?x }.\n'
        '{ ("hello" "en") log:langlit ?y } => { :ll :is ?y }.',
        '@prefix xsd: <http://www.w3.org/2001/XMLSchema#>.\n'
        ':dt :is "1"^^xsd:integer . :ll :is "hello"@en .',
    )


def test_log_notEqualTo_and_notIncludes():
    check_conclusions(
        '@prefix log: <http://www.w3.org/2000/10/swap/log#>.\n'
        ':a :b :c .\n'
        '{ :a log:notEqualTo :b } => { :ne a :success }.\n'
        '{ { :a :b :c } log:notIncludes { :x :y :z } } => { :ni a :success }.',
        ':ne a :success . :ni a :success .',
    )


def test_time_inSeconds_forward():
    check_conclusions(
        '@prefix time: <http://www.w3.org/2000/10/swap/time#>.\n'
        '{ "1970-01-01T00:01:00Z" time:inSeconds ?x } => { :t :is ?x }.',
        ':t :is 60 .',
    )


def test_str_replace_and_format():
    check_conclusions(
        '@prefix string: <http://www.w3.org/2000/10/swap/string#>.\n'
        '{ ("banana" "a" "o") string:replace ?x } => { :rep :is ?x }.\n'
        '{ ("%s-%s" "a" "b") string:format ?y } => { :fmt :is ?y }.',
        ':rep :is "bonono" . :fmt :is "a-b" .',
    )


def test_list_first_last_length():
    check_conclusions(
        '@prefix list: <http://www.w3.org/2000/10/swap/list#>.\n'
        ':l :is ( "a" "b" "c" ) .\n'
        '{ :l :is ?L . ?L list:first ?f } => { :first :is ?f }.\n'
        '{ :l :is ?L . ?L list:last ?z } => { :last :is ?z }.\n'
        '{ :l :is ?L . ?L list:length ?n } => { :len :is ?n }.',
        ':first :is "a" . :last :is "c" . :len :is 3 .',
    )


def test_does_not_imply_facts_not_in_evidence():
    # reasoner_spec.rb "does not imply facts not in evidence"
    r = run(':x :y :z .\n{ :a :b :c } => { :d :e :f }.')
    assert r.conclusions() == []


def test_n3string_builtin():
    # log:n3String serializes the subject formula (reasoner_spec.rb:322-340)
    got = run(
        '@prefix log: <http://www.w3.org/2000/10/swap/log#>.\n'
        '{ { :sky :color :blue } log:n3String ?x } => { :t :got ?x }.'
    ).conclusions()
    assert len(got) == 1
    s, p, o, g = got[0]
    assert p == "<http://example.com/got>"
    assert "sky" in o and "color" in o and "blue" in o, o


def test_parsedAsN3_builtin():
    # parser-in-a-builtin (log/parsed_as_n3.rb)
    got = run(
        '@prefix log: <http://www.w3.org/2000/10/swap/log#>.\n'
        '{ "<http://ex/a> <http://ex/b> <http://ex/c> ." log:parsedAsN3 ?f .'
        '  ?f log:includes { <http://ex/a> <http://ex/b> <http://ex/c> } }'
        ' => { :t a :success }.'
    ).conclusions()
    assert any(s == "<http://example.com/t>" for s, p, o, g in got), got


def test_log_content_and_semantics_local_file(tmp_path):
    # local-file variant of log:content / log:semantics (SURVEY §2.1:
    # web fetch is out of scope; file reads mirror log/content.rb)
    doc = tmp_path / "doc.n3"
    doc.write_text("<#a> <#b> <#c> .")
    uri = f"file://{doc}"
    got = run(
        '@prefix log: <http://www.w3.org/2000/10/swap/log#>.\n'
        f'{{ <{uri}> log:content ?c }} => {{ :t :content ?c }}.\n'
        f'{{ <{uri}> log:semantics ?f .'
        f'  ?f log:includes {{ <{uri}#a> <{uri}#b> <{uri}#c> }} }}'
        ' => { :sem a :success }.'
    ).conclusions()
    preds = {p for s, p, o, g in got}
    objs = {o for s, p, o, g in got}
    assert "<http://example.com/content>" in preds, got
    assert '"<#a> <#b> <#c> ."' in objs, got
    assert any(s == "<http://example.com/sem>" for s, p, o, g in got), got


def test_log_content_missing_file_no_solution(tmp_path):
    got = run(
        '@prefix log: <http://www.w3.org/2000/10/swap/log#>.\n'
        f'{{ <file://{tmp_path}/nope.n3> log:content ?c }} => {{ :t :c ?c }}.'
    ).conclusions()
    assert got == []


def test_log_content_refuses_plain_literal_path(tmp_path):
    """A string literal subject is NOT a dereferenceable resource —
    the reference's log:content only accepts IRIs (log/content.rb:20),
    and literal-as-path would let data-driven rules read arbitrary
    local files ("/etc/passwd" log:content ?x)."""
    doc = tmp_path / "secret.n3"
    doc.write_text("<#a> <#b> <#c> .")
    got = run(
        '@prefix log: <http://www.w3.org/2000/10/swap/log#>.\n'
        f'{{ "{doc}" log:content ?c }} => {{ :t :c ?c }}.\n'
        f'{{ "{doc}" log:semantics ?f }} => {{ :t :sem ?f }}.'
    ).conclusions()
    assert got == []


# --- full-registry builtin sweep: one behavioral case per remaining
# kernel (table-driven; complements the per-semantics tests above) -----

MATH = "@prefix math: <http://www.w3.org/2000/10/swap/math#>.\n"
STR = "@prefix string: <http://www.w3.org/2000/10/swap/string#>.\n"
TIME = "@prefix time: <http://www.w3.org/2000/10/swap/time#>.\n"
CRYPTO = "@prefix crypto: <http://www.w3.org/2000/10/swap/crypto#>.\n"

SWEEP = [
    (MATH + "{ -7 math:absoluteValue ?x } => { :r :is ?x }.", ':r :is 7 .'),
    (MATH + "{ 1 math:acos ?x } => { :r :is ?x }.", ':r :is 0.0E0 .'),
    (MATH + "{ 1 math:acosh ?x } => { :r :is ?x }.", ':r :is 0.0E0 .'),
    (MATH + "{ 0 math:asin ?x } => { :r :is ?x }.", ':r :is 0.0E0 .'),
    (MATH + "{ 0 math:asinh ?x } => { :r :is ?x }.", ':r :is 0.0E0 .'),
    (MATH + "{ 0 math:atan ?x } => { :r :is ?x }.", ':r :is 0.0E0 .'),
    (MATH + "{ 0 math:atanh ?x } => { :r :is ?x }.", ':r :is 0.0E0 .'),
    (MATH + "{ 2.3 math:ceiling ?x } => { :r :is ?x }.", ':r :is 3 .'),
    (MATH + "{ 2.7 math:floor ?x } => { :r :is ?x }.", ':r :is 2 .'),
    (MATH + "{ 0 math:cosh ?x } => { :r :is ?x }.", ':r :is 1.0E0 .'),
    (MATH + "{ 0 math:sinh ?x } => { :r :is ?x }.", ':r :is 0.0E0 .'),
    (MATH + "{ 0 math:tanh ?x } => { :r :is ?x }.", ':r :is 0.0E0 .'),
    (MATH + "{ (2 10) math:exponentiation ?x } => { :r :is ?x }.", ':r :is 1024 .'),
    (MATH + "{ (7 2) math:quotient ?x } => { :r :is ?x }.", ':r :is 3.5 .'),
    (MATH + "{ (7 2) math:remainder ?x } => { :r :is ?x }.", ':r :is 1 .'),
    (MATH + "{ 2.5 math:rounded ?x } => { :r :is ?x }.", ':r :is 3 .'),
    (MATH + "{ 3 math:notGreaterThan 5 } => { :r a :ok }.", ':r a :ok .'),
    (MATH + "{ 5 math:notLessThan 3 } => { :r a :ok }.", ':r a :ok .'),
    (STR + '{ "hello" string:contains "ell" } => { :r a :ok }.', ':r a :ok .'),
    (STR + '{ "HeLLo" string:containsIgnoringCase "hello" } => { :r a :ok }.', ':r a :ok .'),
    (STR + '{ "HELLO" string:equalIgnoringCase "hello" } => { :r a :ok }.', ':r a :ok .'),
    (STR + '{ "HELLO" string:notEqualIgnoringCase "world" } => { :r a :ok }.', ':r a :ok .'),
    (STR + '{ "abc" string:notGreaterThan "abd" } => { :r a :ok }.', ':r a :ok .'),
    (STR + '{ "abd" string:notLessThan "abc" } => { :r a :ok }.', ':r a :ok .'),
    (STR + '{ "hello" string:notMatches "^x.*" } => { :r a :ok }.', ':r a :ok .'),
    (TIME + '{ "2024-03-15T10:30:05Z"^^<http://www.w3.org/2001/XMLSchema#dateTime> time:hour ?x } => { :r :is ?x }.',
     ':r :is 10 .'),
    (TIME + '{ "2024-03-15T10:30:05Z"^^<http://www.w3.org/2001/XMLSchema#dateTime> time:second ?x } => { :r :is ?x }.',
     ':r :is 5 .'),
    (TIME + '{ "2024-03-15"^^<http://www.w3.org/2001/XMLSchema#date> time:dayOfWeek ?x } => { :r :is ?x }.',
     ':r :is 5 .'),  # 2024-03-15 is a Friday; cwm dayOfWeek: Sunday=0
    (TIME + '{ "2024-03-15T10:30:05-05:00"^^<http://www.w3.org/2001/XMLSchema#dateTime> time:timeZone ?x } => { :r :is ?x }.',
     ':r :is "-05:00" .'),
    (CRYPTO + '{ "abc" crypto:md5 ?x } => { :r :is ?x }.',
     ':r :is "900150983cd24fb0d6963f7d28e17f72" .'),
    (CRYPTO + '{ "abc" crypto:sha1 ?x } => { :r :is ?x }.',
     ':r :is "a9993e364706816aba3e25717850c26c9cd0d89d" .'),
]


@pytest.mark.parametrize("inp,expect", SWEEP,
                         ids=[i.splitlines()[1][2:28] for i, _ in SWEEP])
def test_builtin_sweep(inp, expect):
    check_conclusions(inp, expect)


def test_time_gm_local_now_bound():
    # time:gmTime / time:localTime bind the current time formatted by
    # the object format string (gm_time.rb) — assert shape, not value
    got = run(TIME + '{ "" time:gmTime ?x } => { :r :is ?x }.').conclusions()
    assert len(got) == 1 and got[0][2].startswith('"'), got


def test_big_combinatorial_path_math():
    # reasoner_spec.rb:878-889 "Big test": path-applied builtins feeding
    # math:sum — (7/2) + ((7%2)^10000000) + len(a..e) = 9.5
    check_conclusions(
        MATH + "@prefix list: <http://www.w3.org/2000/10/swap/list#>.\n"
        '{ ( ("7" "2")!math:quotient '
        '    (("7" "2")!math:remainder "10000000")!math:exponentiation '
        '    ("a" "b" "c" "d" "e")!list:length '
        '  ) math:sum ?x } => '
        '{ ?x :valueOf "9.5" } .',
        '9.5 :valueOf "9.5" .',
    )


def test_parsedAsN3_formula_ids_do_not_collide_with_document():
    # parser-local _:_form_N ids from a parsed literal must not merge
    # into the outer document's own formulae
    r = run(
        '@prefix log: <http://www.w3.org/2000/10/swap/log#>.\n'
        '{ :never :matches :anything } => { :bad a :Fired }.\n'
        '{ "{ <http://ex/x> <http://ex/y> <http://ex/z> } <http://ex/p>'
        ' <http://ex/q> ." log:parsedAsN3 ?f } => { :t a :ok }.'
    )
    subs = {s for s, p, o, g in r.conclusions()}
    assert "<http://example.com/t>" in subs
    assert "<http://example.com/bad>" not in subs


def test_conjunction_ground_object_is_checked():
    # ResourceOperator semantics: a bound object formula must MATCH the
    # computed conjunction (isomorphism) or the solution is eliminated
    r = run(
        '@prefix log: <http://www.w3.org/2000/10/swap/log#>.\n'
        '{ ( {:sky :color :blue} {:grass :color :green} ) log:conjunction '
        '{ :sky :color :blue . :grass :color :green } } => { :c a :ok }.\n'
        '{ ( {:sky :color :blue} ) log:conjunction { :sky :color :red } }'
        ' => { :bad2 a :Fired }.'
    )
    subs = {s for s, p, o, g in r.conclusions()}
    assert "<http://example.com/c>" in subs
    assert "<http://example.com/bad2>" not in subs


def test_big_integer_exactness():
    # beyond 2^53: float coercion would conflate these
    check_conclusions(
        MATH + "{ 9007199254740993 math:notEqualTo 9007199254740992 }"
        " => { :ne a :ok }.\n"
        "{ 9007199254740993 math:equalTo 9007199254740992 }"
        " => { :bad a :Fired }.\n"
        "{ (10000000000000001 10) math:remainder ?r } => { :rem :is ?r }.",
        ":ne a :ok . :rem :is 1 .",
    )


# --- quantifier-scoping includes cases (reasoner_spec.rb:213-262) ----------

def test_quantifiers_limited_includes():
    pre = "@prefix log: <http://www.w3.org/2000/10/swap/log#>.\n"
    # a1: ground includes ground
    check_conclusions(
        pre + "{{ :foo :bar :baz } log:includes { :foo :bar :baz }}"
        " => { :testa1 a :success } .",
        ":testa1 a :success .")
    # a2: existential in the pattern side matches a ground term
    check_conclusions(
        pre + "{{ :foo :bar :baz } log:includes { _:foo :bar :baz }}"
        " => { :testa2 a :success } .",
        ":testa2 a :success .")
    # b2: existential on both sides unifies
    check_conclusions(
        pre + "{{ _:foo :bar :baz } log:includes { _:foo :bar :baz }}"
        " => { :testb2 a :success } .",
        ":testb2 a :success .")
    # a1d: mismatched ground terms must NOT fire
    r = run(pre + "{{ :fee :bar :baz } log:includes { :foo :bar :baz }}"
            " => { :testa1d a :FAILURE } .")
    assert r.conclusions() == []


def test_t10b_includes_binding_feeds_second_rule():
    # reasoner_spec.rb:251-261: a variable bound by log:includes flows
    # into the consequent, whose conclusion fires a second rule
    check_conclusions(
        "@prefix log: <http://www.w3.org/2000/10/swap/log#>.\n"
        "{ {:theSky :is :blue} log:includes { :theSky :is ?x} }"
        " log:implies { :fred :favoriteColor ?x } .\n"
        "{ :fred :favoriteColor :blue } log:implies { :test10b a :success}.",
        ":fred :favoriteColor :blue. :test10b a :success.")


def test_list_in_empty_list_never_fires():
    # reasoner_spec.rb "1 in ()" — empty list membership is FALSE
    r = run("@prefix list: <http://www.w3.org/2000/10/swap/list#>.\n"
            "{ 1 list:in () } => { :trap1 a :FAILURE }.")
    assert r.conclusions() == []


def test_uses_variables_bound_in_parent():
    # reasoner_spec.rb:165-174: a top-level quickvar pattern binds ?x,
    # and a rule's consequent uses that parent binding
    check_data(
        ":a :b :c.\n?x :b :c.\n{:a :b :c} => {?x :d :e}.",
        ":a :b :c; :d :e.")


def test_nested_rule_is_sum_of_with_path():
    # reasoner_spec.rb:869-877 "A nested rule": inverted `is ... of`
    # builtin with a path-applied difference inside the list
    check_conclusions(
        "@prefix math: <http://www.w3.org/2000/10/swap/math#>.\n"
        '{ ?x is math:sum of (3 (8 3)!math:difference ) }'
        ' => { ?x :valueOf "3 + (8 - 3)" } .',
        '8 :valueOf "3 + (8 - 3)" .')


def test_combinatorial_concatenation():
    # reasoner_spec.rb:890-914 — cross product of typed and string
    # numeric values through math:sum then string:concatenation
    inp = (
        "@prefix string: <http://www.w3.org/2000/10/swap/string#>.\n"
        '@prefix math: <http://www.w3.org/2000/10/swap/math#>.\n'
        '"3.1415926" a :testValue.\n'
        "3.1415926 a :testValue.\n"
        '"1729" a :testValue.\n'
        "1729 a :testValue.\n"
        '"0" a :testValue.\n'
        "0 a :testValue.\n"
        "{ ?x a :testValue. ?y a :testValue.\n"
        "  (?x ?y) math:sum ?z.\n"
        '  (?x " + " ?y " = " ?z ) string:concatenation ?s\n'
        "} => { ?s a :RESULT }.")
    got = {s for s, p, o, g in run(inp).conclusions()
           if o == "<http://example.com/RESULT>"}
    want = {
        '"0 + 0 = 0"', '"0 + 1729 = 1729"', '"0 + 3.1415926 = 3.1415926"',
        '"1729 + 0 = 1729"', '"1729 + 1729 = 3458"',
        '"1729 + 3.1415926 = 1732.1415926"',
        '"3.1415926 + 0 = 3.1415926"', '"3.1415926 + 1729 = 1732.1415926"',
        '"3.1415926 + 3.1415926 = 6.2831852"',
    }
    assert got == want, got ^ want


LOGPFX = "@prefix log: <http://www.w3.org/2000/10/swap/log#>.\n"


def test_log_conclusion_super_simple():
    """reasoner_spec.rb:22-45 conclusion-super-simple: the bound ?y is
    the deductive CLOSURE formula of the subject formula (base facts +
    fired consequents + the rule itself)."""
    check_conclusions(
        LOGPFX +
        "{ { {<a> <b> <c>} => {<test> a <SUCCESS>} . <a> <b> <c>. }"
        "  log:conclusion ?y } => { ?y a :TestResult }.",
        "{ <a> <b> <c> . <test> a <SUCCESS> ."
        "  {<a> <b> <c>} => {<test> a <SUCCESS>} . } a :TestResult .")


def test_log_conclusion_simple_via_type_join():
    """reasoner_spec.rb:46-70 conclusion-simple: the subject formula is
    found by a type pattern, then log:conclusion binds its closure."""
    check_conclusions(
        LOGPFX +
        "{ {<a> <b> <c>} => {<test> a <SUCCESS>} . <a> <b> <c>. }"
        "  a :TestRule.\n"
        "{ ?x a :TestRule; log:conclusion ?y } => { ?y a :TestResult }.",
        "{ <a> <b> <c> . <test> a <SUCCESS> ."
        "  {<a> <b> <c>} => {<test> a <SUCCESS>} . } a :TestResult .")


def test_n3string_includes_nested_formulae():
    """log:n3String must serialize nested formulae WITH their contents —
    review regression: only the outer formula's direct quads were passed
    to the writer, so inner {A}=>{B} rendered as empty formulae."""
    got = run(
        LOGPFX +
        '{ { :a :b :c . { :x :y :z } => { :p :q :r } } log:n3String ?x }'
        ' => { :t :got ?x }.'
    ).conclusions()
    lits = [o for s, p, o, g in got if p.endswith("got>")]
    assert len(lits) == 1
    text = lits[0]
    assert "example.com/x" in text and "example.com/z" in text, text
    assert "example.com/p" in text and "example.com/r" in text, text
    assert "=>" in text and "{}" not in text, text


def test_content_semantics_injected_fetcher():
    """EvalContext.fetcher restores the reference's web dereference
    (log/content.rb:20-33) without a real network: any scheme the
    fetcher answers resolves; unanswered IRIs stay unbound."""
    from rdf_n3_ray.algebra.builtins import EvalContext
    from rdf_n3_ray.algebra.engine import reason
    from rdf_n3_ray.parser.n3_parser import parse_n3

    remote = {
        "http://remote.example/doc.n3":
            "@prefix : <http://ex/> . :a :b :c .",
        "http://remote.example/note.txt": "hello web",
    }
    ctx = EvalContext(fetcher=remote.get)
    pre = ("@prefix : <http://ex/>. "
           "@prefix log: <http://www.w3.org/2000/10/swap/log#>. ")

    # log:content binds the fetched text
    p = parse_n3(pre + "{ <http://remote.example/note.txt> log:content ?c }"
                 " => { :r :got ?c } .", list_terms=True)
    out = reason(p.quads, think=True, ctx=ctx).conclusions()
    assert ('<http://ex/r>', '<http://ex/got>', '"hello web"',
            None) in out

    # log:semantics parses the fetched N3; log:includes sees its quads
    p = parse_n3(pre + "{ <http://remote.example/doc.n3> log:semantics ?f ."
                 " ?f log:includes { :a :b :c } } => { :r :ok true } .",
                 list_terms=True)
    out = reason(p.quads, think=True, ctx=ctx).conclusions()
    assert any(q[0] == "<http://ex/r>" for q in out), out

    # an IRI the fetcher does not answer stays unbound (no crash)
    p = parse_n3(pre + "{ <http://other.example/x> log:content ?c }"
                 " => { :r :got ?c } .", list_terms=True)
    out = reason(p.quads, think=True, ctx=ctx).conclusions()
    assert out == []

    # without a fetcher, http IRIs never resolve (hardened default)
    p = parse_n3(pre + "{ <http://remote.example/note.txt> log:content ?c }"
                 " => { :r :got ?c } .", list_terms=True)
    out = reason(p.quads, think=True).conclusions()
    assert out == []


# --- SLOW-shape fixpoint scale (suite_helper.rb:124-177 tags the
# reference's 1k-10k-triple inputs SLOW and skips them in CI; these are
# reduced-size analogues that must stay fast thanks to the _match_bgp
# predicate/(predicate,subject) fact index) -----------------------------

def test_chain_transitive_closure_60():
    """01etc_graph-N shape: linear chain reachability closure."""
    import time

    n = 60
    facts = " ".join(f":n{i} :edge :n{i+1} ." for i in range(n))
    doc = f"""@prefix : <http://ex/>. {facts}
{{ ?x :edge ?y }} => {{ ?x :reach ?y }} .
{{ ?x :reach ?y . ?y :edge ?z }} => {{ ?x :reach ?z }} ."""
    t0 = time.perf_counter()
    r = reason_n3(doc, think=True)
    elapsed = time.perf_counter() - t0
    reach = {(q[0], q[2]) for q in r.data() if q[1] == "<http://ex/reach>"}
    want = {(f"<http://ex/n{i}>", f"<http://ex/n{j}>")
            for i in range(n + 1) for j in range(i + 1, n + 1)}
    assert reach == want
    # the pre-index engine took 107s here vs ~1.4s now; a 45s bound
    # guards the O(|solutions| * |KB|) regression class with a 30x
    # noise margin (this host's contention can stretch wall time ~3x)
    assert elapsed < 45, f"closure too slow: {elapsed:.1f}s"


def test_binary_tree_ancestor_closure():
    """04test-shape: branching ancestor closure over a depth-6 tree."""
    edges = []
    for i in range(1, 64):
        edges.append(f":v{i} :child :v{2*i} .")
        edges.append(f":v{i} :child :v{2*i+1} .")
    doc = f"""@prefix : <http://ex/>. {' '.join(edges)}
{{ ?x :child ?y }} => {{ ?x :anc ?y }} .
{{ ?x :anc ?y . ?y :child ?z }} => {{ ?x :anc ?z }} ."""
    r = reason_n3(doc, think=True)
    anc = {(q[0], q[2]) for q in r.data() if q[1] == "<http://ex/anc>"}

    # every node's ancestor set = nodes on its root path
    def ancestors(k):
        out = set()
        while k > 1:
            k //= 2
            out.add(k)
        return out

    want = {(f"<http://ex/v{a}>", f"<http://ex/v{k}>")
            for k in range(2, 128) for a in ancestors(k)}
    assert anc == want


def test_wide_subject_join_uses_subject_index():
    """One subject with 200 objects joined against a selective pattern:
    the (predicate, subject) probe keeps this linear."""
    facts = " ".join(f":hub :links :t{i} ." for i in range(200))
    doc = f"""@prefix : <http://ex/>. {facts}
:t7 :special true . :t42 :special true .
{{ :hub :links ?t . ?t :special true }} => {{ ?t a :Hit }} ."""
    r = reason_n3(doc, think=True)
    hits = {q[0] for q in r.data()
            if q[1] == "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
            and q[2] == "<http://ex/Hit>"}
    assert hits == {"<http://ex/t7>", "<http://ex/t42>"}


def test_chain_closure_300_semi_naive():
    """graph-1000-shape at n=300: semi-naive delta evaluation plus the
    persistent KB index keep deep closures near-linear per iteration
    (45k derived triples; took 31s pre-semi-naive, ~1s after — the 30s
    bound pins the complexity class, not the exact timing)."""
    import time

    n = 300
    facts = " ".join(f":n{i} :edge :n{i+1} ." for i in range(n))
    doc = f"""@prefix : <http://ex/>. {facts}
{{ ?x :edge ?y }} => {{ ?x :reach ?y }} .
{{ ?x :reach ?y . ?y :edge ?z }} => {{ ?x :reach ?z }} ."""
    t0 = time.perf_counter()
    r = reason_n3(doc, think=True, max_iterations=n + 5)
    elapsed = time.perf_counter() - t0
    reach = sum(1 for q in r.data() if q[1] == "<http://ex/reach>")
    assert reach == n * (n + 1) // 2
    assert elapsed < 30, f"closure too slow: {elapsed:.1f}s"


def test_parsedAsN3_inherits_outer_base_uri():
    """reasoner_spec.rb:273-321 'i18n': the inner parse of
    log:parsedAsN3 resolves relative IRIs against the OUTER document's
    base (parsed_as_n3.rb:21 merges @options) — without inheritance the
    parsed formula's IRIs stay relative and never unify."""
    from rdf_n3_ray.algebra.engine import reason_n3

    r = reason_n3(
        '@prefix log: <http://www.w3.org/2000/10/swap/log#>.\n'
        '{":㐭 :b :c." log:parsedAsN3 ?x} => {?x a log:Formula} .',
        think=True, base_uri="http://example.com/")
    inner = [q for q in r.conclusions() if q[1] == "<http://example.com/b>"]
    assert inner, r.conclusions()
    assert inner[0][0] == "<http://example.com/㐭>"
    assert inner[0][2] == "<http://example.com/c>"


def test_urllib_fetcher_real_http_loopback():
    """The shipped stdlib fetcher drives a REAL HTTP exchange against a
    loopback http.server — closing the reference's web-dereference gap
    (log/content.rb:20-33) with no mocks: log:semantics parses a
    document served over the wire, log:content binds its text."""
    import http.server
    import threading

    from rdf_n3_ray.algebra.builtins import EvalContext
    from rdf_n3_ray.algebra.engine import reason
    from rdf_n3_ray.parser.n3_parser import parse_n3
    from rdf_n3_ray.sources.webfetch import urllib_fetcher

    doc = b"@prefix : <http://ex/> . :a :b :c ."

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            body = doc if self.path == "/doc.n3" else b"hello web"
            ctype = ("text/n3" if self.path == "/doc.n3"
                     else "text/plain; charset=utf-8")
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # keep pytest output clean
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        ctx = EvalContext(fetcher=urllib_fetcher())
        pre = ("@prefix : <http://ex/>. "
               "@prefix log: <http://www.w3.org/2000/10/swap/log#>. ")

        p = parse_n3(
            pre + f"{{ <http://127.0.0.1:{port}/note.txt> log:content ?c }}"
            " => { :r :got ?c } .", list_terms=True)
        out = reason(p.quads, think=True, ctx=ctx).conclusions()
        assert ('<http://ex/r>', '<http://ex/got>', '"hello web"',
                None) in out

        p = parse_n3(
            pre + f"{{ <http://127.0.0.1:{port}/doc.n3> log:semantics ?f ."
            " ?f log:includes { :a :b :c } } => { :r :ok true } .",
            list_terms=True)
        out = reason(p.quads, think=True, ctx=ctx).conclusions()
        assert any(q[0] == "<http://ex/r>" for q in out), out

        # non-http schemes return None -> file:// path still applies
        assert urllib_fetcher()("file:///etc/hosts") is None
    finally:
        srv.shutdown()
        srv.server_close()


def test_urllib_fetcher_blocks_redirect_before_follow():
    """A 302 to an off-allowlist scheme raises in redirect_request —
    BEFORE urllib opens a connection to the target.  (Had the hop been
    followed, the ftp:// target below would surface as a URLError from
    the FTP handler, not our ValueError.)  In-allowlist redirects are
    still followed."""
    import http.server
    import threading

    import pytest

    from rdf_n3_ray.sources.webfetch import urllib_fetcher

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/hop-ftp":
                self.send_response(302)
                self.send_header("Location", "ftp://127.0.0.1:1/pwn")
                self.send_header("Content-Length", "0")
                self.end_headers()
            elif self.path == "/hop-ok":
                self.send_response(302)
                self.send_header("Location", "/doc")
                self.send_header("Content-Length", "0")
                self.end_headers()
            else:
                body = b"landed"
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/plain; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        port = srv.server_address[1]
        fetch = urllib_fetcher()
        with pytest.raises(ValueError, match="redirect"):
            fetch(f"http://127.0.0.1:{port}/hop-ftp")
        # downgrade check: https-only caller, redirect lands on http
        with pytest.raises(ValueError, match="redirect"):
            urllib_fetcher(allowed_schemes=("https", "http"))  # sanity: builds
            # (can't serve https in-sandbox; exercise the downgrade rule
            # by allowlisting a scheme the hop target is not)
            urllib_fetcher(allowed_schemes=("http",))(
                f"http://127.0.0.1:{port}/hop-ftp")
        assert fetch(f"http://127.0.0.1:{port}/hop-ok") == "landed"
    finally:
        srv.shutdown()
        srv.server_close()


def test_urllib_fetcher_size_cap():
    """Over-cap responses raise (the builtin then simply fails to
    bind) — a rule must not OOM a worker by dereferencing a huge URL."""
    import http.server
    import threading

    import pytest

    from rdf_n3_ray.sources.webfetch import urllib_fetcher

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            body = b"x" * 2048
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        port = srv.server_address[1]
        with pytest.raises(ValueError, match="cap"):
            urllib_fetcher(max_bytes=1024)(f"http://127.0.0.1:{port}/big")
    finally:
        srv.shutdown()
        srv.server_close()


def test_reason_result_carries_reader_prefixes():
    """reason_n3 surfaces the document's declared prefixes so the CLI
    writer reuses them (the reference's script/reason passes reader
    prefixes to the writer)."""
    from rdf_n3_ray.algebra.engine import reason_n3
    from rdf_n3_ray.serializer.n3_writer import serialize_n3

    r = reason_n3("@prefix ex: <http://example.org/> . ex:a ex:p ex:o ."
                  " { ?x ex:p ex:o } => { ?x a ex:T } .", think=True)
    assert r.prefixes["ex"] == "http://example.org/"
    out = serialize_n3(r.conclusions(), prefixes=r.prefixes)
    assert "@prefix ex: <http://example.org/> ." in out
    assert "ex:a a ex:T ." in out
