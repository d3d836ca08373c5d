"""Vendored W3C-N3-suite-style conformance corpus (FIXTURES.md §3).

Shape mirrors the manifest entries of the reference suite
(/root/reference/spec/suite_helper.rb:71-103): case_id, case_type
(PositiveSyntax | NegativeSyntax | Eval | Reason), input, expected.

Expected outputs are hand-derived N-Triples/N-Quads per the grammar
productions of reader.rb (cited in SURVEY.md §2.2) — modeled on the
cwm/N3-CG suite cases the reference runs.  Eval comparison is
graph-isomorphism; the aggregate P/R >= 0.95 gate is computed over all
Eval cases (BASELINE.md).
"""

B = "http://example.org/base/"
X = "http://ex/"
RDFNS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"
LOG = "http://www.w3.org/2000/10/swap/log#"
OWL = "http://www.w3.org/2002/07/owl#"

# (case_id, case_type, input_n3, expected_nquads_or_None, options)
CASES = [
    # --- positive syntax ------------------------------------------------
    ("syntax_empty", "PositiveSyntax", "", None, {}),
    ("syntax_comment_only", "PositiveSyntax", "# nothing here\n", None, {}),
    ("syntax_dirs", "PositiveSyntax",
     "@prefix p: <http://a/>. @base <http://b/>. PREFIX q: <http://c/>\np:x q:y <z> .", None, {}),
    ("syntax_keywords_as_names", "PositiveSyntax",
     "@prefix : <http://ex/>. :has :is :of .", None, {}),
    ("syntax_semicolons", "PositiveSyntax",
     "@prefix : <http://ex/>. :s :p :o ; ; :q :r ; .", None, {}),
    ("syntax_unicode_pname", "PositiveSyntax",
     "@prefix : <http://ex/>. :héllo :wörld :ñame .", None, {}),
    ("syntax_numeric_local", "PositiveSyntax",
     "@prefix : <http://ex/>. :1 :2.3a :x .", None, {}),
    ("syntax_nested_formula", "PositiveSyntax",
     "@prefix : <http://ex/>. { { { :a :b :c } :d :e } :f :g } :h :i .", None, {}),
    ("syntax_quickvar_pol", "PositiveSyntax",
     "@prefix : <http://ex/>. ?x :p ?y ; :q ?z .", None, {}),
    # --- negative syntax (validate mode must error) --------------------
    ("neg_missing_dot", "NegativeSyntax", "@prefix : <http://ex/>. :a :b :c", None, {}),
    ("neg_unterminated_string", "NegativeSyntax", '@prefix : <http://ex/>. :a :b "x .', None, {}),
    ("neg_prefix_unterminated", "NegativeSyntax", "@prefix : <http://ex/>\n:a :b :c .", None, {}),
    ("neg_sparql_prefix_dot", "NegativeSyntax", "PREFIX : <http://ex/> .\n:a :b :c .", None, {}),
    ("neg_bad_iri", "NegativeSyntax", "<a b> <c> <d> .", None, {}),
    ("neg_open_bracket", "NegativeSyntax", "@prefix : <http://ex/>. :a :b [ :c :d .", None, {}),
    ("neg_open_formula", "NegativeSyntax", "@prefix : <http://ex/>. { :a :b :c .", None, {}),
    ("neg_double_object_comma", "NegativeSyntax", "@prefix : <http://ex/>. :a :b , .", None, {}),
    # --- eval: triples --------------------------------------------------
    ("eval_simple", "Eval",
     "@prefix : <http://ex/>. :a :b :c .",
     f"<{X}a> <{X}b> <{X}c> .", {}),
    ("eval_pol", "Eval",
     "@prefix : <http://ex/>. :a :b :c ; :d :e , :f .",
     f"<{X}a> <{X}b> <{X}c> .\n<{X}a> <{X}d> <{X}e> .\n<{X}a> <{X}d> <{X}f> .", {}),
    ("eval_a_type", "Eval",
     "@prefix : <http://ex/>. :a a :T .",
     f"<{X}a> <{RDFNS}type> <{X}T> .", {}),
    ("eval_sameas", "Eval",
     "@prefix : <http://ex/>. :a = :b .",
     f"<{X}a> <{OWL}sameAs> <{X}b> .", {}),
    ("eval_inverted", "Eval",
     "@prefix : <http://ex/>. :a is :p of :b . :c <- :q :d .",
     f"<{X}b> <{X}p> <{X}a> .\n<{X}d> <{X}q> <{X}c> .", {}),
    ("eval_has", "Eval",
     "@prefix : <http://ex/>. :a has :p :b .",
     f"<{X}a> <{X}p> <{X}b> .", {}),
    ("eval_integer", "Eval",
     "@prefix : <http://ex/>. :s :p 42, -7, +3 .",
     f'<{X}s> <{X}p> "42"^^<{XSD}integer> .\n'
     f'<{X}s> <{X}p> "-7"^^<{XSD}integer> .\n'
     f'<{X}s> <{X}p> "+3"^^<{XSD}integer> .', {}),
    ("eval_decimal_double", "Eval",
     "@prefix : <http://ex/>. :s :p 3.14, .5, 2.E3, 1e0 .",
     f'<{X}s> <{X}p> "3.14"^^<{XSD}decimal> .\n'
     f'<{X}s> <{X}p> "0.5"^^<{XSD}decimal> .\n'
     f'<{X}s> <{X}p> "2.0E3"^^<{XSD}double> .\n'
     f'<{X}s> <{X}p> "1e0"^^<{XSD}double> .', {}),
    ("eval_booleans", "Eval",
     "@prefix : <http://ex/>. :s :p true, false .",
     f'<{X}s> <{X}p> "true"^^<{XSD}boolean> .\n'
     f'<{X}s> <{X}p> "false"^^<{XSD}boolean> .', {}),
    ("eval_strings", "Eval",
     "@prefix : <http://ex/>. :s :p \"a\", 'b', \"\"\"c\nd\"\"\", '''e''' .",
     f'<{X}s> <{X}p> "a" .\n<{X}s> <{X}p> "b" .\n<{X}s> <{X}p> "c\\nd" .\n<{X}s> <{X}p> "e" .', {}),
    ("eval_langtag", "Eval",
     '@prefix : <http://ex/>. :s :p "x"@en, "y"@fr-BE .',
     f'<{X}s> <{X}p> "x"@en .\n<{X}s> <{X}p> "y"@fr-be .', {}),
    ("eval_datatype", "Eval",
     '@prefix : <http://ex/>. @prefix xsd: <http://www.w3.org/2001/XMLSchema#>. :s :p "2024-01-01"^^xsd:date .',
     f'<{X}s> <{X}p> "2024-01-01"^^<{XSD}date> .', {}),
    ("eval_string_escapes", "Eval",
     '@prefix : <http://ex/>. :s :p "tab\\there\\nnl \\u00e9" .',
     f'<{X}s> <{X}p> "tab\\there\\nnl é" .', {}),
    ("eval_bnode_label", "Eval",
     "@prefix : <http://ex/>. _:x :p _:y . _:y :q _:x .",
     f"_:A <{X}p> _:B .\n_:B <{X}q> _:A .", {}),
    ("eval_anon", "Eval",
     "@prefix : <http://ex/>. [] :p :o .",
     f"_:A <{X}p> <{X}o> .", {}),
    ("eval_bnode_pl", "Eval",
     "@prefix : <http://ex/>. :s :p [ :q :r ; :t :u ] .",
     f"_:A <{X}q> <{X}r> .\n_:A <{X}t> <{X}u> .\n<{X}s> <{X}p> _:A .", {}),
    ("eval_bnode_pl_subject", "Eval",
     "@prefix : <http://ex/>. [ :p :o ] :q :r .",
     f"_:A <{X}p> <{X}o> .\n_:A <{X}q> <{X}r> .", {}),
    ("eval_ipl", "Eval",
     "@prefix : <http://ex/>. [ id :node :p :o ] .",
     f"<{X}node> <{X}p> <{X}o> .", {}),
    ("eval_collection", "Eval",
     "@prefix : <http://ex/>. :s :p ( :a :b ) .",
     f"_:A <{RDFNS}first> <{X}a> .\n_:A <{RDFNS}rest> _:B .\n"
     f"_:B <{RDFNS}first> <{X}b> .\n_:B <{RDFNS}rest> <{RDFNS}nil> .\n"
     f"<{X}s> <{X}p> _:A .", {}),
    ("eval_empty_collection", "Eval",
     "@prefix : <http://ex/>. :s :p ( ) .",
     f"<{X}s> <{X}p> <{RDFNS}nil> .", {}),
    ("eval_collection_subject", "Eval",
     "@prefix : <http://ex/>. ( :a ) :p :o .",
     f"_:A <{RDFNS}first> <{X}a> .\n_:A <{RDFNS}rest> <{RDFNS}nil> .\n_:A <{X}p> <{X}o> .", {}),
    ("eval_path_forward", "Eval",
     "@prefix : <http://ex/>. :a!:b :p :o .",
     f"<{X}a> <{X}b> _:A .\n_:A <{X}p> <{X}o> .", {}),
    ("eval_path_reverse", "Eval",
     "@prefix : <http://ex/>. :a^:b :p :o .",
     f"_:A <{X}b> <{X}a> .\n_:A <{X}p> <{X}o> .", {}),
    ("eval_formula", "Eval",
     "@prefix : <http://ex/>. { :a :b :c } => { :d :e :f } .",
     f"<{X}a> <{X}b> <{X}c> _:F1 .\n<{X}d> <{X}e> <{X}f> _:F2 .\n"
     f"_:F1 <{LOG}implies> _:F2 .", {}),
    ("eval_implied_by", "Eval",
     "@prefix : <http://ex/>. { :a :b :c } <= { :d :e :f } .",
     f"<{X}a> <{X}b> <{X}c> _:F1 .\n<{X}d> <{X}e> <{X}f> _:F2 .\n"
     f"_:F2 <{LOG}implies> _:F1 .", {}),
    ("eval_quickvars", "Eval",
     "@prefix : <http://ex/>. { ?x :p :o } => { ?x :q :r } .",
     f"?x <{X}p> <{X}o> _:F1 .\n?x <{X}q> <{X}r> _:F2 .\n_:F1 <{LOG}implies> _:F2 .", {}),
    ("eval_base_resolution", "Eval",
     "@base <http://base/dir/> . <rel> </abs> <#frag> .",
     "<http://base/dir/rel> <http://base/abs> <http://base/dir/#frag> .", {}),
    ("eval_default_prefix_base", "Eval",
     "@prefix : <doc#> . :a :b :c .",
     f"<{B}doc#a> <{B}doc#b> <{B}doc#c> .", {"base_uri": B}),
    ("eval_pname_escapes", "Eval",
     "@prefix : <http://ex/>. :s :p :a\\.b .",
     f"<{X}s> <{X}p> <{X}a.b> .", {}),
    ("eval_preseeded_ns", "Eval",
     ":s rdf:type log:Formula .",
     f"<{B}s> <{RDFNS}type> <{LOG}Formula> .", {"base_uri": B}),
    ("eval_list_terms_mode", "Eval",
     "@prefix : <http://ex/>. :s :p ( 1 2 ) .",
     f'<{X}s> <{X}p> ("1"^^<{XSD}integer> "2"^^<{XSD}integer>) .', {"list_terms": True}),
    # --- reason cases ---------------------------------------------------
    ("reason_socrates", "Reason",
     "@prefix : <http://ex/>. :sok a :Man . { ?w a :Man } => { ?w a :Mortal } .",
     f"<{X}sok> <{RDFNS}type> <{X}Man> .\n<{X}sok> <{RDFNS}type> <{X}Mortal> .",
     {"think": True, "data": True}),
    ("reason_chain", "Reason",
     "@prefix : <http://ex/>. :a :r :b . :b :r :c . { ?x :r ?y . ?y :r ?z } => { ?x :rr ?z } .",
     f"<{X}a> <{X}r> <{X}b> .\n<{X}b> <{X}r> <{X}c> .\n<{X}a> <{X}rr> <{X}c> .",
     {"think": True, "data": True}),
    ("reason_math", "Reason",
     "@prefix : <http://ex/>. @prefix math: <http://www.w3.org/2000/10/swap/math#>. "
     "{ (2 3) math:sum ?s } => { :r :val ?s } .",
     f'<{X}r> <{X}val> "5"^^<{XSD}integer> .',
     {"think": True, "conclusions": True}),
    ("reason_member_fanout", "Reason",
     "@prefix : <http://ex/>. @prefix list: <http://www.w3.org/2000/10/swap/list#>. "
     "{ ( :x :y ) list:member ?m } => { ?m a :Member } .",
     f"<{X}x> <{RDFNS}type> <{X}Member> .\n<{X}y> <{RDFNS}type> <{X}Member> .",
     {"think": True, "conclusions": True}),
]

# --- round-2 additions: paths, scoping, numerics, negatives ---------------
CASES += [
    # chained paths (reader.rb:431-458 process_path chains bnodes)
    ("eval_path_chain", "Eval",
     "@prefix : <http://ex/>. :a!:b!:c :p :o .",
     f"<{X}a> <{X}b> _:A .\n_:A <{X}c> _:B .\n_:B <{X}p> <{X}o> .", {}),
    ("eval_path_mixed", "Eval",
     "@prefix : <http://ex/>. :a!:b^:c :p :o .",
     f"<{X}a> <{X}b> _:A .\n_:B <{X}c> _:A .\n_:B <{X}p> <{X}o> .", {}),
    ("eval_path_in_object", "Eval",
     "@prefix : <http://ex/>. :s :p :a!:b .",
     f"<{X}a> <{X}b> _:A .\n<{X}s> <{X}p> _:A .", {}),
    # bnode label scoping: same label in different formulae = distinct
    # nodes (reader.rb:743-758 @bn_mapper per formula)
    ("eval_bnode_scope_formulae", "Eval",
     "@prefix : <http://ex/>. { _:x :p :a } :r { _:x :p :b } .",
     f"_:X1 <{X}p> <{X}a> _:F1 .\n_:X2 <{X}p> <{X}b> _:F2 .\n"
     f"_:F1 <{X}r> _:F2 .", {}),
    # quickvar shared across formulae: ONE document-scoped variable
    # (reader.rb:681-689)
    ("eval_quickvar_document_scope", "Eval",
     "@prefix : <http://ex/>. { ?w :p :a } :r { ?w :p :b } .",
     f"?w <{X}p> <{X}a> _:F1 .\n?w <{X}p> <{X}b> _:F2 .\n"
     f"_:F1 <{X}r> _:F2 .", {}),
    # numeric canonicalization quirk: `1.e5` -> `1.0e5` (reader.rb:476)
    ("eval_double_dot_e", "Eval",
     "@prefix : <http://ex/>. :s :p 1.e5 .",
     f'<{X}s> <{X}p> "1.0e5"^^<{XSD}double> .', {}),
    ("eval_double_neg_exp", "Eval",
     "@prefix : <http://ex/>. :s :p -2.5E-3 .",
     f'<{X}s> <{X}p> "-2.5E-3"^^<{XSD}double> .', {}),
    # reference only prefixes 0 when the lexical form STARTS with "."
    # (reader.rb:473) — "-.5" keeps its form
    ("eval_decimal_leading_dot_neg", "Eval",
     "@prefix : <http://ex/>. :s :p -.5 .",
     f'<{X}s> <{X}p> "-.5"^^<{XSD}decimal> .', {}),
    # anon bnodes in both positions
    ("eval_anon_subject_object", "Eval",
     "@prefix : <http://ex/>. [] :p [] .",
     f"_:A <{X}p> _:B .", {}),
    # empty blankNodePropertyList-ish: [] with following POL
    ("eval_bnode_pl_then_pol", "Eval",
     "@prefix : <http://ex/>. [ :q :r ] :p :o .",
     f"_:A <{X}q> <{X}r> .\n_:A <{X}p> <{X}o> .", {}),
    # nested collections
    ("eval_nested_collection", "Eval",
     "@prefix : <http://ex/>. :s :p ( ( :a ) :b ) .",
     f"_:I <{RDFNS}first> <{X}a> .\n_:I <{RDFNS}rest> <{RDFNS}nil> .\n"
     f"_:A <{RDFNS}first> _:I .\n_:A <{RDFNS}rest> _:B .\n"
     f"_:B <{RDFNS}first> <{X}b> .\n_:B <{RDFNS}rest> <{RDFNS}nil> .\n"
     f"<{X}s> <{X}p> _:A .", {}),
    # inverted verb sugar `<-` (reader.rb:405-409)
    ("eval_arrow_inverted", "Eval",
     "@prefix : <http://ex/>. :a <- :b :c .",
     f"<{X}c> <{X}b> <{X}a> .", {}),
    # `is ... of` inversion (reader.rb:398-404)
    ("eval_is_of", "Eval",
     "@prefix : <http://ex/>. :child is :parentOf of :dad .",
     f"<{X}dad> <{X}parentOf> <{X}child> .", {}),
    # datatype via pname (reader.rb:487)
    ("eval_datatype_pname", "Eval",
     "@prefix : <http://ex/>. @prefix xsd: <http://www.w3.org/2001/XMLSchema#>. "
     ':s :p "5"^^xsd:int .',
     f'<{X}s> <{X}p> "5"^^<{XSD}int> .', {}),
    # long string containing quotes and newline
    ("eval_long_string_quotes", "Eval",
     '@prefix : <http://ex/>. :s :p """a "quoted" and\nnew""" .',
     f'<{X}s> <{X}p> "a \\"quoted\\" and\\nnew" .', {}),
    # comments interleaved between tokens
    ("eval_comments_between_tokens", "Eval",
     "@prefix : <http://ex/>. :s # c1\n :p # c2\n :o . # done",
     f"<{X}s> <{X}p> <{X}o> .", {}),
    # trailing semicolon before dot (legal)
    ("eval_trailing_semicolon", "Eval",
     "@prefix : <http://ex/>. :s :p :o ; .",
     f"<{X}s> <{X}p> <{X}o> .", {}),
    # formula as object of ordinary predicate
    ("eval_formula_as_object", "Eval",
     "@prefix : <http://ex/>. :s :says { :a :b :c } .",
     f"<{X}a> <{X}b> <{X}c> _:F1 .\n<{X}s> <{X}says> _:F1 .", {}),
    # empty formula as term
    ("eval_empty_formula", "Eval",
     "@prefix : <http://ex/>. :s :p { } .",
     f"<{X}s> <{X}p> _:F1 .", {}),
    # --- negatives -----------------------------------------------------
    ("neg_bad_langtag", "NegativeSyntax",
     '@prefix : <http://ex/>. :a :b "x"@123 .', None, {}),
    ("neg_double_dot", "NegativeSyntax",
     "@prefix : <http://ex/>. :a :b :c . .", None, {}),
    ("neg_prefix_missing_iri", "NegativeSyntax",
     "@prefix : .\n:a :b :c .", None, {}),
    ("neg_unclosed_collection", "NegativeSyntax",
     "@prefix : <http://ex/>. :s :p ( :a :b .", None, {}),
    ("neg_bad_string_escape", "NegativeSyntax",
     '@prefix : <http://ex/>. :a :b "bad\\q" .', None, {}),
    ("neg_bad_unicode_escape", "NegativeSyntax",
     '@prefix : <http://ex/>. :a :b "\\uZZZZ" .', None, {}),
    # NB `:a 5 :c .` is syntactically LEGAL N3 (predicate ::= path
    # which admits literals, reader.rb:392-458) — not a negative case
]

# --- round-2 additions: transcribed from the reference's own reader
# spec tables (/root/reference/spec/reader_spec.rb — literal encodings
# :143-220, URI creation :303-347, syntactic expressions :351-492,
# prefixes/bases :518-654, BNodes/collections/paths :655-985,
# iriPropertyList :986-1064, formulae :1065-1203, validation
# :1349-1376).  base_uri http://a/b unless stated; default prefix
# resolves to http://a/b# (reference appends # to a hashless base).
A = "http://a/b#"
AB = "http://a/b"
FOO = "http://foo/a#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
_OB = {"base_uri": AB}

CASES += [
    # --- literal encodings (reader_spec.rb:143-220) ---------------------
    ("r2_lit_unicode_escape", "Eval", ':a :b "D\\u00FCrst" .',
     f'<{A}a> <{A}b> "Dürst" .', _OB),
    ("r2_lit_backslash", "Eval", ':a :b "backslash:\\\\" .',
     f'<{A}a> <{A}b> "backslash:\\\\" .', _OB),
    ("r2_lit_dquote", "Eval", ':a :b "dquote:\\"" .',
     f'<{A}a> <{A}b> "dquote:\\"" .', _OB),
    ("r2_lit_newline", "Eval", ':a :b "newline:\\n" .',
     f'<{A}a> <{A}b> "newline:\\n" .', _OB),
    ("r2_lit_return", "Eval", ':a :b "return:\\r" .',
     f'<{A}a> <{A}b> "return:\\r" .', _OB),
    ("r2_lit_tab", "Eval", ':a :b "tab:\\t" .',
     f'<{A}a> <{A}b> "tab:\\t" .', _OB),
    ("r2_lit_euro", "Eval", ':a :b "\\u20AC" .',
     f'<{A}a> <{A}b> "€" .', _OB),
    ("r2_lit_raw_unicode", "Eval", ':a :resume "resumé" .',
     f'<{A}a> <{A}resume> "resumé" .', _OB),
    ("r2_lit_long_escape", "Eval",
     '@prefix : <http://example.org/foo#> . :a :b """\\U00015678another""" .',
     '<http://example.org/foo#a> <http://example.org/foo#b> "\U00015678another" .', _OB),
    ("r2_lit_long_single_escape", "Eval",
     "@prefix : <http://example.org/foo#> . :a :b '''\\U00015678another''' .",
     '<http://example.org/foo#a> <http://example.org/foo#b> "\U00015678another" .', _OB),
    ("r2_lit_string3_trailing_dquote", "Eval", ':a :b """ " """ .',
     f'<{A}a> <{A}b> " \\" " .', _OB),
    ("r2_lit_string3_cwm_regression", "Eval",
     ':a :b """sameDan.n3 sameThing.n3 --think --apply=forgetDups.n3 --purge --n3="/" """ .',
     f'<{A}a> <{A}b> "sameDan.n3 sameThing.n3 --think --apply=forgetDups.n3 --purge --n3=\\"/\\" " .', _OB),
    ("r2_lit_xmlliteral_dt", "Eval",
     f'<http://example.org/r25> <http://example.org/p> "<a></a>"^^<{RDFS}XMLLiteral> .',
     f'<http://example.org/r25> <http://example.org/p> "<a></a>"^^<{RDFS}XMLLiteral> .', _OB),
    ("r2_lit_lang_fr", "Eval",
     '<http://example.org/r30> <http://example.org/p> "chat"@fr .',
     '<http://example.org/r30> <http://example.org/p> "chat"@fr .', _OB),
    ("r2_lit_mixed_case_lang", "Eval", ':x2 :p "xyz"@En .',
     f'<{A}x2> <{A}p> "xyz"@en .', _OB),
    ("r2_lit_custom_datatype", "Eval",
     '<http://example.org/r32> <http://example.org/p> "abc"^^<http://example.org/datatype1> .',
     '<http://example.org/r32> <http://example.org/p> "abc"^^<http://example.org/datatype1> .', _OB),
    # --- URI creation (reader_spec.rb:303-347) --------------------------
    ("r2_uri_relative_resolution", "Eval", '<joe> <knows> <jane> .',
     '<http://a/joe> <http://a/knows> <http://a/jane> .', _OB),
    ("r2_uri_percent_encoded", "Eval",
     '<#D%C3%BCrst> a "URI percent ^encoded as C3, BC".',
     f'<{A}D%C3%BCrst> <{RDFNS}type> "URI percent ^encoded as C3, BC" .', _OB),
    ("r2_uri_utf8_fragment", "Eval", '<#Dürst> :knows :jane.',
     f'<{A}Dürst> <{A}knows> <{A}jane> .', _OB),
    ("r2_uri_utf8_pname", "Eval", ':Dürst :knows :jane.',
     f'<{A}Dürst> <{A}knows> <{A}jane> .', _OB),
    ("r2_uri_unicode_local", "Eval", ':a :related :ひらがな .',
     f'<{A}a> <{A}related> <{A}ひらがな> .', _OB),
    # --- syntactic expressions (reader_spec.rb:351-492) -----------------
    ("r2_empty_iri_prefix", "Eval", '@prefix : <> . <> a :a.',
     f'<{AB}> <{RDFNS}type> <http://a/ba> .', _OB),
    ("r2_hash_iri_prefix", "Eval", '@prefix : <#> . <#> a :a.',
     f'<{AB}#> <{RDFNS}type> <{A}a> .', _OB),
    ("r2_a_as_type", "Eval",
     f'@prefix a: <{FOO}> . a:b a <{RDFS}resource> .',
     f'<{FOO}b> <{RDFNS}type> <{RDFS}resource> .', _OB),
    ("r2_is_of_literal_subject", "Eval", '"value" is :prop of :b .',
     f'<{A}b> <{A}prop> "value" .', _OB),
    ("r2_arrow_literal_subject", "Eval", '"value" <- :prop :b .',
     f'<{A}b> <{A}prop> "value" .', _OB),
    ("r2_is_of_object_list", "Eval", '"value" is :prop of :b, :c .',
     f'<{A}b> <{A}prop> "value" .\n<{A}c> <{A}prop> "value" .', _OB),
    ("r2_is_of_bnpl", "Eval", '[ is :prop of :George] .',
     f'<{A}George> <{A}prop> _:A .', _OB),
    ("r2_is_of_bnode_subject", "Eval", '_:bn is :prop of :George.',
     f'<{A}George> <{A}prop> _:A .', _OB),
    ("r2_has_pred", "Eval", f'@prefix a: <{FOO}> . a:b has :pred a:c .',
     f'<{FOO}b> <{A}pred> <{FOO}c> .', _OB),
    ("r2_implies_bnode", "Eval", f'@prefix a: <{FOO}> . _:a => a:something .',
     f'_:A <{LOG}implies> <{FOO}something> .', _OB),
    ("r2_implied_by_bnode", "Eval", f'@prefix a: <{FOO}> . _:a <= a:something .',
     f'<{FOO}something> <{LOG}implies> _:A .', _OB),
    ("r2_sameas_bnode", "Eval", f'@prefix a: <{FOO}> . _:a = a:something .',
     f'_:A <{OWL}sameAs> <{FOO}something> .', _OB),
    ("r2_num_int", "Eval", ':a :b 1 .',
     f'<{A}a> <{A}b> "1"^^<{XSD}integer> .', _OB),
    ("r2_num_neg_int", "Eval", ':a :b -1 .',
     f'<{A}a> <{A}b> "-1"^^<{XSD}integer> .', _OB),
    ("r2_num_pos_int", "Eval", ':a :b +1 .',
     f'<{A}a> <{A}b> "+1"^^<{XSD}integer> .', _OB),
    ("r2_num_decimal", "Eval", ':a :b 1.0 .',
     f'<{A}a> <{A}b> "1.0"^^<{XSD}decimal> .', _OB),
    ("r2_num_double_e1", "Eval", ':a :b 1.0e1 .',
     f'<{A}a> <{A}b> "1.0e1"^^<{XSD}double> .', _OB),
    ("r2_num_double_neg_exp", "Eval", ':a :b 1.0e-1 .',
     f'<{A}a> <{A}b> "1.0e-1"^^<{XSD}double> .', _OB),
    ("r2_num_double_pos_exp", "Eval", ':a :b 1.0e+1 .',
     f'<{A}a> <{A}b> "1.0e+1"^^<{XSD}double> .', _OB),
    ("r2_num_double_E1", "Eval", ':a :b 1.0E1 .',
     f'<{A}a> <{A}b> "1.0E1"^^<{XSD}double> .', _OB),
    ("r2_empty_localname", "Eval", ': : : .',
     f'<{A}> <{A}> <{A}> .', _OB),
    ("r2_prefix_empty_local", "Eval",
     '@prefix foo: <http://foo/bar#> . foo: foo: foo: .',
     '<http://foo/bar#> <http://foo/bar#> <http://foo/bar#> .', _OB),
    # --- prefixes / bases (reader_spec.rb:518-654) ----------------------
    ("r2_prefix_no_hash_append", "Eval",
     '@prefix : <http://foo/bar> . :a : :b .',
     '<http://foo/bara> <http://foo/bar> <http://foo/barb> .', _OB),
    ("r2_sparql_prefix_mixed_case", "Eval",
     'PrEfIx : <http://foo/bar> :a : :b .',
     '<http://foo/bara> <http://foo/bar> <http://foo/barb> .', _OB),
    ("r2_prefix_trailing_slash", "Eval",
     '@prefix : <http://foo/bar/> . :a : :b .',
     '<http://foo/bar/a> <http://foo/bar/> <http://foo/bar/b> .', _OB),
    ("r2_prefix_trailing_hash", "Eval",
     '@prefix : <http://foo/bar#> . :a : :b .',
     '<http://foo/bar#a> <http://foo/bar#> <http://foo/bar#b> .', _OB),
    ("r2_base_absolute", "Eval",
     '@base <http://foo/bar> . <> :a <b> . <#c> :d </e>.',
     '<http://foo/bar> <http://foo/bar#a> <http://foo/b> .\n'
     '<http://foo/bar#c> <http://foo/bar#d> <http://foo/e> .', _OB),
    ("r2_sparql_base_mixed_case", "Eval",
     'BaSe <http://foo/bar> <> :a <b> . <#c> :d </e>.',
     '<http://foo/bar> <http://foo/bar#a> <http://foo/b> .\n'
     '<http://foo/bar#c> <http://foo/bar#d> <http://foo/e> .', _OB),
    ("r2_base_trailing_slash", "Eval",
     '@base <http://foo/bar/> . <> :a <b> . <#c> :d </e>.',
     '<http://foo/bar/> <http://foo/bar/#a> <http://foo/bar/b> .\n'
     '<http://foo/bar/#c> <http://foo/bar/#d> <http://foo/e> .', _OB),
    ("r2_base_trailing_hash", "Eval",
     '@base <http://foo/bar#> . <> :a <b> . <#c> :d </e>.',
     '<http://foo/bar#> <http://foo/bar#a> <http://foo/b> .\n'
     '<http://foo/bar#c> <http://foo/bar#d> <http://foo/e> .', _OB),
    ("r2_base_relative_chain", "Eval",
     '@base <http://example.org/products/>. <> :a <b>, <#c>. '
     '@base <prod123/>. <> :a <b>, <#c>. @base <../>. <> :a <d>, <#e>.',
     '<http://example.org/products/> <http://example.org/products/#a> <http://example.org/products/b> .\n'
     '<http://example.org/products/> <http://example.org/products/#a> <http://example.org/products/#c> .\n'
     '<http://example.org/products/prod123/> <http://example.org/products/prod123/#a> <http://example.org/products/prod123/b> .\n'
     '<http://example.org/products/prod123/> <http://example.org/products/prod123/#a> <http://example.org/products/prod123/#c> .\n'
     '<http://example.org/products/> <http://example.org/products/#a> <http://example.org/products/d> .\n'
     '<http://example.org/products/> <http://example.org/products/#a> <http://example.org/products/#e> .', _OB),
    ("r2_base_sequential_swap", "Eval",
     '@base <http://example.com/ontolgies>. <a> :b <foo/bar#baz>.\n'
     '@base <path/DFFERENT/>. <a2> :b2 <foo/bar#baz2>.\n'
     '@prefix : <#>. <d3> :b3 <e3>.',
     '<http://example.com/a> <http://example.com/ontolgies#b> <http://example.com/foo/bar#baz> .\n'
     '<http://example.com/path/DFFERENT/a2> <http://example.com/path/DFFERENT/#b2> <http://example.com/path/DFFERENT/foo/bar#baz2> .\n'
     '<http://example.com/path/DFFERENT/d3> <http://example.com/path/DFFERENT/#b3> <http://example.com/path/DFFERENT/e3> .', _OB),
    ("r2_prefix_redefine", "Eval",
     '@prefix a: <http://host/A#>. a:b a:p a:v . '
     '@prefix a: <http://host/Z#>. a:b a:p a:v .',
     '<http://host/A#b> <http://host/A#p> <http://host/A#v> .\n'
     '<http://host/Z#b> <http://host/Z#p> <http://host/Z#v> .', _OB),
    # --- bnodes / property lists (reader_spec.rb:655-761) ---------------
    ("r2_bnode_subject", "Eval",
     '_:anon <http://example.org/property> <http://example.org/resource2> .',
     '_:A <http://example.org/property> <http://example.org/resource2> .', _OB),
    ("r2_bnode_predicate", "Eval",
     '<http://example.org/resource2> _:anon <http://example.org/object> .',
     '<http://example.org/resource2> _:A <http://example.org/object> .', _OB),
    ("r2_bnode_object", "Eval",
     '<http://example.org/resource2> <http://example.org/property> _:anon .',
     '<http://example.org/resource2> <http://example.org/property> _:A .', _OB),
    ("r2_bnpl_one_ref", "Eval",
     f'@prefix a: <{FOO}> . a:b a:oneRef [ a:pp "1" ; a:qq "2" ] .',
     f'_:A <{FOO}pp> "1" .\n_:A <{FOO}qq> "2" .\n<{FOO}b> <{FOO}oneRef> _:A .', _OB),
    ("r2_bnode_shared", "Eval",
     f'@prefix a: <{FOO}> . a:b1 a:twoRef _:a . a:b2 a:twoRef _:a . '
     '_:a :pred [ a:pp "1" ; a:qq "2" ].',
     f'<{FOO}b1> <{FOO}twoRef> _:S .\n<{FOO}b2> <{FOO}twoRef> _:S .\n'
     f'_:B <{FOO}pp> "1" .\n_:B <{FOO}qq> "2" .\n_:S <{A}pred> _:B .', _OB),
    ("r2_bnode_nested", "Eval",
     f'@prefix a: <{FOO}> . a:a a:p [ a:p2 [ a:p3 "v1" , "v2" ; a:p4 "v3" ] ; a:p5 "v4" ] .',
     f'_:I <{FOO}p3> "v1" .\n_:I <{FOO}p3> "v2" .\n_:I <{FOO}p4> "v3" .\n'
     f'_:O <{FOO}p2> _:I .\n_:O <{FOO}p5> "v4" .\n<{FOO}a> <{FOO}p> _:O .', _OB),
    ("r2_property_list", "Eval",
     f'@prefix a: <{FOO}> . a:b a:p1 "123" ; a:p1 "456" . a:b a:p2 a:v1 ; a:p3 a:v2 .',
     f'<{FOO}b> <{FOO}p1> "123" .\n<{FOO}b> <{FOO}p1> "456" .\n'
     f'<{FOO}b> <{FOO}p2> <{FOO}v1> .\n<{FOO}b> <{FOO}p3> <{FOO}v2> .', _OB),
    # --- collections (reader_spec.rb:762-924) ---------------------------
    ("r2_coll_empty", "Eval",
     '@prefix :<http://example.com/>. :empty :set ().',
     f'<http://example.com/empty> <http://example.com/set> <{RDFNS}nil> .', _OB),
    ("r2_coll_single", "Eval",
     '@prefix :<http://example.com/>. :gregg :edited ("JSON-LD").',
     f'_:A <{RDFNS}first> "JSON-LD" .\n_:A <{RDFNS}rest> <{RDFNS}nil> .\n'
     '<http://example.com/gregg> <http://example.com/edited> _:A .', _OB),
    ("r2_coll_multi", "Eval",
     '@prefix :<http://example.com/>. :gregg :name ("Gregg" "Barnum" "Kellogg").',
     f'_:A <{RDFNS}first> "Gregg" .\n_:A <{RDFNS}rest> _:B .\n'
     f'_:B <{RDFNS}first> "Barnum" .\n_:B <{RDFNS}rest> _:C .\n'
     f'_:C <{RDFNS}first> "Kellogg" .\n_:C <{RDFNS}rest> <{RDFNS}nil> .\n'
     '<http://example.com/gregg> <http://example.com/name> _:A .', _OB),
    ("r2_coll_unattached", "Eval",
     f'@prefix a: <{FOO}> . ("1" "2" "3") .\n# This is not a statement.\n() .',
     f'_:A <{RDFNS}first> "1" .\n_:A <{RDFNS}rest> _:B .\n'
     f'_:B <{RDFNS}first> "2" .\n_:B <{RDFNS}rest> _:C .\n'
     f'_:C <{RDFNS}first> "3" .\n_:C <{RDFNS}rest> <{RDFNS}nil> .', _OB),
    ("r2_coll_nil_property", "Eval",
     f'@prefix a: <{FOO}> . () a:prop "nilProp" .',
     f'<{RDFNS}nil> <{FOO}prop> "nilProp" .', _OB),
    ("r2_coll_compound_items", "Eval",
     f'@prefix a: <{FOO}> . a:a a:p ( [ a:p2 "v1" ] <http://resource1> '
     '<http://resource2> ("inner list") ) . <http://resource1> a:p "value" .',
     f'_:P2 <{FOO}p2> "v1" .\n'
     f'_:I <{RDFNS}first> "inner list" .\n_:I <{RDFNS}rest> <{RDFNS}nil> .\n'
     f'_:L1 <{RDFNS}first> _:P2 .\n_:L1 <{RDFNS}rest> _:L2 .\n'
     f'_:L2 <{RDFNS}first> <http://resource1> .\n_:L2 <{RDFNS}rest> _:L3 .\n'
     f'_:L3 <{RDFNS}first> <http://resource2> .\n_:L3 <{RDFNS}rest> _:L4 .\n'
     f'_:L4 <{RDFNS}first> _:I .\n_:L4 <{RDFNS}rest> <{RDFNS}nil> .\n'
     f'<{FOO}a> <{FOO}p> _:L1 .\n<http://resource1> <{FOO}p> "value" .', _OB),
    # --- property paths (reader_spec.rb:925-984) ------------------------
    ("r2_path_subject_bang", "Eval", ':x2!:y2 :p2 "3" .',
     f'<{A}x2> <{A}y2> _:A .\n_:A <{A}p2> "3" .', _OB),
    ("r2_path_subject_caret", "Eval", ':x2^:y2 :p2 "3" .',
     f'_:A <{A}y2> <{A}x2> .\n_:A <{A}p2> "3" .', _OB),
    ("r2_path_predicate", "Eval",
     ':albert!:mother :mentor!:inverse :auntieAnne .',
     f'<{A}albert> <{A}mother> _:A .\n<{A}mentor> <{A}inverse> _:P .\n'
     f'_:A _:P <{A}auntieAnne> .', _OB),
    ("r2_path_converse_pred", "Eval",
     ':albert :admires!:converse :grumpy .',
     f'<{A}admires> <{A}converse> _:P .\n<{A}albert> _:P <{A}grumpy> .', _OB),
    ("r2_path_list_subject", "Eval", '("1" "2")!:sum a :THREE.',
     f'_:A <{RDFNS}first> "1" .\n_:A <{RDFNS}rest> _:B .\n'
     f'_:B <{RDFNS}first> "2" .\n_:B <{RDFNS}rest> <{RDFNS}nil> .\n'
     f'_:A <{A}sum> _:S .\n_:S <{RDFNS}type> <{A}THREE> .', _OB),
    ("r2_path_related_to", "Eval",
     '(:a!:b :c^:d) :relatedTo (:e!:f!:g ) .',
     f'<{A}a> <{A}b> _:PA .\n_:PC <{A}d> <{A}c> .\n'
     f'_:L1 <{RDFNS}first> _:PA .\n_:L1 <{RDFNS}rest> _:L2 .\n'
     f'_:L2 <{RDFNS}first> _:PC .\n_:L2 <{RDFNS}rest> <{RDFNS}nil> .\n'
     f'<{A}e> <{A}f> _:E1 .\n_:E1 <{A}g> _:E2 .\n'
     f'_:R1 <{RDFNS}first> _:E2 .\n_:R1 <{RDFNS}rest> <{RDFNS}nil> .\n'
     f'_:L1 <{A}relatedTo> _:R1 .', _OB),
    ("r2_path_bare_chain", "Eval", ':joe!:mother!:office!:zip .',
     f'<{A}joe> <{A}mother> _:A .\n_:A <{A}office> _:B .\n'
     f'_:B <{A}zip> _:C .', _OB),
    ("r2_path_bare_mixed", "Eval", ':joe!:mother^:mother .',
     f'<{A}joe> <{A}mother> _:A .\n_:B <{A}mother> _:A .', _OB),
    ("r2_path_caret_literal_object", "Eval", ':a :b "lit"^:c.',
     f'_:A <{A}c> "lit" .\n<{A}a> <{A}b> _:A .', _OB),
    ("r2_path_object_chain", "Eval", ':r :p :o!:p1!:p2 .',
     f'<{A}o> <{A}p1> _:A .\n_:A <{A}p2> _:B .\n<{A}r> <{A}p> _:B .', _OB),
    # --- iriPropertyList (reader_spec.rb:986-1064) ----------------------
    ("r2_ipl_whitespace", "Eval", '[ id :s :p :o] .',
     f'<{A}s> <{A}p> <{A}o> .', _OB),
    ("r2_ipl_linefeed", "Eval", '[\n  id :s\n  :p :o\n ] .',
     f'<{A}s> <{A}p> <{A}o> .', _OB),
    ("r2_ipl_single_object", "Eval",
     f'@prefix a: <{FOO}> . a:b a:oneRef [ id a:node0 a:pp "1" ; a:qq "2" ] .',
     f'<{FOO}node0> <{FOO}pp> "1" .\n<{FOO}node0> <{FOO}qq> "2" .\n'
     f'<{FOO}b> <{FOO}oneRef> <{FOO}node0> .', _OB),
    ("r2_ipl_nested", "Eval",
     f'@prefix a: <{FOO}> . a:a a:p [ id a:node1 a:p2 [ id a:node0 '
     'a:p3 "v1" , "v2" ; a:p4 "v3" ] ; a:p5 "v4" ] .',
     f'<{FOO}node0> <{FOO}p3> "v1" .\n<{FOO}node0> <{FOO}p3> "v2" .\n'
     f'<{FOO}node0> <{FOO}p4> "v3" .\n<{FOO}node1> <{FOO}p2> <{FOO}node0> .\n'
     f'<{FOO}node1> <{FOO}p5> "v4" .\n<{FOO}a> <{FOO}p> <{FOO}node1> .', _OB),
    ("r2_neg_ipl_semicolon", "NegativeSyntax", '[ id :s ; :p :o] .', None, _OB),
    ("r2_neg_ipl_subject_list", "NegativeSyntax", '[ id :s1, :s2 :p :o] .', None, _OB),
    ("r2_neg_ipl_bnode_subject", "NegativeSyntax", '[ id _:bn :p :o] .', None, _OB),
    # --- formulae (reader_spec.rb:1065-1203) ----------------------------
    ("r2_formula_empty_object", "Eval", ':a :b {} .',
     f'<{A}a> <{A}b> _:F .', _OB),
    ("r2_formula_bnpl_inside", "Eval", ':a :b {[:c :d]} .',
     f'_:A <{A}c> <{A}d> _:F .\n<{A}a> <{A}b> _:F .', _OB),
    ("r2_formula_empty_subject", "Eval", '{} <b> <c> .',
     f'_:F <{AB}> <http://a/c> .', _OB),
    ("r2_formula_const_subject", "Eval", '{<x> <y> <z>} <b> <c> .',
     f'<http://a/x> <http://a/y> <http://a/z> _:F .\n'
     f'_:F <{AB}> <http://a/c> .', _OB),
    ("r2_formula_sameas_graph", "Eval",
     '@prefix u: <http://www.example.org/utilities#> . @prefix : <#> . '
     ':assumption = { :fred u:knows :john . :john u:knows :mary .} .',
     f'<{A}fred> <http://www.example.org/utilities#knows> <{A}john> _:F .\n'
     f'<{A}john> <http://www.example.org/utilities#knows> <{A}mary> _:F .\n'
     f'<{A}assumption> <{OWL}sameAs> _:F .', _OB),
    ("r2_object_list_two", "Eval", ':a :b :c, :d .',
     f'<{A}a> <{A}b> <{A}c> .\n<{A}a> <{A}b> <{A}d> .', _OB),
    # --- validation (reader_spec.rb:1349-1376) --------------------------
    ("r2_neg_ill_typed_integer", "NegativeSyntax",
     '@prefix xsd: <http://www.w3.org/2001/XMLSchema#> . :y :p1 "xyz"^^xsd:integer .',
     None, _OB),
    ("r2_neg_ill_typed_integer2", "NegativeSyntax",
     '@prefix xsd: <http://www.w3.org/2001/XMLSchema#> . :y :p1 "12xyz"^^xsd:integer .',
     None, _OB),
    ("r2_neg_ill_typed_double", "NegativeSyntax",
     '@prefix xsd: <http://www.w3.org/2001/XMLSchema#> . :y :p1 "xy.z"^^xsd:double .',
     None, _OB),
    ("r2_neg_ill_typed_double2", "NegativeSyntax",
     '@prefix xsd: <http://www.w3.org/2001/XMLSchema#> . :y :p1 "+1.0z"^^xsd:double .',
     None, _OB),
    ("r2_neg_missing_object", "NegativeSyntax", ':a :b .', None, _OB),
    ("r2_neg_keywords_directive", "NegativeSyntax",
     '@keywords prefix. :e prefix :f .', None, _OB),
    ("r2_pos_bnode_predicate_valid", "PositiveSyntax",
     ':y _:p1 "z" .', None, _OB),
    ("r2_pos_literal_subject_valid", "PositiveSyntax",
     '"y" :p1 "z" .', None, _OB),
    ("r2_pos_ws_tabs", "PositiveSyntax",
     ' \t <http://example.org/resource3> \t <http://example.org/property>\t '
     '<http://example.org/resource2> \t.\t ', None, _OB),
    ("r2_pos_crnl", "PositiveSyntax",
     '<http://example.org/resource4> <http://example.org/property> '
     '<http://example.org/resource2> .\r\n', None, _OB),
]

# --- round-2 Reason additions: one manifest-style entry per builtin
# family beyond math/list-member (semantics verified in the reasoner
# spec transcriptions; these pin them at suite level)
STRNS = "http://www.w3.org/2000/10/swap/string#"
TIMENS = "http://www.w3.org/2000/10/swap/time#"
CASES += [
    ("r2_reason_list_append", "Reason",
     "@prefix : <http://ex/>. @prefix list: <http://www.w3.org/2000/10/swap/list#>. "
     "{ ((1 2) (3)) list:append ?x } => { :r :is ?x }.",
     f'<{X}r> <{X}is> ("1"^^<{XSD}integer> "2"^^<{XSD}integer> "3"^^<{XSD}integer>) .',
     {"think": True, "conclusions": True}),
    ("r2_reason_string_concat", "Reason",
     f"@prefix : <http://ex/>. @prefix string: <{STRNS}>. "
     '{ ("ab" "cd") string:concatenation ?c } => { :r :is ?c }.',
     f'<{X}r> <{X}is> "abcd" .',
     {"think": True, "conclusions": True}),
    ("r2_reason_log_includes", "Reason",
     "@prefix : <http://ex/>. @prefix log: <http://www.w3.org/2000/10/swap/log#>. "
     "{ { :a :b :c . :d :e :f } log:includes { :a :b :c } } => { :inc a :OK }.",
     f"<{X}inc> <{RDFNS}type> <{X}OK> .",
     {"think": True, "conclusions": True}),
    ("r2_reason_log_not_includes", "Reason",
     "@prefix : <http://ex/>. @prefix log: <http://www.w3.org/2000/10/swap/log#>. "
     "{ { :a :b :c } log:notIncludes { :x :y :z } } => { :ninc a :OK }.",
     f"<{X}ninc> <{RDFNS}type> <{X}OK> .",
     {"think": True, "conclusions": True}),
    ("r2_reason_time_day", "Reason",
     f"@prefix : <http://ex/>. @prefix time: <{TIMENS}>. "
     '{ "2002-06-22T22:09:32-05:00"^^<http://www.w3.org/2001/XMLSchema#dateTime>'
     ' time:day ?x } => { :t :is ?x }.',
     f'<{X}t> <{X}is> "22"^^<{XSD}integer> .',
     {"think": True, "conclusions": True}),
    ("r2_reason_math_difference", "Reason",
     "@prefix : <http://ex/>. @prefix math: <http://www.w3.org/2000/10/swap/math#>. "
     "{ (7 3) math:difference ?d } => { :r :is ?d }.",
     f'<{X}r> <{X}is> "4"^^<{XSD}integer> .',
     {"think": True, "conclusions": True}),
]

# --- round-3 additions: negative-syntax tail, literal/IRI corners,
# list/path compositions, builtin Reason coverage ---------------------------
MATHNS = "http://www.w3.org/2000/10/swap/math#"
LISTNS = "http://www.w3.org/2000/10/swap/list#"

CASES += [
    # --- negative syntax (validate mode must error) ---------------------
    ("r3_neg_num_double_dot", "NegativeSyntax",
     "@prefix : <http://ex/>. :s :p 1.2.3 .", None, {}),
    ("r3_neg_bare_exponent", "NegativeSyntax",
     "@prefix : <http://ex/>. :s :p 5e .", None, {}),
    ("r3_neg_undefined_prefix", "NegativeSyntax",
     "@prefix : <http://ex/>. :s q:p :o .", None, {}),
    ("r3_neg_missing_datatype", "NegativeSyntax",
     '@prefix : <http://ex/>. :s :p "x"^^ .', None, {}),
    ("r3_neg_dot_in_collection", "NegativeSyntax",
     "@prefix : <http://ex/>. :s :p ( :a . :b ) .", None, {}),
    ("r3_neg_double_comma", "NegativeSyntax",
     "@prefix : <http://ex/>. :s :p :o ,, :q .", None, {}),
    ("r3_neg_bnpl_missing_object", "NegativeSyntax",
     "@prefix : <http://ex/>. :s :p [ :q ] .", None, {}),
    ("r3_neg_equals_no_object", "NegativeSyntax",
     "@prefix : <http://ex/>. :s = .", None, {}),
    ("r3_neg_base_pname", "NegativeSyntax",
     "@prefix : <http://ex/>. @base :x .", None, {}),
    ("r3_neg_hex_number", "NegativeSyntax",
     "@prefix : <http://ex/>. :s :p 0x1F .", None, {}),
    ("r3_neg_unterminated_long_string", "NegativeSyntax",
     '@prefix : <http://ex/>. :s :p """abc .', None, {}),
    ("r3_neg_stray_at_verb", "NegativeSyntax",
     "@prefix : <http://ex/>. :s @p :o .", None, {}),
    ("r3_neg_stray_close_brace", "NegativeSyntax",
     "@prefix : <http://ex/>. :s :p :o . }", None, {}),
    ("r3_neg_stray_close_bracket", "NegativeSyntax",
     "@prefix : <http://ex/>. :s :p ] .", None, {}),
    ("r3_neg_comma_start", "NegativeSyntax",
     "@prefix : <http://ex/>. , :p :o .", None, {}),
    ("r3_neg_mismatched_collection", "NegativeSyntax",
     "@prefix : <http://ex/>. :s :p (] .", None, {}),
    ("r3_neg_graph_keyword", "NegativeSyntax",
     "@prefix : <http://ex/>. GRAPH :g { :a :b :c } .", None, {}),
    ("r3_neg_semicolon_start", "NegativeSyntax",
     "@prefix : <http://ex/>. ; :p :o .", None, {}),
    ("r3_neg_double_terminator", "NegativeSyntax",
     "@prefix : <http://ex/>. :s :p :o . .", None, {}),
    # --- positive syntax ------------------------------------------------
    # literal in predicate position is grammar-legal in N3 (predicate ::=
    # expression ::= path, and paths admit literals)
    ("r3_syntax_literal_predicate", "PositiveSyntax",
     '@prefix : <http://ex/>. :s "p" :o .', None, {}),
    ("r3_syntax_verb_path", "PositiveSyntax",
     "@prefix : <http://ex/>. :s :a!:b :o .", None, {}),
    ("r3_syntax_quickvar_predicate", "PositiveSyntax",
     "@prefix : <http://ex/>. :s ?p :o .", None, {}),
    ("r3_syntax_compact_punctuation", "PositiveSyntax",
     "@prefix : <http://ex/>.:s :p :o,:q;:r :t.", None, {}),
    ("r3_syntax_directive_in_formula", "PositiveSyntax",
     "@prefix : <http://ex/>. { @prefix q: <http://q/>. q:a q:b q:c } :r :o .",
     None, {}),
    # --- eval: literal corner cases -------------------------------------
    # `4.` = integer 4 + statement terminator (terminals.rb: the numeric
    # terminal does not consume a trailing bare dot)
    ("r3_eval_integer_then_dot", "Eval",
     "@prefix : <http://ex/>. :s :p 4.",
     f'<{X}s> <{X}p> "4"^^<{XSD}integer> .', {}),
    ("r3_eval_plus_integer", "Eval",
     "@prefix : <http://ex/>. :s :p +5 .",
     f'<{X}s> <{X}p> "+5"^^<{XSD}integer> .', {}),
    ("r3_eval_negative_decimal", "Eval",
     "@prefix : <http://ex/>. :s :p -2.5 .",
     f'<{X}s> <{X}p> "-2.5"^^<{XSD}decimal> .', {}),
    ("r3_eval_double_forms", "Eval",
     "@prefix : <http://ex/>. :s :p 1E0 , 2.5e-1 .",
     f'<{X}s> <{X}p> "1E0"^^<{XSD}double> .\n'
     f'<{X}s> <{X}p> "2.5e-1"^^<{XSD}double> .', {}),
    ("r3_eval_single_quote_strings", "Eval",
     "@prefix : <http://ex/>. :s :p 'x' , '''a\nb''' .",
     f'<{X}s> <{X}p> "x" .\n<{X}s> <{X}p> "a\\nb" .', {}),
    ("r3_eval_string_escapes", "Eval",
     '@prefix : <http://ex/>. :s :p "a\\tb\\u0041" .',
     f'<{X}s> <{X}p> "a\\tbA" .', {}),
    ("r3_eval_long_string_embedded_quotes", "Eval",
     '@prefix : <http://ex/>. :s :p """she said "hi" and \'bye\'""" .',
     f'<{X}s> <{X}p> "she said \\"hi\\" and \'bye\'" .', {}),
    # language tags normalize to lowercase (RDF 1.1 Concepts §3.3)
    ("r3_eval_langtag_subtag_lowercase", "Eval",
     '@prefix : <http://ex/>. :s :p "x"@en-GB .',
     f'<{X}s> <{X}p> "x"@en-gb .', {}),
    ("r3_eval_full_iri_datatype", "Eval",
     f'@prefix : <http://ex/>. :s :p "7"^^<{XSD}byte> .',
     f'<{X}s> <{X}p> "7"^^<{XSD}byte> .', {}),
    ("r3_eval_boolean_literals", "Eval",
     "@prefix : <http://ex/>. :s :p true , false .",
     f'<{X}s> <{X}p> "true"^^<{XSD}boolean> .\n'
     f'<{X}s> <{X}p> "false"^^<{XSD}boolean> .', {}),
    # --- eval: IRI / pname corners --------------------------------------
    ("r3_eval_dot_segments", "Eval",
     "@base <http://h/a/b/>. <../c> <./d> <e/f> .",
     "<http://h/a/c> <http://h/a/b/d> <http://h/a/b/e/f> .", {}),
    ("r3_eval_iri_unicode_escape", "Eval",
     "@prefix : <http://ex/>. :s :p <http://ex/\\u0041> .",
     f"<{X}s> <{X}p> <{X}A> .", {}),
    ("r3_eval_pname_colon_local", "Eval",
     "@prefix : <http://ex/>. :s :p :a:b .",
     f"<{X}s> <{X}p> <{X}a:b> .", {}),
    ("r3_eval_pname_percent", "Eval",
     "@prefix : <http://ex/>. :s :p :a%2Fb .",
     f"<{X}s> <{X}p> <{X}a%2Fb> .", {}),
    ("r3_eval_pname_dotted_local", "Eval",
     "@prefix : <http://ex/>. :s :p :a.b.c .",
     f"<{X}s> <{X}p> <{X}a.b.c> .", {}),
    ("r3_eval_prefix_redefinition", "Eval",
     "@prefix p: <http://a/>. p:x p:y p:z . @prefix p: <http://b/>. p:x p:y p:z .",
     "<http://a/x> <http://a/y> <http://a/z> .\n"
     "<http://b/x> <http://b/y> <http://b/z> .", {}),
    ("r3_eval_crlf_line_endings", "Eval",
     "@prefix : <http://ex/>.\r\n:a :b :c .",
     f"<{X}a> <{X}b> <{X}c> .", {}),
    ("r3_eval_comment_at_eof", "Eval",
     "@prefix : <http://ex/>. :a :b :c . # end",
     f"<{X}a> <{X}b> <{X}c> .", {}),
    # --- eval: lists, bnodes, formulae, paths ---------------------------
    ("r3_eval_list_of_lists", "Eval",
     "@prefix : <http://ex/>. :s :p ( ( :a ) ( ) ) .",
     f"_:A <{RDFNS}first> <{X}a> .\n_:A <{RDFNS}rest> <{RDFNS}nil> .\n"
     f"_:B <{RDFNS}first> _:A .\n_:B <{RDFNS}rest> _:C .\n"
     f"_:C <{RDFNS}first> <{RDFNS}nil> .\n_:C <{RDFNS}rest> <{RDFNS}nil> .\n"
     f"<{X}s> <{X}p> _:B .", {}),
    ("r3_eval_mixed_list", "Eval",
     '@prefix : <http://ex/>. :s :p ( 1 "x" [ :q :r ] ) .',
     f'_:PL <{X}q> <{X}r> .\n'
     f'_:A <{RDFNS}first> "1"^^<{XSD}integer> .\n_:A <{RDFNS}rest> _:B .\n'
     f'_:B <{RDFNS}first> "x" .\n_:B <{RDFNS}rest> _:C .\n'
     f"_:C <{RDFNS}first> _:PL .\n_:C <{RDFNS}rest> <{RDFNS}nil> .\n"
     f"<{X}s> <{X}p> _:A .", {}),
    ("r3_eval_nested_bnpl", "Eval",
     "@prefix : <http://ex/>. :s :p [ :q [ :r :t ] ] .",
     f"_:B <{X}r> <{X}t> .\n_:A <{X}q> _:B .\n<{X}s> <{X}p> _:A .", {}),
    ("r3_eval_path_in_collection", "Eval",
     "@prefix : <http://ex/>. :s :p ( :a!:b ) .",
     f"<{X}a> <{X}b> _:A .\n"
     f"_:B <{RDFNS}first> _:A .\n_:B <{RDFNS}rest> <{RDFNS}nil> .\n"
     f"<{X}s> <{X}p> _:B .", {}),
    ("r3_eval_verb_path", "Eval",
     "@prefix : <http://ex/>. :s :a!:b :o .",
     f"<{X}a> <{X}b> _:A .\n<{X}s> _:A <{X}o> .", {}),
    ("r3_eval_quickvar_self_triple", "Eval",
     "@prefix : <http://ex/>. ?x :p ?x .",
     f"?x <{X}p> ?x .", {}),
    ("r3_eval_empty_antecedent_rule", "Eval",
     "@prefix : <http://ex/>. {} => { :a :b :c } .",
     f"<{X}a> <{X}b> <{X}c> _:F2 .\n_:F1 <{LOG}implies> _:F2 .", {}),
    ("r3_eval_directive_in_formula", "Eval",
     "@prefix : <http://ex/>. { @prefix q: <http://q/>. q:a q:b q:c } :r :o .",
     f"<http://q/a> <http://q/b> <http://q/c> _:F1 .\n_:F1 <{X}r> <{X}o> .",
     {}),
    ("r3_eval_a_inside_formula", "Eval",
     "@prefix : <http://ex/>. { :x a :T } :g :o .",
     f"<{X}x> <{RDFNS}type> <{X}T> _:F1 .\n_:F1 <{X}g> <{X}o> .", {}),
    ("r3_eval_has_object_list", "Eval",
     "@prefix : <http://ex/>. :s has :p :o , :q .",
     f"<{X}s> <{X}p> <{X}o> .\n<{X}s> <{X}p> <{X}q> .", {}),
    ("r3_eval_literal_predicate", "Eval",
     '@prefix : <http://ex/>. :s "p" :o .',
     f'<{X}s> "p" <{X}o> .', {}),
    # --- reason: builtin families ---------------------------------------
    ("r3_reason_math_greater_filter", "Reason",
     f"@prefix : <http://ex/>. @prefix math: <{MATHNS}>. "
     ":a :v 5 . :b :v 2 . { ?x :v ?n . ?n math:greaterThan 3 } => { ?x a :Big } .",
     f'<{X}a> <{X}v> "5"^^<{XSD}integer> .\n'
     f'<{X}b> <{X}v> "2"^^<{XSD}integer> .\n'
     f"<{X}a> <{RDFNS}type> <{X}Big> .",
     {"think": True, "data": True}),
    ("r3_reason_string_concatenation", "Reason",
     f'@prefix : <http://ex/>. @prefix string: <{STRNS}>. '
     '{ ("a" "b") string:concatenation ?s } => { :r :val ?s } .',
     f'<{X}r> <{X}val> "ab" .',
     {"think": True, "conclusions": True}),
    ("r3_reason_list_append", "Reason",
     f"@prefix : <http://ex/>. @prefix list: <{LISTNS}>. "
     "{ ((:a) (:b :c)) list:append ?l } => { :r :val ?l } .",
     f"<{X}r> <{X}val> (<{X}a> <{X}b> <{X}c>) .",
     {"think": True, "conclusions": True}),
    ("r3_reason_list_length", "Reason",
     f"@prefix : <http://ex/>. @prefix list: <{LISTNS}>. "
     "{ (:a :b :c) list:length ?n } => { :r :len ?n } .",
     f'<{X}r> <{X}len> "3"^^<{XSD}integer> .',
     {"think": True, "conclusions": True}),
    ("r3_reason_list_in", "Reason",
     f"@prefix : <http://ex/>. @prefix list: <{LISTNS}>. "
     "{ :b list:in (:a :b) } => { :r :ok :yes } .",
     f"<{X}r> <{X}ok> <{X}yes> .",
     {"think": True, "conclusions": True}),
    ("r3_reason_string_starts_with", "Reason",
     f'@prefix : <http://ex/>. @prefix string: <{STRNS}>. '
     '{ "hello" string:startsWith "he" } => { :r :ok :yes } .',
     f"<{X}r> <{X}ok> <{X}yes> .",
     {"think": True, "conclusions": True}),
    ("r3_reason_string_replace", "Reason",
     f'@prefix : <http://ex/>. @prefix string: <{STRNS}>. '
     '{ ("oldX" "X" "Y") string:replace ?v } => { :r :val ?v } .',
     f'<{X}r> <{X}val> "oldY" .',
     {"think": True, "conclusions": True}),
    ("r3_reason_math_negation", "Reason",
     f"@prefix : <http://ex/>. @prefix math: <{MATHNS}>. "
     "{ 5 math:negation ?n } => { :r :val ?n } .",
     f'<{X}r> <{X}val> "-5"^^<{XSD}integer> .',
     {"think": True, "conclusions": True}),
    ("r3_reason_math_absolute_value", "Reason",
     f"@prefix : <http://ex/>. @prefix math: <{MATHNS}>. "
     "{ -4 math:absoluteValue ?v } => { :r :val ?v } .",
     f'<{X}r> <{X}val> "4"^^<{XSD}integer> .',
     {"think": True, "conclusions": True}),
    ("r3_reason_math_remainder", "Reason",
     f"@prefix : <http://ex/>. @prefix math: <{MATHNS}>. "
     "{ (7 3) math:remainder ?v } => { :r :val ?v } .",
     f'<{X}r> <{X}val> "1"^^<{XSD}integer> .',
     {"think": True, "conclusions": True}),
    ("r3_reason_math_exponentiation", "Reason",
     f"@prefix : <http://ex/>. @prefix math: <{MATHNS}>. "
     "{ (2 10) math:exponentiation ?v } => { :r :val ?v } .",
     f'<{X}r> <{X}val> "1024"^^<{XSD}integer> .',
     {"think": True, "conclusions": True}),
    ("r3_reason_log_equal_to_filter", "Reason",
     f"@prefix : <http://ex/>. @prefix log: <{LOG[:-1]}#>. "
     ":x :v 5 . { ?s :v ?n . ?n log:equalTo 5 } => { ?s a :Five } .",
     f'<{X}x> <{X}v> "5"^^<{XSD}integer> .\n'
     f"<{X}x> <{RDFNS}type> <{X}Five> .",
     {"think": True, "data": True}),
    ("r3_reason_log_dtlit", "Reason",
     f"@prefix : <http://ex/>. @prefix log: <{LOG[:-1]}#>. "
     f'{{ ("13" <{XSD}integer>) log:dtlit ?x }} => {{ :r :val ?x }} .',
     f'<{X}r> <{X}val> "13"^^<{XSD}integer> .',
     {"think": True, "conclusions": True}),
    ("r3_reason_time_year", "Reason",
     f"@prefix : <http://ex/>. @prefix time: <{TIMENS}>. "
     '{ "2024-03-09T01:02:03Z"^^<http://www.w3.org/2001/XMLSchema#dateTime>'
     " time:year ?y } => { :r :val ?y } .",
     f'<{X}r> <{X}val> "2024"^^<{XSD}integer> .',
     {"think": True, "conclusions": True}),
    ("r3_reason_notincludes_rule", "Reason",
     f"@prefix : <http://ex/>. @prefix log: <{LOG[:-1]}#>. "
     ":x :p :y . { { :x :p :y } log:notIncludes { :x :p :z } } => { :r :ok :yes } .",
     f"<{X}x> <{X}p> <{X}y> .\n<{X}r> <{X}ok> <{X}yes> .",
     {"think": True, "data": True}),
    ("r3_reason_list_member_ints", "Reason",
     f"@prefix : <http://ex/>. @prefix list: <{LISTNS}>. "
     "{ (1 2) list:member ?m } => { :r :has ?m } .",
     f'<{X}r> <{X}has> "1"^^<{XSD}integer> .\n'
     f'<{X}r> <{X}has> "2"^^<{XSD}integer> .',
     {"think": True, "conclusions": True}),
    # --- round-3b additions: quantifier rejection, langtag/datatype
    # combinators, IRIREF/PN terminal edges, long tails of the Turtle
    # suite families, and more builtin Reason coverage -----------------
    # Modern N3 (and the reference) dropped @forAll/@forSome: the
    # grammar comment lists existential|universal (reader.rb:241) but
    # read_n3Statement implements only triples (reader.rb:244-250), so
    # the directive is a parse error there too.
    ("r3b_neg_forall", "NegativeSyntax",
     "@prefix : <http://ex/>. @forAll :x . :x :p :o .", None, {}),
    ("r3b_neg_forsome", "NegativeSyntax",
     "@prefix : <http://ex/>. @forSome :x . :x :p :o .", None, {}),
    # LANGTAG only follows string literals (terminals.rb:51 attaches in
    # the literal production only)
    ("r3b_neg_int_langtag", "NegativeSyntax",
     "@prefix : <http://ex/>. :s :p 1@en .", None, {}),
    ("r3b_neg_lang_then_datatype", "NegativeSyntax",
     '@prefix : <http://ex/>. :s :p "x"@en^^<http://ex/dt> .', None, {}),
    # `a` is only a verb (reader.rb read_path rejects it as subject)
    ("r3b_neg_a_as_subject", "NegativeSyntax",
     "@prefix : <http://ex/>. a :p :o .", None, {}),
    # PN_PREFIX must start with PN_CHARS_BASE — no leading digit
    ("r3b_neg_digit_prefix", "NegativeSyntax",
     "@prefix 1p: <http://ex/>. 1p:x 1p:y 1p:z .", None, {}),
    # IRIREF admits UCHAR but not ECHAR (terminals.rb:42)
    ("r3b_neg_iri_echar", "NegativeSyntax",
     "<http://ex/a\\nb> <http://ex/p> <http://ex/o> .", None, {}),
    # LANGTAG has a (?!is|has) lookahead (terminals.rb:51): "x"@is is
    # not a language-tagged literal and nothing else can parse it
    ("r3b_neg_langtag_is", "NegativeSyntax",
     '@prefix : <http://ex/>. :s :p "x"@is .', None, {}),
    ("r3b_neg_bad_uchar_hex", "NegativeSyntax",
     '@prefix : <http://ex/>. :s :p "\\u12G4" .', None, {}),
    ("r3b_neg_empty_bnode_label", "NegativeSyntax",
     "@prefix : <http://ex/>. _: :p :o .", None, {}),
    # --- eval ----------------------------------------------------------
    # BLANK_NODE_LABEL admits interior dots (PN_CHARS with '.' medial)
    ("r3b_eval_bnode_label_interior_dot", "Eval",
     "@prefix : <http://ex/>. _:a.b :p :o . _:a.b :q :r .",
     f"_:n0 <{X}p> <{X}o> .\n_:n0 <{X}q> <{X}r> .", {}),
    ("r3b_eval_datatype_in_objectlist", "Eval",
     '@prefix : <http://ex/>. :s :p "x"^^:dt, "y" .',
     f'<{X}s> <{X}p> "x"^^<{X}dt> .\n<{X}s> <{X}p> "y" .', {}),
    # ESCAPE_CHAR8 (\U 8-hex) above the BMP
    ("r3b_eval_uchar8_astral", "Eval",
     '@prefix : <http://ex/>. :s :p "\\U0001F600" .',
     f'<{X}s> <{X}p> "\U0001F600" .', {}),
    ("r3b_eval_long_single_quote_newline", "Eval",
     "@prefix : <http://ex/>. :s :p '''a\nb'c''' .",
     f'<{X}s> <{X}p> "a\\nb\'c" .', {}),
    ("r3b_eval_negative_zero_forms", "Eval",
     "@prefix : <http://ex/>. :s :p -0.0, -0 .",
     f'<{X}s> <{X}p> "-0.0"^^<{XSD}decimal> .\n'
     f'<{X}s> <{X}p> "-0"^^<{XSD}integer> .', {}),
    # PN_LOCAL_ESC reserved-char escapes decode to the raw character in
    # every position (terminals.rb:22)
    ("r3b_eval_pn_local_esc_positions", "Eval",
     "@prefix : <http://ex/>. :a\\~b :p\\!q :o\\=r .",
     f"<{X}a~b> <{X}p!q> <{X}o=r> .", {}),
    # a rule whose consequent is itself a rule: the inner implies lives
    # in the outer consequent formula
    ("r3b_eval_nested_rule_consequent", "Eval",
     "@prefix : <http://ex/>. "
     "{ :a :b :c } => { { :d :e :f } => { :g :h :i } } .",
     f"<{X}a> <{X}b> <{X}c> _:F1 .\n"
     f"<{X}d> <{X}e> <{X}f> _:F2 .\n"
     f"<{X}g> <{X}h> <{X}i> _:F3 .\n"
     f"_:F2 <{LOG}implies> _:F3 _:F4 .\n"
     f"_:F1 <{LOG}implies> _:F4 .", {}),
    # --- reason: more builtin families ----------------------------------
    ("r3b_reason_math_abs", "Reason",
     f"@prefix : <http://ex/>. @prefix math: <{MATHNS}>. "
     "{ -4 math:absoluteValue ?v } => { :r :v ?v } .",
     f'<{X}r> <{X}v> "4"^^<{XSD}integer> .',
     {"think": True, "conclusions": True}),
    ("r3b_reason_math_remainder_expo", "Reason",
     f"@prefix : <http://ex/>. @prefix math: <{MATHNS}>. "
     "{ (7 3) math:remainder ?v . (2 10) math:exponentiation ?w } "
     "=> { :r :rem ?v ; :pow ?w } .",
     f'<{X}r> <{X}rem> "1"^^<{XSD}integer> .\n'
     f'<{X}r> <{X}pow> "1024"^^<{XSD}integer> .',
     {"think": True, "conclusions": True}),
    ("r3b_reason_string_matches_contains", "Reason",
     f"@prefix : <http://ex/>. @prefix string: <{STRNS}>. "
     '{ "hello" string:matches "h.*o" . "hello" string:contains "ell" . '
     '"abc" string:lessThan "abd" } => { :r :ok :y } .',
     f"<{X}r> <{X}ok> <{X}y> .",
     {"think": True, "conclusions": True}),
    ("r3b_reason_list_first_last", "Reason",
     f"@prefix : <http://ex/>. @prefix list: <{LISTNS}>. "
     "{ (:a :b) list:first ?f . (:a :b) list:last ?l } "
     "=> { :r :first ?f ; :last ?l } .",
     f"<{X}r> <{X}first> <{X}a> .\n<{X}r> <{X}last> <{X}b> .",
     {"think": True, "conclusions": True}),
    ("r3b_reason_crypto_sha256", "Reason",
     "@prefix : <http://ex/>. "
     "@prefix crypto: <http://www.w3.org/2000/10/swap/crypto#>. "
     '{ "abc" crypto:sha256 ?h } => { :r :digest ?h } .',
     f'<{X}r> <{X}digest> '
     '"ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad" .',
     {"think": True, "conclusions": True}),
    ("r3b_reason_log_dtlit", "Reason",
     f"@prefix : <http://ex/>. @prefix log: <{LOG}>. "
     '{ ("5" <http://www.w3.org/2001/XMLSchema#integer>) log:dtlit ?l } '
     "=> { :r :lit ?l } .",
     f'<{X}r> <{X}lit> "5"^^<{XSD}integer> .',
     {"think": True, "conclusions": True}),
]

# --- round-3c additions: lexical preservation, path chains, nil/bnpl
# subjects, remaining math/string/time/log builtin families, and the
# negative terminal tail ----------------------------------------------------
CASES += [
    # --- negative syntax -------------------------------------------------
    ("r3c_neg_prefix_no_iri", "NegativeSyntax",
     "@prefix : .\n:a :b :c .", None, {}),
    ("r3c_neg_empty_langtag", "NegativeSyntax",
     '@prefix : <http://ex/>. :s :p "x"@ .', None, {}),
    ("r3c_neg_bad_echar", "NegativeSyntax",
     '@prefix : <http://ex/>. :s :p "a\\qb" .', None, {}),
    ("r3c_neg_unclosed_iri", "NegativeSyntax",
     "<http://ex/a <http://ex/p> <http://ex/o> .", None, {}),
    ("r3c_neg_langtag_digit_start", "NegativeSyntax",
     '@prefix : <http://ex/>. :s :p "x"@2en .', None, {}),
    ("r3c_neg_nested_unclosed_list", "NegativeSyntax",
     "@prefix : <http://ex/>. :s :p ( :a ( :b ) .", None, {}),
    # --- eval: terminals and sugar ---------------------------------------
    # integer lexical form is preserved verbatim (leading zeros kept;
    # canonicalization is opt-in, reader.rb literal handling)
    ("r3c_eval_leading_zero_integer", "Eval",
     "@prefix : <http://ex/>. :s :p 0042 .",
     f'<{X}s> <{X}p> "0042"^^<{XSD}integer> .', {}),
    ("r3c_eval_nil_subject", "Eval",
     "@prefix : <http://ex/>. () :p :o .",
     f"<{RDFNS}nil> <{X}p> <{X}o> .", {}),
    ("r3c_eval_bnpl_subject", "Eval",
     "@prefix : <http://ex/>. [ :p :o ] :q :r .",
     f"_:A <{X}p> <{X}o> .\n_:A <{X}q> <{X}r> .", {}),
    ("r3c_eval_backslash_escape", "Eval",
     '@prefix : <http://ex/>. :s :p "a\\\\b" .',
     f'<{X}s> <{X}p> "a\\\\b" .', {}),
    # chained forward path: ((p)!q)!r — each hop emits (prior, pred, new)
    ("r3c_eval_chained_forward_path", "Eval",
     "@prefix : <http://ex/>. :s :p!:q!:r :o .",
     f"<{X}p> <{X}q> _:A .\n_:A <{X}r> _:B .\n<{X}s> _:B <{X}o> .", {}),
    # mixed forward/reverse path: a!b^c — reverse hop emits (new, pred, prior)
    ("r3c_eval_mixed_path_directions", "Eval",
     "@prefix : <http://ex/>. :s :a!:b^:c :o .",
     f"<{X}a> <{X}b> _:A .\n_:B <{X}c> _:A .\n<{X}s> _:B <{X}o> .", {}),
    # ^ on a literal is a legal reverse path (paths admit literals)
    ("r3c_eval_reverse_path_on_literal", "Eval",
     '@prefix : <http://ex/>. :s :p "x"^:dt .',
     f'_:A <{X}dt> "x" .\n<{X}s> <{X}p> _:A .', {}),
    ("r3c_eval_numeric_leading_local", "Eval",
     "@prefix : <http://ex/>. :s :p :00a .",
     f"<{X}s> <{X}p> <{X}00a> .", {}),
    # --- reason: remaining builtin families -------------------------------
    ("r3c_reason_math_quotient", "Reason",
     f"@prefix : <http://ex/>. @prefix math: <{MATHNS}>. "
     "{ (7 2) math:quotient ?v } => { :r :val ?v } .",
     f'<{X}r> <{X}val> "3.5"^^<{XSD}decimal> .',
     {"think": True, "conclusions": True}),
    ("r3c_reason_math_difference_negative", "Reason",
     f"@prefix : <http://ex/>. @prefix math: <{MATHNS}>. "
     "{ (5 9) math:difference ?v } => { :r :val ?v } .",
     f'<{X}r> <{X}val> "-4"^^<{XSD}integer> .',
     {"think": True, "conclusions": True}),
    ("r3c_reason_math_sum_mixed_types", "Reason",
     f"@prefix : <http://ex/>. @prefix math: <{MATHNS}>. "
     "{ (1 2.5) math:sum ?v } => { :r :val ?v } .",
     f'<{X}r> <{X}val> "3.5"^^<{XSD}decimal> .',
     {"think": True, "conclusions": True}),
    ("r3c_reason_time_month", "Reason",
     f"@prefix : <http://ex/>. @prefix time: <{TIMENS}>. "
     '{ "2024-03-09T01:02:03Z"^^<http://www.w3.org/2001/XMLSchema#dateTime>'
     " time:month ?v } => { :r :val ?v } .",
     f'<{X}r> <{X}val> "3"^^<{XSD}integer> .',
     {"think": True, "conclusions": True}),
    ("r3c_reason_string_ends_with", "Reason",
     f"@prefix : <http://ex/>. @prefix string: <{STRNS}>. "
     '{ "hello" string:endsWith "llo" . "hello" string:notMatches "^z" } '
     "=> { :r :ok :y } .",
     f"<{X}r> <{X}ok> <{X}y> .",
     {"think": True, "conclusions": True}),
    ("r3c_reason_log_langlit", "Reason",
     f"@prefix : <http://ex/>. @prefix log: <{LOG}>. "
     '{ ("hi" "en-gb") log:langlit ?l } => { :r :val ?l } .',
     f'<{X}r> <{X}val> "hi"@en-gb .',
     {"think": True, "conclusions": True}),
    # --- r3d batch: UCHAR scalar-value enforcement, long-single-quote
    # strings, extended lang tags, formulae inside collections, and the
    # builtin registry tail (floor/ceiling/rounded, format,
    # containsIgnoringCase, iterate, second/dayOfWeek, md5, notEqualTo,
    # integer exponentiation) -----------------------------------------
    ("r3d_neg_surrogate_uchar", "NegativeSyntax",
     '@prefix : <http://ex/>. :a :b "\\uD800" .', None, {}),
    ("r3d_neg_uchar_past_max", "NegativeSyntax",
     '@prefix : <http://ex/>. :a :b "\\UFFFFFFFF" .', None, {}),
    ("r3d_neg_iri_surrogate_uchar", "NegativeSyntax",
     '<http://ex/a> <http://ex/\\uDC00> <http://ex/c> .', None, {}),
    ("r3d_neg_a_as_object", "NegativeSyntax",
     "@prefix : <http://ex/>. :x :p a .", None, {}),
    ("r3d_eval_uchar_max_scalar", "Eval",
     '@prefix : <http://ex/>. :a :b "\\U0010FFFF" .',
     f'<{X}a> <{X}b> "\U0010FFFF" .', {}),
    ("r3d_eval_leading_dot_exponent", "Eval",
     "@prefix : <http://ex/>. :a :b .5e2 .",
     f'<{X}a> <{X}b> ".5e2"^^<{XSD}double> .', {}),
    ("r3d_eval_echar_backspace_formfeed", "Eval",
     '@prefix : <http://ex/>. :a :b "x\\by\\fz" .',
     # engine encoding keeps the control chars ECHAR-escaped
     f'<{X}a> <{X}b> "x\\by\\fz" .', {}),
    ("r3d_eval_long_single_quote_pairs", "Eval",
     "@prefix : <http://ex/>. :a :b " + "'" * 3 + "it''s here"
     + "'" * 3 + " .",
     f'<{X}a> <{X}b> "it\'\'s here" .', {}),
    ("r3d_eval_langtag_extension_subtags", "Eval",
     '@prefix : <http://ex/>. :a :b "x"@en-US-x-2 .',
     f'<{X}a> <{X}b> "x"@en-us-x-2 .', {}),
    ("r3d_formula_in_collection", "PositiveSyntax",
     "@prefix : <http://ex/>. :l :is ( { :a :b :c } ) .", None, {}),
    ("r3d_eval_comment_inside_collection", "Eval",
     "@prefix : <http://ex/>. :l :is ( :a # c\n :b ) .",
     f"<{X}l> <{X}is> _:b0 .\n"
     f"_:b0 <{RDFNS}first> <{X}a> .\n"
     f"_:b0 <{RDFNS}rest> _:b1 .\n"
     f"_:b1 <{RDFNS}first> <{X}b> .\n"
     f"_:b1 <{RDFNS}rest> <{RDFNS}nil> .", {}),
    ("r3d_eval_datatype_relative_iri", "Eval",
     '@base <http://ex/>. <s> <p> "v"^^<dt> .',
     f'<{X}s> <{X}p> "v"^^<{X}dt> .', {}),
    ("r3d_reason_math_floor", "Reason",
     f"@prefix : <http://ex/>. @prefix math: <{MATHNS}>. "
     "{ 2.6 math:floor ?v } => { :r :val ?v } .",
     f'<{X}r> <{X}val> "2"^^<{XSD}integer> .',
     {"think": True, "conclusions": True}),
    ("r3d_reason_math_ceiling_negative", "Reason",
     f"@prefix : <http://ex/>. @prefix math: <{MATHNS}>. "
     '{ "-2.4"^^<' + XSD + 'decimal> math:ceiling ?v } '
     "=> { :r :val ?v } .",
     f'<{X}r> <{X}val> "-2"^^<{XSD}integer> .',
     {"think": True, "conclusions": True}),
    ("r3d_reason_math_rounded_half_up", "Reason",
     f"@prefix : <http://ex/>. @prefix math: <{MATHNS}>. "
     "{ 2.5 math:rounded ?v } => { :r :val ?v } .",
     f'<{X}r> <{X}val> "3"^^<{XSD}integer> .',
     {"think": True, "conclusions": True}),
    ("r3d_reason_string_format", "Reason",
     f"@prefix : <http://ex/>. @prefix string: <{STRNS}>. "
     '{ ("x=%s y=%s" "a" "b") string:format ?v } => { :r :val ?v } .',
     f'<{X}r> <{X}val> "x=a y=b" .',
     {"think": True, "conclusions": True}),
    ("r3d_reason_string_contains_ignoring_case", "Reason",
     f"@prefix : <http://ex/>. @prefix string: <{STRNS}>. "
     '{ "HeLLo" string:containsIgnoringCase "hello" } '
     "=> { :r :ok true } .",
     f'<{X}r> <{X}ok> "true"^^<{XSD}boolean> .',
     {"think": True, "conclusions": True}),
    ("r3d_reason_list_iterate", "Reason",
     "@prefix : <http://ex/>. "
     "@prefix list: <http://www.w3.org/2000/10/swap/list#>. "
     "{ (:a :b) list:iterate (?i ?x) } => { ?x :at ?i } .",
     f'<{X}a> <{X}at> "0"^^<{XSD}integer> .\n'
     f'<{X}b> <{X}at> "1"^^<{XSD}integer> .',
     {"think": True, "conclusions": True}),
    ("r3d_reason_time_second", "Reason",
     f"@prefix : <http://ex/>. @prefix time: <{TIMENS}>. "
     '{ "2001-02-03T04:05:06Z"^^<' + XSD + 'dateTime> time:second ?v } '
     "=> { :r :val ?v } .",
     f'<{X}r> <{X}val> "6"^^<{XSD}integer> .',
     {"think": True, "conclusions": True}),
    ("r3d_reason_time_day_of_week", "Reason",
     f"@prefix : <http://ex/>. @prefix time: <{TIMENS}>. "
     '{ "2001-02-03T04:05:06Z"^^<' + XSD + 'dateTime> time:dayOfWeek ?v } '
     "=> { :r :val ?v } .",
     f'<{X}r> <{X}val> "6"^^<{XSD}integer> .',
     {"think": True, "conclusions": True}),
    ("r3d_reason_crypto_md5", "Reason",
     "@prefix : <http://ex/>. "
     "@prefix crypto: <http://www.w3.org/2000/10/swap/crypto#>. "
     '{ "abc" crypto:md5 ?h } => { :r :digest ?h } .',
     f'<{X}r> <{X}digest> "900150983cd24fb0d6963f7d28e17f72" .',
     {"think": True, "conclusions": True}),
    ("r3d_reason_log_not_equal_to", "Reason",
     f"@prefix : <http://ex/>. @prefix log: <{LOG}>. "
     "{ :a log:notEqualTo :b } => { :r :ok true } .",
     f'<{X}r> <{X}ok> "true"^^<{XSD}boolean> .',
     {"think": True, "conclusions": True}),
    ("r3d_reason_math_exponentiation_int", "Reason",
     f"@prefix : <{X}>. @prefix math: <{MATHNS}>. "
     "{ (2 10) math:exponentiation ?v } => { :r :val ?v } .",
     f'<{X}r> <{X}val> "1024"^^<{XSD}integer> .',
     {"think": True, "conclusions": True}),
    # --- iriPropertyList [ id <iri> ... ] (reader.rb:537-551;
    # expectations transcribed from reader_spec.rb:986-1055) ----------
    ("ipl_simple", "Eval",
     "@prefix : <http://ex/>. [id :s :p :o] .",
     f"<{X}s> <{X}p> <{X}o> .", {}),
    ("ipl_whitespace", "Eval",
     "@prefix : <http://ex/>. [ id :s :p :o] .",
     f"<{X}s> <{X}p> <{X}o> .", {}),
    ("ipl_linefeed", "Eval",
     "@prefix : <http://ex/>. [\n id :s\n :p :o\n ] .",
     f"<{X}s> <{X}p> <{X}o> .", {}),
    ("ipl_as_object", "Eval",
     '@prefix a: <http://foo/a#> . a:b a:oneRef [ id a:node0 a:pp "1" ; a:qq "2" ] .',
     '<http://foo/a#node0> <http://foo/a#pp> "1" .\n'
     '<http://foo/a#node0> <http://foo/a#qq> "2" .\n'
     '<http://foo/a#b> <http://foo/a#oneRef> <http://foo/a#node0> .', {}),
    ("ipl_nested", "Eval",
     '@prefix a: <http://foo/a#> . a:a a:p [ id a:node1 a:p2 '
     '[ id a:node0 a:p3 "v1" , "v2" ; a:p4 "v3" ] ; a:p5 "v4" ] .',
     '<http://foo/a#node0> <http://foo/a#p3> "v1" .\n'
     '<http://foo/a#node0> <http://foo/a#p3> "v2" .\n'
     '<http://foo/a#node0> <http://foo/a#p4> "v3" .\n'
     '<http://foo/a#node1> <http://foo/a#p2> <http://foo/a#node0> .\n'
     '<http://foo/a#node1> <http://foo/a#p5> "v4" .\n'
     '<http://foo/a#a> <http://foo/a#p> <http://foo/a#node1> .', {}),
    ("ipl_neg_semicolon_after_id", "NegativeSyntax",
     "@prefix : <http://ex/>. [ id :s ; :p :o] .", None, {}),
    ("ipl_neg_subject_list", "NegativeSyntax",
     "@prefix : <http://ex/>. [ id :s1, :s2 :p :o] .", None, {}),
    ("ipl_neg_bnode_id", "NegativeSyntax",
     "@prefix : <http://ex/>. [ id _:bn :p :o] .", None, {}),
    # --- numeric-terminator / escape / relative-IRI tail -------------
    # (terminals.rb:53-57 INTEGER/DECIMAL/DOUBLE longest-match vs the
    # statement dot; reader.rb:476 `.E` -> `.0E`; PN_LOCAL_ESC
    # reader.rb:825-833; RFC3986 query/fragment-only references)
    ("eval_int_then_dot", "Eval",
     "@prefix : <http://ex/>. :a :b 5.",
     f'<{X}a> <{X}b> "5"^^<{XSD}integer> .', {}),
    ("eval_decimal_then_dot", "Eval",
     "@prefix : <http://ex/>. :a :b 5.5.",
     f'<{X}a> <{X}b> "5.5"^^<{XSD}decimal> .', {}),
    ("eval_double_dot_e_norm", "Eval",
     "@prefix : <http://ex/>. :a :b 5.E0 .",
     f'<{X}a> <{X}b> "5.0E0"^^<{XSD}double> .', {}),
    ("eval_double_leading_dot", "Eval",
     "@prefix : <http://ex/>. :a :b .5E0 .",
     f'<{X}a> <{X}b> ".5E0"^^<{XSD}double> .', {}),
    ("eval_echar_tab_bs_ff", "Eval",
     '@prefix : <http://ex/>. :a :b "x\\ty\\bz\\f" .',
     f'<{X}a> <{X}b> "x\\ty\\bz\\f" .', {}),
    ("eval_pn_local_esc_dot", "Eval",
     "@prefix : <http://ex/>. :a\\.b :p :o .",
     f"<{X}a.b> <{X}p> <{X}o> .", {}),
    ("eval_rel_iri_query_only", "Eval",
     "@prefix : <http://ex/>. :a :b <?q=1> .",
     f"<{X}a> <{X}b> <http://a/b?q=1> .",
     {"base_uri": "http://a/b"}),
    ("eval_rel_iri_frag_only", "Eval",
     "@prefix : <http://ex/>. :a :b <#frag> .",
     f"<{X}a> <{X}b> <http://a/b#frag> .",
     {"base_uri": "http://a/b"}),
    ("eval_boolean_objects", "Eval",
     "@prefix : <http://ex/>. :a :b true, false .",
     f'<{X}a> <{X}b> "true"^^<{XSD}boolean> .\n'
     f'<{X}a> <{X}b> "false"^^<{XSD}boolean> .', {}),
    # --- round-3 batch: qname dots, langtag case, IRI escapes, ------
    # prefix redefinition, relative-IRI corners, legacy-N3 negatives
    ("syntax_dot_dash_local", "Eval",
     "@prefix : <http://ex/>. :a.b :c.d :e.",
     f"<{X}a.b> <{X}c.d> <{X}e> .", {}),
    ("eval_langtag_lowercased", "Eval",
     '@prefix : <http://ex/>. :s :p "x"@EN-US, "y"@fr .',
     f'<{X}s> <{X}p> "x"@en-us .\n<{X}s> <{X}p> "y"@fr .', {}),
    ("eval_uchar_in_iri", "Eval",
     "<http://ex/\\u0061bc> <http://ex/p> <http://ex/\\U00000062> .",
     f"<{X}abc> <{X}p> <{X}b> .", {}),
    ("eval_prefix_redefine", "Eval",
     "@prefix p: <http://a/>. p:x p:y p:z . "
     "@prefix p: <http://b/>. p:x p:y p:z .",
     "<http://a/x> <http://a/y> <http://a/z> .\n"
     "<http://b/x> <http://b/y> <http://b/z> .", {}),
    ("eval_base_relative_corners", "Eval",
     "@base <http://b/dir/page>. <x> <#f> <../y> .",
     "<http://b/dir/x> <http://b/dir/page#f> <http://b/y> .", {}),
    ("eval_nested_blank_propertylist", "Eval",
     "@prefix : <http://ex/>. [ :p [ :q :r ] ] :s :t .",
     f"_:B1 <{X}q> <{X}r> .\n_:B0 <{X}p> _:B1 .\n"
     f"_:B0 <{X}s> <{X}t> .", {}),
    ("eval_anon_subject_and_object", "Eval",
     "@prefix : <http://ex/>. [] :p [] .",
     f"_:A <{X}p> _:B .", {}),
    ("eval_echar_unescapes", "Eval",
     '@prefix : <http://ex/>. :s :p "a\\tb\\nc\\"d\\\\e" .',
     f'<{X}s> <{X}p> "a\\tb\\nc\\"d\\\\e" .', {}),
    ("eval_supplementary_uchar_string", "Eval",
     '@prefix : <http://ex/>. :s :p "\\U0001F600" .',
     f'<{X}s> <{X}p> "\U0001F600" .', {}),
    ("eval_lone_colon_pname", "Eval",
     "@prefix : <http://ex/>. : :p : .",
     f"<{X}> <{X}p> <{X}> .", {}),
    ("eval_numeric_dotted_local", "Eval",
     "@prefix : <http://ex/>. :3.14 :p :o .",
     f"<{X}3.14> <{X}p> <{X}o> .", {}),
    # legacy-N3 keywords are NOT in the reference grammar (reader.rb has
    # no @forAll/@forSome/@keywords productions) -> validate-mode errors
    ("neg_legacy_forall", "NegativeSyntax",
     "@prefix : <http://ex/>. @forAll :x . :x :p :o .", None, {}),
    ("neg_legacy_keywords", "NegativeSyntax",
     "@keywords a . x y z .", None, {}),
    ("neg_dot_leading_local", "NegativeSyntax",
     "@prefix : <http://ex/>. :s :p :.x .", None, {}),
    ("neg_numeric_langtag", "NegativeSyntax",
     '@prefix : <http://ex/>. :s :p "x"@123 .', None, {}),
    # --- round-3 Reason batch: list fan-out, guards, backward rules --
    ("reason_list_member_fanout", "Reason",
     "@prefix : <http://ex/>. @prefix list: <http://www.w3.org/2000/10/swap/list#>. "
     ":l :is (1 2 3) . { :l :is ?L . ?L list:member ?m } => { :r :has ?m } .",
     f'<{X}l> <{X}is> ("1"^^<{XSD}integer> "2"^^<{XSD}integer> "3"^^<{XSD}integer>) .\n'
     f'<{X}r> <{X}has> "1"^^<{XSD}integer> .\n'
     f'<{X}r> <{X}has> "2"^^<{XSD}integer> .\n'
     f'<{X}r> <{X}has> "3"^^<{XSD}integer> .',
     {"think": True, "data": True}),
    ("reason_list_append", "Reason",
     "@prefix : <http://ex/>. @prefix list: <http://www.w3.org/2000/10/swap/list#>. "
     "{ ((1 2) (3)) list:append ?x } => { :r :all ?x } .",
     f'<{X}r> <{X}all> ("1"^^<{XSD}integer> "2"^^<{XSD}integer> "3"^^<{XSD}integer>) .',
     {"think": True, "conclusions": True}),
    ("reason_list_length", "Reason",
     "@prefix : <http://ex/>. @prefix list: <http://www.w3.org/2000/10/swap/list#>. "
     "{ (1 2 3) list:length ?n } => { :r :n ?n } .",
     f'<{X}r> <{X}n> "3"^^<{XSD}integer> .',
     {"think": True, "conclusions": True}),
    ("reason_includes_guard", "Reason",
     "@prefix : <http://ex/>. @prefix log: <http://www.w3.org/2000/10/swap/log#>. "
     ":g :says { :a :b :c . :d :e :f } . "
     "{ :g :says ?F . ?F log:includes { :a :b :c } } => { :r :ok true } .",
     f'<{X}r> <{X}ok> "true"^^<{XSD}boolean> .',
     {"think": True, "data": True}),
    ("reason_notincludes_guard", "Reason",
     "@prefix : <http://ex/>. @prefix log: <http://www.w3.org/2000/10/swap/log#>. "
     ":g :says { :a :b :c } . "
     "{ :g :says ?F . ?F log:notIncludes { :x :y :z } } => { :r :ok true } .",
     f'<{X}r> <{X}ok> "true"^^<{XSD}boolean> .',
     {"think": True, "data": True}),
    ("reason_string_replace", "Reason",
     "@prefix : <http://ex/>. @prefix string: <http://www.w3.org/2000/10/swap/string#>. "
     '{ ("ababab" "b" "c") string:replace ?x } => { :r :v ?x } .',
     f'<{X}r> <{X}v> "acacac" .',
     {"think": True, "conclusions": True}),
    ("reason_backward_rule", "Reason",
     "@prefix : <http://ex/>. { ?x :p ?y } <= { ?x :q ?y } . :a :q :b .",
     f"<{X}a> <{X}q> <{X}b> .\n<{X}a> <{X}p> <{X}b> .",
     {"think": True, "data": True}),
    ("reason_transitive_closure", "Reason",
     "@prefix : <http://ex/>. :a :sub :b . :b :sub :c . :c :sub :d . "
     "{ ?x :sub ?y . ?y :sub ?z } => { ?x :sub ?z } .",
     f"<{X}a> <{X}sub> <{X}b> .\n<{X}b> <{X}sub> <{X}c> .\n"
     f"<{X}c> <{X}sub> <{X}d> .\n<{X}a> <{X}sub> <{X}c> .\n"
     f"<{X}b> <{X}sub> <{X}d> .\n<{X}a> <{X}sub> <{X}d> .",
     {"think": True, "data": True}),
    # --- round-3 Reason batch 2: math/time/log literal builtins ------
    ("reason_math_difference", "Reason",
     "@prefix : <http://ex/>. @prefix math: <http://www.w3.org/2000/10/swap/math#>. "
     "{ (10 3) math:difference ?d } => { :r :v ?d } .",
     f'<{X}r> <{X}v> "7"^^<{XSD}integer> .',
     {"think": True, "conclusions": True}),
    ("reason_math_quotient_decimal", "Reason",
     "@prefix : <http://ex/>. @prefix math: <http://www.w3.org/2000/10/swap/math#>. "
     "{ (7 2) math:quotient ?q } => { :r :v ?q } .",
     f'<{X}r> <{X}v> "3.5"^^<{XSD}decimal> .',
     {"think": True, "conclusions": True}),
    ("reason_math_remainder_exp", "Reason",
     "@prefix : <http://ex/>. @prefix math: <http://www.w3.org/2000/10/swap/math#>. "
     "{ (7 2) math:remainder ?m . (2 10) math:exponentiation ?e } "
     "=> { :r :m ?m ; :e ?e } .",
     f'<{X}r> <{X}m> "1"^^<{XSD}integer> .\n'
     f'<{X}r> <{X}e> "1024"^^<{XSD}integer> .',
     {"think": True, "conclusions": True}),
    ("reason_math_unary", "Reason",
     "@prefix : <http://ex/>. @prefix math: <http://www.w3.org/2000/10/swap/math#>. "
     "{ 5 math:negation ?n . -3 math:absoluteValue ?a . "
     "2.5 math:rounded ?x } => { :r :n ?n ; :a ?a ; :x ?x } .",
     f'<{X}r> <{X}n> "-5"^^<{XSD}integer> .\n'
     f'<{X}r> <{X}a> "3"^^<{XSD}integer> .\n'
     f'<{X}r> <{X}x> "3"^^<{XSD}integer> .',
     {"think": True, "conclusions": True}),
    ("reason_math_notlessthan_guard", "Reason",
     "@prefix : <http://ex/>. @prefix math: <http://www.w3.org/2000/10/swap/math#>. "
     "{ 5 math:notLessThan 5 } => { :r :ok true } .",
     f'<{X}r> <{X}ok> "true"^^<{XSD}boolean> .',
     {"think": True, "conclusions": True}),
    ("reason_time_fields", "Reason",
     "@prefix : <http://ex/>. @prefix time: <http://www.w3.org/2000/10/swap/time#>. "
     '{ "2024-03-05T10:20:30Z"^^<http://www.w3.org/2001/XMLSchema#dateTime> '
     "time:year ?y . "
     '"2024-03-05T10:20:30Z"^^<http://www.w3.org/2001/XMLSchema#dateTime> '
     "time:month ?m } => { :r :y ?y ; :m ?m } .",
     f'<{X}r> <{X}y> "2024"^^<{XSD}integer> .\n'
     f'<{X}r> <{X}m> "3"^^<{XSD}integer> .',
     {"think": True, "conclusions": True}),
    ("reason_log_dtlit", "Reason",
     "@prefix : <http://ex/>. @prefix log: <http://www.w3.org/2000/10/swap/log#>. "
     "@prefix xsd: <http://www.w3.org/2001/XMLSchema#>. "
     '{ ("5" xsd:integer) log:dtlit ?x } => { :r :v ?x } .',
     f'<{X}r> <{X}v> "5"^^<{XSD}integer> .',
     {"think": True, "conclusions": True}),
    ("reason_log_langlit", "Reason",
     "@prefix : <http://ex/>. @prefix log: <http://www.w3.org/2000/10/swap/log#>. "
     '{ ("hi" "en") log:langlit ?x } => { :r :v ?x } .',
     f'<{X}r> <{X}v> "hi"@en .',
     {"think": True, "conclusions": True}),
    ("reason_log_equalTo_pair", "Reason",
     "@prefix : <http://ex/>. @prefix log: <http://www.w3.org/2000/10/swap/log#>. "
     "{ :a log:equalTo :a . :a log:notEqualTo :b } => { :r :ok true } .",
     f'<{X}r> <{X}ok> "true"^^<{XSD}boolean> .',
     {"think": True, "conclusions": True}),
    ("reason_guard_blocks_fire", "Reason",
     "@prefix : <http://ex/>. @prefix math: <http://www.w3.org/2000/10/swap/math#>. "
     ":a :v 2 . { ?x :v ?n . ?n math:greaterThan 3 } => { ?x a :Big } .",
     f'<{X}a> <{X}v> "2"^^<{XSD}integer> .',
     {"think": True, "data": True}),
    # --- round-3 Reason batch 3: string/crypto/list tail -------------
    ("reason_string_guards", "Reason",
     "@prefix : <http://ex/>. @prefix string: <http://www.w3.org/2000/10/swap/string#>. "
     '{ "hello" string:contains "ell" . '
     '"HeLLo" string:containsIgnoringCase "ell" . '
     '"hello" string:startsWith "he" . "b" string:greaterThan "a" . '
     '"hello" string:notMatches "^x" } => { :r :ok true } .',
     f'<{X}r> <{X}ok> "true"^^<{XSD}boolean> .',
     {"think": True, "conclusions": True}),
    ("reason_string_format", "Reason",
     "@prefix : <http://ex/>. @prefix string: <http://www.w3.org/2000/10/swap/string#>. "
     '{ ("%s-%s" "a" "b") string:format ?x } => { :r :v ?x } .',
     f'<{X}r> <{X}v> "a-b" .',
     {"think": True, "conclusions": True}),
    ("reason_string_scrape", "Reason",
     "@prefix : <http://ex/>. @prefix string: <http://www.w3.org/2000/10/swap/string#>. "
     '{ ("v=42;" "v=([0-9]+)") string:scrape ?x } => { :r :v ?x } .',
     f'<{X}r> <{X}v> "42" .',
     {"think": True, "conclusions": True}),
    ("reason_crypto_hashes", "Reason",
     "@prefix : <http://ex/>. @prefix crypto: <http://www.w3.org/2000/10/swap/crypto#>. "
     '{ "abc" crypto:md5 ?m . "abc" crypto:sha1 ?s } '
     "=> { :r :md5 ?m ; :sha1 ?s } .",
     f'<{X}r> <{X}md5> "900150983cd24fb0d6963f7d28e17f72" .\n'
     f'<{X}r> <{X}sha1> "a9993e364706816aba3e25717850c26c9cd0d89d" .',
     {"think": True, "conclusions": True}),
    ("reason_list_first_in", "Reason",
     "@prefix : <http://ex/>. @prefix list: <http://www.w3.org/2000/10/swap/list#>. "
     "{ (7 8 9) list:first ?f . 8 list:in (7 8 9) } => { :r :v ?f } .",
     f'<{X}r> <{X}v> "7"^^<{XSD}integer> .',
     {"think": True, "conclusions": True}),
    ("reason_list_iterate_fanout", "Reason",
     "@prefix : <http://ex/>. @prefix list: <http://www.w3.org/2000/10/swap/list#>. "
     "{ (7 8) list:iterate (?i ?m) } => { :r :at ?i ; :val ?m } .",
     f'<{X}r> <{X}at> "0"^^<{XSD}integer> .\n'
     f'<{X}r> <{X}val> "7"^^<{XSD}integer> .\n'
     f'<{X}r> <{X}at> "1"^^<{XSD}integer> .\n'
     f'<{X}r> <{X}val> "8"^^<{XSD}integer> .',
     {"think": True, "conclusions": True}),
    # --- round-3 Eval batch: formula terms + list-ladder corners ------
    ("eval_formula_as_subject", "Eval",
     "@prefix : <http://ex/>. { :a :b :c } :says :d .",
     f"<{X}a> <{X}b> <{X}c> _:F0 .\n_:F0 <{X}says> <{X}d> .", {}),
    ("eval_two_triple_formula_object", "Eval",
     "@prefix : <http://ex/>. :g :says { :a :b :c . :d :e :f } .",
     f"<{X}a> <{X}b> <{X}c> _:F0 .\n<{X}d> <{X}e> <{X}f> _:F0 .\n"
     f"<{X}g> <{X}says> _:F0 .", {}),
    ("eval_empty_formulae_both_sides", "Eval",
     "@prefix : <http://ex/>. {} :implies {} .",
     f"_:F0 <{X}implies> _:F1 .", {}),
    ("eval_nested_list_ladder_in_formula", "Eval",
     "@prefix : <http://ex/>. { :s :p (1 (2) ) } :q :r .",
     f'_:I <{RDFNS}first> "2"^^<{XSD}integer> _:F0 .\n'
     f"_:I <{RDFNS}rest> <{RDFNS}nil> _:F0 .\n"
     f'_:A <{RDFNS}first> "1"^^<{XSD}integer> _:F0 .\n'
     f"_:A <{RDFNS}rest> _:B _:F0 .\n"
     f"_:B <{RDFNS}first> _:I _:F0 .\n"
     f"_:B <{RDFNS}rest> <{RDFNS}nil> _:F0 .\n"
     f"<{X}s> <{X}p> _:A _:F0 .\n"
     f"_:F0 <{X}q> <{X}r> .", {}),
    ("eval_bnode_propertylist_in_list", "Eval",
     "@prefix : <http://ex/>. :s :p ( [ :a :b ] ) .",
     f"_:N <{X}a> <{X}b> .\n_:L <{RDFNS}first> _:N .\n"
     f"_:L <{RDFNS}rest> <{RDFNS}nil> .\n<{X}s> <{X}p> _:L .", {}),
    ("eval_tagged_literals_in_list", "Eval",
     '@prefix : <http://ex/>. :s :p ( "x"@en '
     '"5"^^<http://www.w3.org/2001/XMLSchema#int> ) .',
     f'_:A <{RDFNS}first> "x"@en .\n_:A <{RDFNS}rest> _:B .\n'
     f'_:B <{RDFNS}first> "5"^^<{XSD}int> .\n'
     f"_:B <{RDFNS}rest> <{RDFNS}nil> .\n<{X}s> <{X}p> _:A .", {}),
    # --- round-3 batch: manifest-typed syntax cases (types verified
    # against etc/manifests.ttl entries of the same names) ------------
    ("syntax_space_in_uri_neg", "NegativeSyntax",
     "<http://ex/a b> <http://ex/p> <http://ex/o> .", None, {}),
    ("syntax_newline_in_uri_neg", "NegativeSyntax",
     "<http://ex/a\nb> <http://ex/p> <http://ex/o> .", None, {}),
    ("syntax_zero_objects_neg", "NegativeSyntax",
     "@prefix : <http://ex/>. :s :p .", None, {}),
    ("syntax_thisadoc_neg", "NegativeSyntax",
     "@prefix : <http://ex/>. this a :doc .", None, {}),
    ("syntax_zero_predicates_pos", "PositiveSyntax",
     "@prefix : <http://ex/>. :s .", None, {}),
    ("syntax_single_quote_pos", "Eval",
     "@prefix : <http://ex/>. :s :p 'hi' .",
     f'<{X}s> <{X}p> "hi" .', {}),
    # the modern N3 grammar ACCEPTS literal subjects/predicates
    # (manifest types cwm_syntax_bad-preds-literal / neg-literal-
    # predicate as PositiveSyntax despite their legacy names)
    ("syntax_literal_predicate_pos", "Eval",
     "@prefix : <http://ex/>. :s 42 :o .",
     f'<{X}s> "42"^^<{XSD}integer> <{X}o> .', {}),
    ("syntax_literal_subject_pos", "Eval",
     '@prefix : <http://ex/>. "lit" :p :o .',
     f'"lit" <{X}p> <{X}o> .', {}),
    ("syntax_double_dot_neg", "NegativeSyntax",
     "@prefix : <http://ex/>. :s :p :o . .", None, {}),
    ("syntax_unclosed_iriref_neg", "NegativeSyntax",
     "<http://ex/a <http://ex/p> <http://ex/o> .", None, {}),
    # --- round-3 Reason batch 4: unification semantics ---------------
    ("reason_reflexive_unify", "Reason",
     "@prefix : <http://ex/>. :a :r :a . "
     "{ ?x :r ?y . ?y :r ?x } => { :ok :sym true } .",
     f"<{X}a> <{X}r> <{X}a> .\n"
     f'<{X}ok> <{X}sym> "true"^^<{XSD}boolean> .',
     {"think": True, "data": True}),
    ("reason_bnode_data_unifies_var", "Reason",
     "@prefix : <http://ex/>. [ :p :v ] . "
     "{ ?x :p :v } => { ?x a :Found } .",
     f"_:N <{X}p> <{X}v> .\n_:N <{RDFNS}type> <{X}Found> .",
     {"think": True, "data": True}),
    ("reason_list_valued_binding", "Reason",
     "@prefix : <http://ex/>. :s :p (1 2) . "
     "{ :s :p ?L } => { :r :got ?L } .",
     f'<{X}s> <{X}p> ("1"^^<{XSD}integer> "2"^^<{XSD}integer>) .\n'
     f'<{X}r> <{X}got> ("1"^^<{XSD}integer> "2"^^<{XSD}integer>) .',
     {"think": True, "data": True}),
    # conclusion bnodes bind per VARIABLE NAME, not per solution
    # (formula.rb:243 `solution[var.name] ||= RDF::Node.intern(...)`) —
    # both firings share ONE node, which accumulates both :n values;
    # a cwm-style fresh-node-per-firing would diverge here
    ("reason_conclusion_bnode_shared_by_name", "Reason",
     "@prefix : <http://ex/>. :a :t 1 . :b :t 2 . "
     "{ ?x :t ?n } => { ?x :w [ :n ?n ] } .",
     f'<{X}a> <{X}t> "1"^^<{XSD}integer> .\n'
     f'<{X}b> <{X}t> "2"^^<{XSD}integer> .\n'
     f'_:W <{X}n> "1"^^<{XSD}integer> .\n'
     f'_:W <{X}n> "2"^^<{XSD}integer> .\n'
     f"<{X}a> <{X}w> _:W .\n<{X}b> <{X}w> _:W .",
     {"think": True, "data": True}),
    ("reason_rule_chain_two_hops", "Reason",
     "@prefix : <http://ex/>. :a :p :b . "
     "{ ?x :p ?y } => { ?x :q ?y } . { ?x :q ?y } => { ?x :r ?y } .",
     f"<{X}a> <{X}p> <{X}b> .\n<{X}a> <{X}q> <{X}b> .\n"
     f"<{X}a> <{X}r> <{X}b> .",
     {"think": True, "data": True}),
    # --- round-3 Reason batch 5: conjunction, meta-rules, data lists --
    ("reason_conjunction_includes_both", "Reason",
     "@prefix : <http://ex/>. @prefix log: <http://www.w3.org/2000/10/swap/log#>. "
     ":g1 :is { :a :b :c } . :g2 :is { :d :e :f } . "
     "{ :g1 :is ?F . :g2 :is ?G . (?F ?G) log:conjunction ?H . "
     "?H log:includes { :a :b :c } . ?H log:includes { :d :e :f } } "
     "=> { :r :ok true } .",
     f'<{X}r> <{X}ok> "true"^^<{XSD}boolean> .',
     {"think": True, "data": True}),
    ("reason_rule_emits_rule", "Reason",
     "@prefix : <http://ex/>. "
     ":seed :v 1 . { :seed :v 1 } => { { ?x :t ?y } => { ?x :t2 ?y } } . "
     ":a :t :b .",
     f'<{X}seed> <{X}v> "1"^^<{XSD}integer> .\n'
     f"<{X}a> <{X}t> <{X}b> .\n<{X}a> <{X}t2> <{X}b> .",
     {"think": True, "data": True}),
    ("reason_sum_over_data_list", "Reason",
     "@prefix : <http://ex/>. @prefix math: <http://www.w3.org/2000/10/swap/math#>. "
     ":l :nums (1 2 3 4) . { :l :nums ?L . ?L math:sum ?s } "
     "=> { :r :sum ?s } .",
     f'<{X}r> <{X}sum> "10"^^<{XSD}integer> .',
     {"think": True, "conclusions": True}),
]

# ---------------------------------------------------------------------------
# Round-4 additions.
#
# (a) Turtle-suite corners (reference runs the W3C Turtle suite too,
#     spec/suite_turtle_spec.rb:8): numeric sign/shape corners, string
#     escape corners, PN_LOCAL/BLANK_NODE_LABEL character corners,
#     base-relative IRI resolution corners, N3-vs-Turtle divergences
#     (literal subjects, ^ reverse paths) — hand-derived expecteds.
# (b) SLOW-manifest families at reduced size (suite_helper.rb:124-177
#     tags 1k-10k-triple inputs SLOW and skips them in CI; these are
#     the same shapes — graph-N chains, dt-N typed literals, list and
#     formula bulk, proof chains — generated deterministically at a
#     size CI can afford).
# ---------------------------------------------------------------------------

CASES += [
    # --- (a) Turtle corners: positive syntax ---------------------------
    ("t4_syntax_pname_percent", "PositiveSyntax",
     "@prefix : <http://ex/>. :a%2Bb :p :o .", None, {}),
    ("t4_syntax_bnode_medial_dot", "PositiveSyntax",
     "_:a.b <http://p> <http://o> .", None, {}),
    ("t4_syntax_bnode_digit_start", "PositiveSyntax",
     "_:0a <http://p> <http://o> .", None, {}),
    ("t4_syntax_langtag_subtags", "PositiveSyntax",
     '@prefix : <http://ex/>. :s :p "x"@en-US-x-priv .', None, {}),
    # --- (a) Turtle corners: negative syntax ---------------------------
    ("t4_neg_langtag_digit", "NegativeSyntax",
     '@prefix : <http://ex/>. :s :p "x"@12 .', None, {}),
    ("t4_neg_bnode_final_dot", "NegativeSyntax",
     "_:a. <http://b> <http://c> .", None, {}),
    ("t4_neg_bad_uchar", "NegativeSyntax",
     "<http://ex/\\uZZZZ> <http://p> <http://o> .", None, {}),
    ("t4_neg_unclosed_long_string", "NegativeSyntax",
     '@prefix : <http://ex/>. :s :p """abc .', None, {}),
    ("t4_neg_bare_plus_object", "NegativeSyntax",
     "@prefix : <http://ex/>. :s :p + .", None, {}),
    ("t4_neg_raw_newline_in_short_string", "NegativeSyntax",
     '@prefix : <http://ex/>. :s :p "a\nb" .', None, {}),
    ("t4_neg_undeclared_prefix", "NegativeSyntax",
     "und:x <http://p> <http://o> .", None, {}),
    ("t4_neg_local_leading_dot", "NegativeSyntax",
     "@prefix : <http://ex/>. :.a :p :o .", None, {}),
    ("t4_neg_integer_then_double_dot", "NegativeSyntax",
     "@prefix : <http://ex/>. :s :p 5. .", None, {}),
    ("t4_neg_surrogate_uescape", "NegativeSyntax",
     '@prefix : <http://ex/>. :s :p "\\uD800" .', None, {}),
    # --- (a) Turtle corners: eval ---------------------------------------
    ("t4_eval_signed_numeric_shapes", "Eval",
     "@prefix : <http://ex/>. :s :p +.5, -0.0, +0, -.5e-1 .",
     f'<{X}s> <{X}p> "+.5"^^<{XSD}decimal> .\n'
     f'<{X}s> <{X}p> "-0.0"^^<{XSD}decimal> .\n'
     f'<{X}s> <{X}p> "+0"^^<{XSD}integer> .\n'
     f'<{X}s> <{X}p> "-.5e-1"^^<{XSD}double> .', {}),
    ("t4_eval_long_string_inner_quotes", "Eval",
     '@prefix : <http://ex/>. :s :p """a "q" and ""dq"" end""" .',
     f'<{X}s> <{X}p> "a \\"q\\" and \\"\\"dq\\"\\" end" .', {}),
    ("t4_eval_long_single_newline", "Eval",
     "@prefix : <http://ex/>. :s :p '''line1\nline2''' .",
     f'<{X}s> <{X}p> "line1\\nline2" .', {}),
    ("t4_eval_escape_soup", "Eval",
     '@prefix : <http://ex/>. :s :p "\\t\\b\\n\\r\\f\\"\\\\" .',
     f'<{X}s> <{X}p> "\\t\\b\\n\\r\\f\\"\\\\" .', {}),
    ("t4_eval_uescape_astral", "Eval",
     '@prefix : <http://ex/>. :s :p "\\U0001F600" .',
     f'<{X}s> <{X}p> "\U0001F600" .', {}),
    ("t4_eval_pname_percent_preserved", "Eval",
     "@prefix : <http://ex/>. :a%2Bb :p :o .",
     f"<{X}a%2Bb> <{X}p> <{X}o> .", {}),
    ("t4_eval_pname_esc_bang", "Eval",
     "@prefix : <http://ex/>. :x\\!y :p :o .",
     f"<{X}x!y> <{X}p> <{X}o> .", {}),
    ("t4_eval_base_relative_corners", "Eval",
     "@base <http://ex/a/b/c>. <#f> <> <./x> . <../y> <//h/p> <?q> .",
     "<http://ex/a/b/c#f> <http://ex/a/b/c> <http://ex/a/b/x> .\n"
     "<http://ex/a/y> <http://h/p> <http://ex/a/b/c?q> .", {}),
    ("t4_eval_iri_uchar", "Eval",
     "<http://ex/\\u00E9x> <http://p> <http://o> .",
     "<http://ex/éx> <http://p> <http://o> .", {}),
    ("t4_eval_prefix_redefined_mid_doc", "Eval",
     "@prefix p: <http://a/>. p:x <http://p> p:y . "
     "@prefix p: <http://b/>. p:x <http://p> p:y .",
     "<http://a/x> <http://p> <http://a/y> .\n"
     "<http://b/x> <http://p> <http://b/y> .", {}),
    ("t4_eval_literal_subject_n3", "Eval",
     # N3 divergence from Turtle: literals are valid subjects
     '@prefix : <http://ex/>. "lit" :p :o .',
     f'"lit" <{X}p> <{X}o> .', {}),
    ("t4_eval_reverse_path_on_literal", "Eval",
     # N3 divergence from Turtle: ^ is reverse path, not a typo for ^^
     '@prefix : <http://ex/>. :s :p "x"^:dt .',
     f'_:B <{X}dt> "x" .\n<{X}s> <{X}p> _:B .', {}),
    ("t4_eval_nested_empty_lists", "Eval",
     "@prefix : <http://ex/>. :s :p (() (())) .",
     f"_:L1 <{RDFNS}first> <{RDFNS}nil> .\n_:L1 <{RDFNS}rest> _:L2 .\n"
     f"_:L2 <{RDFNS}first> _:I .\n_:L2 <{RDFNS}rest> <{RDFNS}nil> .\n"
     f"_:I <{RDFNS}first> <{RDFNS}nil> .\n_:I <{RDFNS}rest> <{RDFNS}nil> .\n"
     f"<{X}s> <{X}p> _:L1 .", {}),
    ("t4_eval_anon_chain", "Eval",
     "@prefix : <http://ex/>. [ :p [ :q [ :r :o ] ] ] :top :z .",
     f"_:A <{X}p> _:B .\n_:B <{X}q> _:C .\n_:C <{X}r> <{X}o> .\n"
     f"_:A <{X}top> <{X}z> .", {}),
]

# --- round-4 batch b: combining-feature Reason cases (each primitive is
# individually proven above; these lock their interactions) ----------------
CASES += [
    # forward path sugar INSIDE a rule antecedent: `:a!:p :q2 ?y`
    # desugars to `:a :p _:b . _:b :q2 ?y`, and the antecedent's bnode
    # matches like a variable (reader.rb:431-458 + formula bnode-as-var)
    ("r4b_reason_path_in_antecedent", "Reason",
     "@prefix : <http://ex/>. :a :p :m . :m :q2 :v . "
     "{ :a!:p :q2 ?y } => { :r :res ?y } .",
     f"<{X}a> <{X}p> <{X}m> .\n<{X}m> <{X}q2> <{X}v> .\n"
     f"<{X}r> <{X}res> <{X}v> .",
     {"think": True, "data": True}),
    # two numeric guards bracket the binding
    ("r4b_reason_guard_bracket", "Reason",
     f"@prefix : <http://ex/>. @prefix math: <{MATHNS}>. "
     ":x :n 5 . :y :n 20 . "
     "{ ?s :n ?v . ?v math:greaterThan 3 . ?v math:lessThan 10 } "
     "=> { ?s a :Mid } .",
     f'<{X}x> <{X}n> "5"^^<{XSD}integer> .\n'
     f'<{X}y> <{X}n> "20"^^<{XSD}integer> .\n'
     f"<{X}x> <{RDFNS}type> <{X}Mid> .",
     {"think": True, "data": True}),
    # string guard + arithmetic in ONE antecedent
    ("r4b_reason_string_guard_then_sum", "Reason",
     f"@prefix : <{X}>. @prefix string: <{STRNS}>. @prefix math: <{MATHNS}>. "
     ':x :tag "abc" . :x :n 2 . :z :tag "zz" . :z :n 7 . '
     '{ ?s :tag ?t . ?t string:startsWith "ab" . ?s :n ?v . '
     "(?v 3) math:sum ?m } => { ?s :m ?m } .",
     f'<{X}x> <{X}tag> "abc" .\n<{X}x> <{X}n> "2"^^<{XSD}integer> .\n'
     f'<{X}z> <{X}tag> "zz" .\n<{X}z> <{X}n> "7"^^<{XSD}integer> .\n'
     f'<{X}x> <{X}m> "5"^^<{XSD}integer> .',
     {"think": True, "data": True}),
    # a forward rule whose antecedent is PROVED by a backward rule
    ("r4b_reason_backward_feeds_forward", "Reason",
     "@prefix : <http://ex/>. { ?x :p ?y } <= { ?x :q ?y } . "
     ":a :q :b . { ?x :p ?y } => { ?x :r ?y } .",
     f"<{X}a> <{X}q> <{X}b> .\n<{X}a> <{X}p> <{X}b> .\n"
     f"<{X}a> <{X}r> <{X}b> .",
     {"think": True, "data": True}),
    # list:member fan-out filtered by a numeric guard
    ("r4b_reason_member_guarded", "Reason",
     f"@prefix : <http://ex/>. @prefix list: <{LISTNS}>. "
     f"@prefix math: <{MATHNS}>. "
     ":l :xs (1 5 9) . { :l :xs ?L . ?L list:member ?m . "
     "?m math:greaterThan 4 } => { :r :big ?m } .",
     f'<{X}r> <{X}big> "5"^^<{XSD}integer> .\n'
     f'<{X}r> <{X}big> "9"^^<{XSD}integer> .',
     {"think": True, "conclusions": True}),
    # time projection feeding a numeric guard
    ("r4b_reason_year_guard", "Reason",
     f"@prefix : <http://ex/>. @prefix time: <{TIMENS}>. "
     f"@prefix math: <{MATHNS}>. "
     ':e :at "2026-08-18T10:00:00Z"^^<http://www.w3.org/2001/XMLSchema#dateTime> . '
     "{ ?s :at ?t . ?t time:year ?y . ?y math:notLessThan 2020 } "
     "=> { ?s :recent true } .",
     f'<{X}e> <{X}recent> "true"^^<{XSD}boolean> .',
     {"think": True, "conclusions": True}),
    # chained arithmetic: product then quotient — quotient follows
    # xpath numeric-divide (reference math/quotient.rb:5): int/int is
    # DECIMAL, so 24/2 = 12.0^^xsd:decimal, not 12^^xsd:integer
    ("r4b_reason_product_quotient", "Reason",
     f"@prefix : <http://ex/>. @prefix math: <{MATHNS}>. "
     "{ (6 4) math:product ?p . (?p 2) math:quotient ?q } "
     "=> { :r :val ?q } .",
     f'<{X}r> <{X}val> "12.0"^^<{XSD}decimal> .',
     {"think": True, "conclusions": True}),
    # string:replace output feeds string:contains
    ("r4b_reason_replace_then_contains", "Reason",
     f"@prefix : <{X}>. @prefix string: <{STRNS}>. "
     '{ ("hello world" "world" "there") string:replace ?r . '
     '?r string:contains "there" } => { :ok :v ?r } .',
     f'<{X}ok> <{X}v> "hello there" .',
     {"think": True, "conclusions": True}),
    # two independent rules reusing the SAME quickvar name ?x scope
    # per rule formula, not globally
    ("r4b_reason_var_scope_per_rule", "Reason",
     "@prefix : <http://ex/>. :a :p 1 . :b :q 2 . "
     "{ ?x :p ?v } => { ?x :sawP true } . "
     "{ ?x :q ?v } => { ?x :sawQ true } .",
     f'<{X}a> <{X}p> "1"^^<{XSD}integer> .\n'
     f'<{X}b> <{X}q> "2"^^<{XSD}integer> .\n'
     f'<{X}a> <{X}sawP> "true"^^<{XSD}boolean> .\n'
     f'<{X}b> <{X}sawQ> "true"^^<{XSD}boolean> .',
     {"think": True, "data": True}),
    # list:length guard selects only the longer list
    ("r4b_reason_length_guard", "Reason",
     f"@prefix : <http://ex/>. @prefix list: <{LISTNS}>. "
     f"@prefix math: <{MATHNS}>. "
     ":s :xs (1 2 3) . :t :xs (4) . "
     "{ ?d :xs ?L . ?L list:length ?n . ?n math:greaterThan 1 } "
     "=> { ?d a :Long } .",
     f"<{X}s> <{RDFNS}type> <{X}Long> .",
     {"think": True, "conclusions": True}),
    # log:includes as a rule guard over a named formula
    ("r4b_reason_includes_guard", "Reason",
     "@prefix : <http://ex/>. @prefix log: <http://www.w3.org/2000/10/swap/log#>. "
     ":g :is { :a :b :c . :d :e :f } . "
     "{ :g :is ?F . ?F log:includes { :a :b :c } } => { :r :ok true } .",
     f'<{X}r> <{X}ok> "true"^^<{XSD}boolean> .',
     {"think": True, "conclusions": True}),
    # transitive closure PLUS a projection rule over the closure
    ("r4b_reason_closure_then_project", "Reason",
     "@prefix : <http://ex/>. :a :sub :b . :b :sub :c . "
     "{ ?x :sub ?y . ?y :sub ?z } => { ?x :sub ?z } . "
     "{ ?x :sub :c } => { ?x a :UnderC } .",
     f"<{X}a> <{X}sub> <{X}b> .\n<{X}b> <{X}sub> <{X}c> .\n"
     f"<{X}a> <{X}sub> <{X}c> .\n"
     f"<{X}b> <{RDFNS}type> <{X}UnderC> .\n"
     f"<{X}a> <{RDFNS}type> <{X}UnderC> .",
     {"think": True, "data": True}),
]


def _slow_reduced_cases():
    """SLOW-manifest shapes at CI-affordable size, generated
    deterministically (same generation idea as 01etc_graph-1000 /
    test-dt-1000 / proof chains, reduced ~10x)."""
    cases = []

    # graph-N: one long :next chain (01etc_graph-1000 shape)
    n = 200
    src = ["@prefix : <http://ex/>."]
    exp = []
    for i in range(n):
        src.append(f":n{i} :next :n{i + 1} .")
        exp.append(f"<{X}n{i}> <{X}next> <{X}n{i + 1}> .")
    cases.append(("t4_slow_graph_200", "Eval",
                  "\n".join(src), "\n".join(exp), {}))

    # dt-N: typed-literal bulk (test-dt-1000 shape)
    kinds = [
        ('"{}"^^<{}integer>', "{}"),
        ('"{}.5"^^<{}decimal>', "{}.5"),
        ('"{}.0e1"^^<{}double>', "{}.0e1"),
        ('"s{}"', '"s{}"'),
    ]
    src = ["@prefix : <http://ex/>.", "@prefix x: <" + XSD + ">."]
    exp = []
    for i in range(120):
        tmpl, lex = kinds[i % 4]
        lit = lex.format(i)
        src.append(f":d{i} :v {lit} .")
        if tmpl.startswith('"s'):
            exp.append(f'<{X}d{i}> <{X}v> "s{i}" .')
        else:
            exp.append(f"<{X}d{i}> <{X}v> " + tmpl.format(i, XSD) + " .")
    cases.append(("t4_slow_dt_120", "Eval",
                  "\n".join(src), "\n".join(exp), {}))

    # star fan-out: one hub, many spokes (mmln-gv graph shape)
    n = 150
    src = ["@prefix : <http://ex/>.",
           ":hub :to " + ", ".join(f":s{i}" for i in range(n)) + " ."]
    exp = [f"<{X}hub> <{X}to> <{X}s{i}> ." for i in range(n)]
    cases.append(("t4_slow_star_150", "Eval",
                  "\n".join(src), "\n".join(exp), {}))

    # prefix bulk: many prefixes, each used (04test namespace soup)
    n = 60
    src = [f"@prefix p{i}: <http://ns{i}/>." for i in range(n)]
    src += [f"p{i}:a p{i}:b p{i}:c ." for i in range(n)]
    exp = [f"<http://ns{i}/a> <http://ns{i}/b> <http://ns{i}/c> ."
           for i in range(n)]
    cases.append(("t4_slow_prefixes_60", "Eval",
                  "\n".join(src), "\n".join(exp), {}))

    # formula bulk: many scoped graph literals (05smml FACTS shape)
    n = 60
    src = ["@prefix : <http://ex/>."]
    exp = []
    for i in range(n):
        src.append(f"{{ :a{i} :b :c{i} }} :says :d{i} .")
        exp.append(f"<{X}a{i}> <{X}b> <{X}c{i}> _:F{i} .")
        exp.append(f"_:F{i} <{X}says> <{X}d{i}> .")
    cases.append(("t4_slow_formulae_60", "Eval",
                  "\n".join(src), "\n".join(exp), {}))

    # list bulk, list_terms mode (test-dl-1000 shape)
    n = 100
    src = ["@prefix : <http://ex/>.",
           ":l :is ( " + " ".join(str(i) for i in range(n)) + " ) ."]
    exp = [f"<{X}l> <{X}is> ("
           + " ".join(f'"{i}"^^<{XSD}integer>' for i in range(n)) + ") ."]
    cases.append(("t4_slow_list_100_terms", "Eval",
                  "\n".join(src), "\n".join(exp), {"list_terms": True}))

    # list bulk, first/rest mode at reduced size
    n = 20
    src = ["@prefix : <http://ex/>.",
           ":l :is ( " + " ".join(f":e{i}" for i in range(n)) + " ) ."]
    exp = []
    for i in range(n):
        nxt = f"_:C{i + 1}" if i + 1 < n else f"<{RDFNS}nil>"
        exp.append(f"_:C{i} <{RDFNS}first> <{X}e{i}> .")
        exp.append(f"_:C{i} <{RDFNS}rest> {nxt} .")
    exp.append(f"<{X}l> <{X}is> _:C0 .")
    cases.append(("t4_slow_list_20_firstrest", "Eval",
                  "\n".join(src), "\n".join(exp), {}))

    # proof chain: K sequential rules p0 -> p1 -> ... (proof-N shape)
    k = 20
    src = ["@prefix : <http://ex/>.", ":a :p0 :b ."]
    exp = [f"<{X}a> <{X}p0> <{X}b> ."]
    for i in range(k):
        src.append(f"{{ ?x :p{i} ?y }} => {{ ?x :p{i + 1} ?y }} .")
        exp.append(f"<{X}a> <{X}p{i + 1}> <{X}b> .")
    cases.append(("t4_slow_proof_chain_20", "Reason",
                  "\n".join(src), "\n".join(exp),
                  {"think": True, "data": True}))

    # transitive closure over a 32-node chain (path-256-3 shape)
    n = 32
    src = ["@prefix : <http://ex/>."]
    src += [f":c{i} :arc :c{i + 1} ." for i in range(n - 1)]
    src.append("{ ?x :arc ?y } => { ?x :path ?y } .")
    src.append("{ ?x :path ?y . ?y :arc ?z } => { ?x :path ?z } .")
    exp = [f"<{X}c{i}> <{X}arc> <{X}c{i + 1}> ." for i in range(n - 1)]
    exp += [f"<{X}c{i}> <{X}path> <{X}c{j}> ."
            for i in range(n) for j in range(i + 1, n)]
    cases.append(("t4_slow_path_closure_32", "Reason",
                  "\n".join(src), "\n".join(exp),
                  {"think": True, "data": True}))

    # counter walk via math:sum (easter/fib proof shape: arithmetic
    # recursion along a structure)
    n = 24
    src = ["@prefix : <http://ex/>.",
           "@prefix math: <http://www.w3.org/2000/10/swap/math#>.",
           ":c0 :val 0 ."]
    src += [f":c{i} :succ :c{i + 1} ." for i in range(n)]
    src.append("{ ?a :succ ?b . ?a :val ?n . (?n 1) math:sum ?m } "
               "=> { ?b :val ?m } .")
    exp = [f"<{X}c0> <{X}val> \"0\"^^<{XSD}integer> ."]
    exp += [f"<{X}c{i}> <{X}succ> <{X}c{i + 1}> ." for i in range(n)]
    exp += [f'<{X}c{i + 1}> <{X}val> "{i + 1}"^^<{XSD}integer> .'
            for i in range(n)]
    cases.append(("t4_slow_counter_24", "Reason",
                  "\n".join(src), "\n".join(exp),
                  {"think": True, "data": True}))

    return cases


CASES += _slow_reduced_cases()

# Round-4 batch 2: more Turtle/N3 grammar corners (probed against the
# parser and cross-checked with the reference grammar; @forAll/@forSome
# /@keywords are pre-CG N3 that the modern grammar — and the reference
# reader — dropped, hence NegativeSyntax).
CASES += [
    ("t4_eval_exponent_signs", "Eval",
     "@prefix : <http://ex/>. :s :p 1.0E+3, 2E-2 .",
     f'<{X}s> <{X}p> "1.0E+3"^^<{XSD}double> .\n'
     f'<{X}s> <{X}p> "2E-2"^^<{XSD}double> .', {}),
    ("t4_eval_spaced_datatype_caret", "Eval",
     '@prefix : <http://ex/>. :s :p "x" ^^ <http://dt> .',
     f'<{X}s> <{X}p> "x"^^<http://dt> .', {}),
    ("t4_eval_empty_prefix_iri_is_base", "Eval",
     "@base <http://b/>. @prefix : <>. :x :y :z .",
     "<http://b/x> <http://b/y> <http://b/z> .", {}),
    ("t4_eval_comment_at_eof_no_newline", "Eval",
     "@prefix : <http://ex/>. :a :b :c . # tail",
     f"<{X}a> <{X}b> <{X}c> .", {}),
    ("t4_eval_empty_short_and_long_strings", "Eval",
     '@prefix : <http://ex/>. :s :p "", """""" .',
     f'<{X}s> <{X}p> "" .\n<{X}s> <{X}p> "" .', {}),
    ("t4_eval_uescape_is_char", "Eval",
     '@prefix : <http://ex/>. :s :p "\\u0041" .',
     f'<{X}s> <{X}p> "A" .', {}),
    ("t4_eval_bnode_predicate_n3", "Eval",
     # N3 divergence from Turtle: blank nodes are valid predicates
     "@prefix : <http://ex/>. :s _:p :o .",
     f"<{X}s> _:p <{X}o> .", {}),
    ("t4_eval_nil_subject_and_object", "Eval",
     "@prefix : <http://ex/>. () :p () .",
     f"<{RDFNS}nil> <{X}p> <{RDFNS}nil> .", {}),
    ("t4_eval_numeric_literal_subject", "Eval",
     # N3 divergence from Turtle: literal subjects
     "@prefix : <http://ex/>. 10 :isa :Number .",
     f'"10"^^<{XSD}integer> <{X}isa> <{X}Number> .', {}),
    ("t4_eval_literal_predicate_n3", "Eval",
     # predicate ::= expression in the N3 grammar — literals included
     '@prefix : <http://ex/>. :s "p" :o .',
     f'<{X}s> "p" <{X}o> .', {}),
    ("t4_eval_langtag_then_dot", "Eval",
     '@prefix : <http://ex/>. :s :p "x"@en.',
     f'<{X}s> <{X}p> "x"@en .', {}),
    ("t4_eval_empty_pname_local", "Eval",
     "@prefix p: <http://ex/>. p: p: p: .",
     f"<{X}> <{X}> <{X}> .", {}),
    ("t4_eval_iri_percent_preserved", "Eval",
     "<http://ex/%20a> <http://p> <http://o> .",
     "<http://ex/%20a> <http://p> <http://o> .", {}),
    ("t4_neg_datatype_missing_iri", "NegativeSyntax",
     '@prefix : <http://ex/>. :s :p "x"^^ .', None, {}),
    ("t4_neg_unclosed_collection", "NegativeSyntax",
     "@prefix : <http://ex/>. :s :p ( .", None, {}),
    ("t4_neg_triple_dotted_number", "NegativeSyntax",
     "@prefix : <http://ex/>. :s :p 1.2.3 .", None, {}),
    ("t4_neg_iri_raw_newline", "NegativeSyntax",
     "<http://ex/a\nb> <http://p> <http://o> .", None, {}),
    ("t4_neg_stray_close_brace", "NegativeSyntax",
     "@prefix : <http://ex/>. } :a :b :c .", None, {}),
    ("t4_neg_double_statement_dot", "NegativeSyntax",
     "@prefix : <http://ex/>. :s :p :o ..", None, {}),
    ("t4_neg_forall_dropped_from_grammar", "NegativeSyntax",
     "@prefix : <http://ex/>. @forAll :x . :x :loves :y .", None, {}),
    ("t4_neg_forsome_dropped_from_grammar", "NegativeSyntax",
     "@prefix : <http://ex/>. @forSome :x . :x :knows :y .", None, {}),
    ("t4_neg_keywords_dropped_from_grammar", "NegativeSyntax",
     "@keywords a, is, of . x y z .", None, {}),

    # --- legacy-cwm extension family (opt-in legacy=True) ---------------
    # The reference rejects @forAll/@forSome/@keywords (cases above keep
    # that parity); with legacy=True we reproduce cwm notation3.py
    # semantics, validated against the reference's own cwm goldens
    # (tests/test_golden_examples.py LEGACY_PAIRS).
    ("l5_forall_simple", "Eval",
     "@prefix : <http://ex/>. @forAll :x . :x :p :o .",
     "?x <http://ex/p> <http://ex/o> .", {"legacy": True}),
    ("l5_forsome_simple", "Eval",
     "@prefix : <http://ex/>. @forSome :x . :x :p :o .",
     "_:b0 <http://ex/p> <http://ex/o> .", {"legacy": True}),
    ("l5_forall_multi", "Eval",
     "@prefix : <http://ex/>. @forAll :x, :y . :x :p :y .",
     "?x <http://ex/p> ?y .", {"legacy": True}),
    ("l5_keywords_barewords", "Eval",
     "@prefix : <http://ex/>. @keywords a . dan a Man .",
     "<http://ex/dan> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
     " <http://ex/Man> .", {"legacy": True}),
    ("l5_keywords_empty_all_names", "Eval",
     "@prefix : <http://ex/>. @keywords . x y z .",
     "<http://ex/x> <http://ex/y> <http://ex/z> .", {"legacy": True}),
    ("l5_keywords_at_a_escape", "Eval",
     "@prefix : <http://ex/>. @keywords is . x @a T .",
     "<http://ex/x> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
     " <http://ex/T> .", {"legacy": True}),
    ("l5_forall_in_list", "Eval",
     "@prefix : <http://ex/>. @forAll :x . (:x) :p :o .",
     "_:b0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> ?x .\n"
     "_:b0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest>"
     " <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .\n"
     "_:b0 <http://ex/p> <http://ex/o> .", {"legacy": True}),
    ("l5_forsome_in_formula_scoped", "Eval",
     "@prefix : <http://ex/>. { @forSome :y . :s :p :y } :g :h .",
     "<http://ex/s> <http://ex/p> _:b0 _:_form_0 .\n"
     "_:_form_0 <http://ex/g> <http://ex/h> .", {"legacy": True}),
    ("l5_forall_shadowed_by_inner_forsome", "Eval",
     "@prefix : <http://ex/>. @forAll :x . :x :p { @forSome :x . :x :q :r } .",
     "_:b0 <http://ex/q> <http://ex/r> _:_form_0 .\n"
     "?x <http://ex/p> _:_form_0 .", {"legacy": True}),
    ("l5_keywords_has_as_plain_name", "Eval",
     "@prefix : <http://ex/>. @keywords of . dan has x .",
     "<http://ex/dan> <http://ex/has> <http://ex/x> .", {"legacy": True}),
    ("l5_neg_forall_bad_item", "NegativeSyntax",
     '@prefix : <http://ex/>. @forAll "x" . :a :b :c .', None,
     {"legacy": True}),
    ("l5_neg_forall_unterminated", "NegativeSyntax",
     "@prefix : <http://ex/>. @forAll :x :a :b :c .", None,
     {"legacy": True}),
    ("l5_reason_forall_rule", "Reason",
     "@prefix : <http://ex/>. @forAll :x . :socrates a :Man . "
     "{ :x a :Man } => { :x a :Mortal } .",
     "<http://ex/socrates> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
     " <http://ex/Man> .\n"
     "<http://ex/socrates> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
     " <http://ex/Mortal> .", {"legacy": True, "think": True}),
    ("l5_reason_keywords_rule", "Reason",
     "@prefix : <http://ex/>. @keywords a, is, of . dan a Man . "
     "{ ?W a Man } => { ?W a Mortal } .",
     "<http://ex/dan> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
     " <http://ex/Man> .\n"
     "<http://ex/dan> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
     " <http://ex/Mortal> .", {"legacy": True, "think": True}),
    ("l5_reason_formula_content_unify", "Reason",
     "@prefix : <http://ex/>. @forAll :x . :j :says { :m :f :v } . "
     "{ :j :says { :m :f :x } } => { :x a :Found } .",
     "<http://ex/v> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
     " <http://ex/Found> .", {"legacy": True, "think": True}),
    ("l5_reason_quoted_universal_alpha", "Reason",
     "@prefix : <http://ex/>. :j :says { @forAll :y . :m :f :y } . "
     "{ :j :says { @forAll :z . :m :f :z } } => { :ok a :Success } .",
     "<http://ex/ok> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
     " <http://ex/Success> .", {"legacy": True, "think": True}),
    ("l5_reason_cons_cell_first", "Reason",
     "@prefix : <http://ex/>. "
     "@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> . "
     "( :q ) a :T . { ?X a :T . ?X rdf:first ?B } => { ?B a :First } .",
     "(<http://ex/q>) <http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
     " <http://ex/T> .\n"
     "<http://ex/q> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
     " <http://ex/First> .", {"legacy": True, "think": True}),
    ("l5_forall_retroactive", "Eval",
     # cwm quantifier scope is the whole formula: a directive after the
     # statement still governs it
     "@prefix : <http://ex/>. :x :p :o . @forAll :x .",
     "?x <http://ex/p> <http://ex/o> .", {"legacy": True}),
    ("l5_reason_rest_nil_pattern", "Reason",
     # rdf:nil and the '()' list encoding are the same term, so the
     # natural last-cell pattern matches
     "@prefix : <http://ex/>. "
     "@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> . "
     "( :q ) a :T . { ?X a :T . ?X rdf:rest rdf:nil } => { :end a :End } .",
     "(<http://ex/q>) <http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
     " <http://ex/T> .\n"
     "<http://ex/end> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
     " <http://ex/End> .", {"legacy": True, "think": True}),
    ("l5_reason_universal_fact_instantiation", "Reason",
     # a universally quantified data fact matches any ground pattern
     "@prefix : <http://ex/>. @forAll :x . :a :p :x . "
     "{ :a :p :q } => { :ok a :Yes } .",
     "<http://ex/ok> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
     " <http://ex/Yes> .", {"legacy": True, "think": True}),
    ("l5_reason_alpha_no_concrete_crossbind", "Reason",
     # a pattern var alpha-matched to a quoted universal must not also
     # bind concretely elsewhere in the same formula (unsound otherwise)
     "@prefix : <http://ex/>. "
     ":j :says { @forAll :y . :m :f :y . :m :g :c } . @forAll :x . "
     "{ :j :says { :m :f :x . :m :g :x } } => { :x a :Wrong } .",
     "", {"legacy": True, "think": True}),
    ("l5_reason_cons_cell_rest_walk", "Reason",
     "@prefix : <http://ex/>. "
     "@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> . "
     "( :q :r ) a :T . { ?X a :T . ?X rdf:rest ?Y } => { ?Y a :T } .",
     "(<http://ex/q> <http://ex/r>)"
     " <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://ex/T> .\n"
     "(<http://ex/r>) <http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
     " <http://ex/T> .\n"
     "() <http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
     " <http://ex/T> .", {"legacy": True, "think": True}),
]

# --- bulk shapes at reduced size (the reference's SLOW manifests run
# 1k-10k-triple documents; these generated cases pin the same parser
# shapes — statement bulk, wide predicateObjectLists, long collections,
# deep formula nesting — at a size CI affords) ------------------------
CASES += [
    ("bulk_500_statements", "Eval",
     "@prefix : <http://ex/>. " +
     " ".join(f":s{i} :p :o{i} ." for i in range(500)),
     "\n".join(f"<http://ex/s{i}> <http://ex/p> <http://ex/o{i}> ."
               for i in range(500)), {}),
    ("bulk_wide_pol_100", "Eval",
     "@prefix : <http://ex/>. :s " +
     " ; ".join(f":p{i} :o{i}" for i in range(100)) + " .",
     "\n".join(f"<http://ex/s> <http://ex/p{i}> <http://ex/o{i}> ."
               for i in range(100)), {}),
    ("bulk_object_list_100", "Eval",
     "@prefix : <http://ex/>. :s :p " +
     " , ".join(f":o{i}" for i in range(100)) + " .",
     "\n".join(f"<http://ex/s> <http://ex/p> <http://ex/o{i}> ."
               for i in range(100)), {}),
    ("bulk_collection_200", "PositiveSyntax",
     "@prefix : <http://ex/>. :s :p (" +
     " ".join(str(i) for i in range(200)) + ") .", None, {}),
    ("bulk_formula_nesting_30", "PositiveSyntax",
     "@prefix : <http://ex/>. " + "{" * 30 + " :a :b :c . " + "}" * 30 +
     " :d :e .", None, {}),
    ("bulk_prefix_redefinitions_100", "Eval",
     " ".join(f"@prefix : <http://ex{i}/>. :a{i} :p :o ."
              for i in range(100)),
     "\n".join(f"<http://ex{i}/a{i}> <http://ex{i}/p> <http://ex{i}/o> ."
               for i in range(100)), {}),
    ("bulk_bnode_chain_100", "PositiveSyntax",
     "@prefix : <http://ex/>. :s :p " + "[ :n " * 100 + ":end" +
     " ]" * 100 + " .", None, {}),
    ("bulk_long_string_16k", "Eval",
     '@prefix : <http://ex/>. :s :p """' + "x" * 16384 + '""" .',
     '<http://ex/s> <http://ex/p> "' + "x" * 16384 + '" .', {}),
]


# --- r4c: builtin-registry conformance tail ---------------------------
# Rule-context Reason cases for the 23 registered builtins that had
# only registry-sweep unit coverage (math trig/hyperbolic family,
# remaining negated comparators, time accessors, sha384/512).  Expected
# values are mathematically pinned (exact trig identities at 0/1, NIST
# FIPS 180-2 "abc" digests, epoch arithmetic), not engine echoes;
# gmTime/localTime are excluded as non-deterministic by definition.
_PRE = ("@prefix : <http://ex/>. "
        "@prefix math: <http://www.w3.org/2000/10/swap/math#>. "
        "@prefix time: <http://www.w3.org/2000/10/swap/time#>. "
        "@prefix string: <http://www.w3.org/2000/10/swap/string#>. "
        "@prefix crypto: <http://www.w3.org/2000/10/swap/crypto#>. ")
_D = '"{}"^^<http://www.w3.org/2001/XMLSchema#double>'
_DT = '"2024-03-09T05:06:07Z"^^<http://www.w3.org/2001/XMLSchema#dateTime>'
_VAL = "<http://ex/r> <http://ex/val> {} ."
_OK = ('<http://ex/r> <http://ex/ok> '
       '"true"^^<http://www.w3.org/2001/XMLSchema#boolean> .')
_RC = {"think": True, "conclusions": True}

CASES += [
    # exact trig/hyperbolic identities: f(0) / f(1) with closed-form 0, 1
    *[(f"r4c_reason_math_{fn}_{arg}", "Reason",
       _PRE + "{ %s math:%s ?v } => { :r :val ?v } ." % (arg, fn),
       _VAL.format(_D.format(out)), dict(_RC))
      for fn, arg, out in [
          ("sin", 0, "0.0E0"), ("cos", 0, "1.0E0"), ("tan", 0, "0.0E0"),
          ("asin", 0, "0.0E0"), ("acos", 1, "0.0E0"),
          ("atan", 0, "0.0E0"),
          ("sinh", 0, "0.0E0"), ("cosh", 0, "1.0E0"),
          ("tanh", 0, "0.0E0"),
          ("asinh", 0, "0.0E0"), ("acosh", 1, "0.0E0"),
          ("atanh", 0, "0.0E0")]],
    # negated comparators: both the firing and the non-firing side
    ("r4c_reason_math_not_greater_fires", "Reason",
     _PRE + "{ 2 math:notGreaterThan 2 } => { :r :ok true } .",
     _OK, dict(_RC)),
    ("r4c_reason_math_not_greater_blocks", "Reason",
     _PRE + "{ 3 math:notGreaterThan 2 } => { :r :ok true } .",
     "", dict(_RC)),
    ("r4c_reason_string_not_greater", "Reason",
     _PRE + '{ "abc" string:notGreaterThan "abd" } => { :r :ok true } .',
     _OK, dict(_RC)),
    ("r4c_reason_string_eq_ignoring_case", "Reason",
     _PRE + '{ "AbC" string:equalIgnoringCase "aBc" } => { :r :ok true } .',
     _OK, dict(_RC)),
    ("r4c_reason_string_eq_ignoring_case_blocks", "Reason",
     _PRE + '{ "AbC" string:equalIgnoringCase "abd" } => { :r :ok true } .',
     "", dict(_RC)),
    ("r4c_reason_string_neq_ignoring_case", "Reason",
     _PRE + '{ "AbC" string:notEqualIgnoringCase "xyz" } => '
            "{ :r :ok true } .",
     _OK, dict(_RC)),
    # time accessors over a fixed UTC instant (hour/minute pinned by the
    # lexical form; inSeconds = exact epoch arithmetic: 1970-01-02 = 86400)
    ("r4c_reason_time_hour", "Reason",
     _PRE + "{ %s time:hour ?v } => { :r :val ?v } ." % _DT,
     _VAL.format('"5"^^<http://www.w3.org/2001/XMLSchema#integer>'),
     dict(_RC)),
    ("r4c_reason_time_minute", "Reason",
     _PRE + "{ %s time:minute ?v } => { :r :val ?v } ." % _DT,
     _VAL.format('"6"^^<http://www.w3.org/2001/XMLSchema#integer>'),
     dict(_RC)),
    ("r4c_reason_time_in_seconds_epoch_day", "Reason",
     _PRE + '{ "1970-01-02T00:00:00Z"'
            '^^<http://www.w3.org/2001/XMLSchema#dateTime>'
            " time:inSeconds ?v } => { :r :val ?v } .",
     _VAL.format('"86400"^^<http://www.w3.org/2001/XMLSchema#integer>'),
     dict(_RC)),
    ("r4c_reason_time_timezone_offset", "Reason",
     _PRE + '{ "2024-03-09T05:06:07-05:00"'
            '^^<http://www.w3.org/2001/XMLSchema#dateTime>'
            " time:timeZone ?v } => { :r :val ?v } .",
     _VAL.format('"-05:00"'), dict(_RC)),
    ("r4c_reason_time_timezone_z", "Reason",
     _PRE + "{ %s time:timeZone ?v } => { :r :val ?v } ." % _DT,
     _VAL.format('"Z"'), dict(_RC)),
    # FIPS 180-2 "abc" test vectors
    ("r4c_reason_crypto_sha384", "Reason",
     _PRE + '{ "abc" crypto:sha384 ?h } => { :r :val ?h } .',
     _VAL.format('"cb00753f45a35e8bb5a03d699ac65007272c32ab0eded163'
                 '1a8b605a43ff5bed8086072ba1e7cc2358baeca134c825a7"'),
     dict(_RC)),
    ("r4c_reason_crypto_sha512", "Reason",
     _PRE + '{ "abc" crypto:sha512 ?h } => { :r :val ?h } .',
     _VAL.format('"ddaf35a193617abacc417349ae20413112e6fa4e89a97ea2'
                 '0a9eeee64b55d39a2192992a274fc1a836ba3c23a3feebbd'
                 '454d4423643ce80e2a9ac94fa54ca49f"'), dict(_RC)),
    # combining case: trig inside a guard chain feeding arithmetic
    ("r4c_reason_trig_guard_chain", "Reason",
     _PRE + "{ 0 math:cos ?c . ?c math:greaterThan 0 . "
            "(?c 2) math:sum ?v } => { :r :val ?v } .",
     _VAL.format(_D.format("3.0E0")), dict(_RC)),
]


# --- r4d: cross-feature Reason combinations ---------------------------
# Interactions of individually-proven primitives, each probed against
# the engine and pinned with unambiguous expected output: backward rule
# feeding a forward guard, rule-emitted list consumed by list:member,
# scrape -> coerced arithmetic (reference signature str/scrape.rb:5:
# subject is the (string pattern) list), digest prefix guard, dayOfWeek
# branch, nested-formula variable scoping, string-literal coercion in
# math:sum.
_PRE4D = ("@prefix : <http://ex/>. "
          "@prefix math: <http://www.w3.org/2000/10/swap/math#>. "
          "@prefix list: <http://www.w3.org/2000/10/swap/list#>. "
          "@prefix string: <http://www.w3.org/2000/10/swap/string#>. "
          "@prefix time: <http://www.w3.org/2000/10/swap/time#>. "
          "@prefix crypto: <http://www.w3.org/2000/10/swap/crypto#>. ")
_B = '"true"^^<http://www.w3.org/2001/XMLSchema#boolean>'
_I = '^^<http://www.w3.org/2001/XMLSchema#integer>'

CASES += [
    ("r4d_reason_backward_feeds_forward", "Reason",
     _PRE4D + ":a :n 4 . { ?x :big true } <= { ?x :n ?v . "
              "?v math:greaterThan 3 } . "
              "{ ?x :big true } => { ?x :verdict :yes } .",
     f"<http://ex/a> <http://ex/big> {_B} .\n"
     "<http://ex/a> <http://ex/verdict> <http://ex/yes> .",
     {"think": True, "conclusions": True}),
    ("r4d_reason_rule_emits_list_member_consumes", "Reason",
     _PRE4D + ":seed :is 1 . { ?x :is 1 } => { ?x :lst ( 1 2 3 ) } . "
              "{ ?x :lst ?l . ?l list:member 2 } => { ?x :has2 true } .",
     '<http://ex/seed> <http://ex/lst> ("1"' + _I + ' "2"' + _I
     + ' "3"' + _I + ') .\n'
     f"<http://ex/seed> <http://ex/has2> {_B} .",
     {"think": True, "conclusions": True}),
    ("r4d_reason_scrape_then_sum", "Reason",
     _PRE4D + ':d :code "id-42" . { ?x :code ?c . '
              '(?c "id-([0-9]+)") string:scrape ?n . '
              "(?n 1) math:sum ?m } => { ?x :next ?m } .",
     '<http://ex/d> <http://ex/next> "43"' + _I + " .",
     {"think": True, "conclusions": True}),
    ("r4d_reason_string_coercion_in_sum", "Reason",
     _PRE4D + '{ ("42" 1) math:sum ?m } => { :r :val ?m } .',
     '<http://ex/r> <http://ex/val> "43"' + _I + " .",
     {"think": True, "conclusions": True}),
    ("r4d_reason_digest_prefix_guard", "Reason",
     _PRE4D + '{ "abc" crypto:sha1 ?h . ?h string:startsWith "a9" } '
              "=> { :r :ok true } .",
     f"<http://ex/r> <http://ex/ok> {_B} .",
     {"think": True, "conclusions": True}),
    ("r4d_reason_dayofweek_branch", "Reason",
     _PRE4D + ':e :when "2024-03-09T05:06:07Z"'
              '^^<http://www.w3.org/2001/XMLSchema#dateTime> . '
              "{ ?x :when ?t . ?t time:dayOfWeek 6 } => "
              "{ ?x :saturday true } .",
     f"<http://ex/e> <http://ex/saturday> {_B} .",
     {"think": True, "conclusions": True}),
    ("r4d_reason_nested_formula_scoping", "Reason",
     _PRE4D + ":m :says { :sky :is :blue } . "
              "{ ?w :says { ?a :is ?b } } => { ?w :claims ?b } .",
     "<http://ex/m> <http://ex/claims> <http://ex/blue> .",
     {"think": True, "conclusions": True}),
]


# --- r4e: syntax-corner batch (parser-probed) --------------------------
# 18 malformed shapes the grammar must reject (terminator/bracket
# discipline, literal suffix rules, directive arity) plus two
# intuition-traps that ARE legal N3 and must stay accepted: a literal
# in predicate position (predicate := expression in the CG grammar)
# and an empty ';' repetition (Turtle-style predicateObjectList).
_P4E = "@prefix : <http://ex/>. "
CASES += [
    ("r4e_neg_double_comma", "NegativeSyntax",
     _P4E + ":a :b :c ,, :d .", None, {}),
    ("r4e_neg_dot_in_collection", "NegativeSyntax",
     _P4E + ":a :b (1 2 . 3) .", None, {}),
    ("r4e_neg_missing_datatype", "NegativeSyntax",
     _P4E + ':a :b "x"^^ .', None, {}),
    ("r4e_neg_double_dot_number", "NegativeSyntax",
     _P4E + ":a :b 1.2.3 .", None, {}),
    ("r4e_neg_unclosed_formula", "NegativeSyntax",
     _P4E + "{ :a :b :c .", None, {}),
    ("r4e_neg_unclosed_collection", "NegativeSyntax",
     _P4E + ":a :b (1 2 .", None, {}),
    ("r4e_neg_unclosed_bnode", "NegativeSyntax",
     _P4E + ":a :b [ :c :d .", None, {}),
    ("r4e_neg_empty_langtag", "NegativeSyntax",
     _P4E + ':a :b "x"@ .', None, {}),
    ("r4e_neg_bare_semicolon_start", "NegativeSyntax",
     _P4E + ":a ; :b :c .", None, {}),
    ("r4e_neg_implies_missing_rhs", "NegativeSyntax",
     _P4E + "{ :a :b :c } => .", None, {}),
    ("r4e_neg_double_caret_chain", "NegativeSyntax",
     _P4E + ':a :b "x"^^<http://t/>^^<http://u/> .', None, {}),
    ("r4e_neg_stray_close_brace", "NegativeSyntax",
     _P4E + ":a :b :c . } ", None, {}),
    ("r4e_neg_stray_close_paren", "NegativeSyntax",
     _P4E + ":a :b :c . ) ", None, {}),
    ("r4e_neg_stray_close_bracket", "NegativeSyntax",
     _P4E + ":a :b :c . ] ", None, {}),
    ("r4e_neg_predicate_missing_object", "NegativeSyntax",
     _P4E + ":a :b .", None, {}),
    ("r4e_neg_literal_datatype_and_lang", "NegativeSyntax",
     _P4E + ':a :b "x"^^<http://t/>@en .', None, {}),
    ("r4e_neg_at_base_no_iri", "NegativeSyntax", "@base .", None, {}),
    ("r4e_neg_prefix_no_colon", "NegativeSyntax",
     "@prefix p <http://ex/> .", None, {}),
    ("r4e_pos_literal_predicate", "PositiveSyntax",
     _P4E + ":a 5 :c .", None, {}),
    ("r4e_pos_empty_semicolon_repeat", "PositiveSyntax",
     _P4E + ":a :b :c ;; .", None, {}),
]


# --- r4f: the complete RFC 3986 §5.4 reference-resolution table -------
# One Eval case per example (normal §5.4.1 + abnormal §5.4.2), base
# <http://a/b/c/d;p?q>, expected subjects straight from the RFC — the
# authoritative public fixture for @base/relative-IRI behavior.
_RFC3986_BASE = "http://a/b/c/d;p?q"
_RFC3986_TABLE = [
    ("g:h", "g:h"), ("g", "http://a/b/c/g"), ("./g", "http://a/b/c/g"),
    ("g/", "http://a/b/c/g/"), ("/g", "http://a/g"), ("//g", "http://g"),
    ("?y", "http://a/b/c/d;p?y"), ("g?y", "http://a/b/c/g?y"),
    ("#s", "http://a/b/c/d;p?q#s"), ("g#s", "http://a/b/c/g#s"),
    ("g?y#s", "http://a/b/c/g?y#s"), (";x", "http://a/b/c/;x"),
    ("g;x", "http://a/b/c/g;x"), ("g;x?y#s", "http://a/b/c/g;x?y#s"),
    ("", "http://a/b/c/d;p?q"), (".", "http://a/b/c/"),
    ("./", "http://a/b/c/"), ("..", "http://a/b/"),
    ("../", "http://a/b/"), ("../g", "http://a/b/g"),
    ("../..", "http://a/"), ("../../", "http://a/"),
    ("../../g", "http://a/g"),
    ("../../../g", "http://a/g"), ("../../../../g", "http://a/g"),
    ("/./g", "http://a/g"), ("/../g", "http://a/g"),
    ("g.", "http://a/b/c/g."), (".g", "http://a/b/c/.g"),
    ("g..", "http://a/b/c/g.."), ("..g", "http://a/b/c/..g"),
    ("./../g", "http://a/b/g"), ("./g/.", "http://a/b/c/g/"),
    ("g/./h", "http://a/b/c/g/h"), ("g/../h", "http://a/b/c/h"),
    ("g;x=1/./y", "http://a/b/c/g;x=1/y"),
    ("g;x=1/../y", "http://a/b/c/y"),
    ("g?y/./x", "http://a/b/c/g?y/./x"),
    ("g?y/../x", "http://a/b/c/g?y/../x"),
    ("g#s/./x", "http://a/b/c/g#s/./x"),
    ("g#s/../x", "http://a/b/c/g#s/../x"),
]
CASES += [
    (f"r4f_rfc3986_{i:02d}", "Eval",
     f"@base <{_RFC3986_BASE}>. <{ref}> <http://p/> <http://o/> .",
     f"<{exp}> <http://p/> <http://o/> .", {})
    for i, (ref, exp) in enumerate(_RFC3986_TABLE)
]


# --- r4g: numeric literal lexical-quirk family ------------------------
# Pins the reference's exact lexical handling (reader.rb:466-507):
# bare leading-dot decimals get "0" prefixed but SIGNED leading-dot
# forms keep their lexical form verbatim; ".E" doubles get ".0E"; all
# other numeric lexical forms (signs, leading zeros, exponent case)
# pass through untouched.
_XI = '^^<http://www.w3.org/2001/XMLSchema#integer>'
_XD = '^^<http://www.w3.org/2001/XMLSchema#decimal>'
_XF = '^^<http://www.w3.org/2001/XMLSchema#double>'
_NUM_FORMS = [
    ("0", '"0"' + _XI), ("-0", '"-0"' + _XI), ("+7", '"+7"' + _XI),
    ("007", '"007"' + _XI),
    ("1.5", '"1.5"' + _XD), ("-2.50", '"-2.50"' + _XD),
    (".5", '"0.5"' + _XD), ("+.5", '"+.5"' + _XD),
    ("-.25", '"-.25"' + _XD),
    ("1e0", '"1e0"' + _XF), ("1E+2", '"1E+2"' + _XF),
    ("-3.14e-2", '"-3.14e-2"' + _XF), ("+1.0E5", '"+1.0E5"' + _XF),
    ("1.e2", '"1.0e2"' + _XF), (".5e1", '".5e1"' + _XF),
    ("-1.E3", '"-1.0E3"' + _XF),
]
CASES += [
    (f"r4g_numlex_{i:02d}", "Eval",
     f"@prefix : <http://ex/>. :s :p {src} .",
     f"<http://ex/s> <http://ex/p> {exp} .", {})
    for i, (src, exp) in enumerate(_NUM_FORMS)
]


# --- r4h: string escape / quote-style family --------------------------
# Engine-probed: control escapes stay escaped in the N-Triples lexical
# encoding, \U unescapes to the raw codepoint, single/long quote styles
# normalize to the double-quoted encoding with inner quotes escaped.
_P4H = "@prefix : <http://ex/>. "
_SP = "<http://ex/s> <http://ex/p> "
CASES += [
    ("r4h_escape_tab", "Eval",
     _P4H + r':s :p "tab\there" .', _SP + r'"tab\there" .', {}),
    ("r4h_escape_newline", "Eval",
     _P4H + r':s :p "nl\nnl" .', _SP + r'"nl\nnl" .', {}),
    ("r4h_escape_cr", "Eval",
     _P4H + r':s :p "cr\rcr" .', _SP + r'"cr\rcr" .', {}),
    ("r4h_escape_quote", "Eval",
     _P4H + r':s :p "q\"q" .', _SP + r'"q\"q" .', {}),
    ("r4h_escape_backslash", "Eval",
     _P4H + r':s :p "bs\\bs" .', _SP + r'"bs\\bs" .', {}),
    ("r4h_uchar_bmp", "Eval",
     _P4H + r':s :p "uAend" .', _SP + '"uAend" .', {}),
    ("r4h_uchar_astral", "Eval",
     _P4H + r':s :p "U\U0001F600end" .', _SP + '"U\U0001F600end" .', {}),
    ("r4h_single_quote_style", "Eval",
     _P4H + ":s :p 'single' .", _SP + '"single" .', {}),
    ("r4h_long_single_inner_quote", "Eval",
     _P4H + ":s :p '''long ' quote''' .", _SP + '"long \' quote" .', {}),
    ("r4h_long_double_inner_quotes", "Eval",
     _P4H + ':s :p """long "" inner""" .', _SP + r'"long \"\" inner" .',
     {}),
    ("r4h_raw_unicode_passthrough", "Eval",
     _P4H + ':s :p "é" .', _SP + '"é" .', {}),
    ("r4h_single_quote_escape", "Eval",
     _P4H + r":s :p 'esc\t' .", _SP + r'"esc\t" .', {}),
]


# --- r4i: list-builtin edge family (engine-probed) --------------------
_P4I = ("@prefix : <http://ex/>. "
        "@prefix list: <http://www.w3.org/2000/10/swap/list#>. "
        "@prefix log: <http://www.w3.org/2000/10/swap/log#>. ")
_RC4 = {"think": True, "conclusions": True}
_L123 = ('("1"' + _I + ' "2"' + _I + ' "3"' + _I + ')')
CASES += [
    ("r4i_list_append_with_empty", "Reason",
     _P4I + "{ (() (1 2)) list:append ?x } => { :r :val ?x } .",
     '<http://ex/r> <http://ex/val> ("1"' + _I + ' "2"' + _I + ") .",
     dict(_RC4)),
    ("r4i_list_append_three_operands", "Reason",
     _P4I + "{ ((1) (2) (3)) list:append ?x } => { :r :val ?x } .",
     "<http://ex/r> <http://ex/val> " + _L123 + " .", dict(_RC4)),
    ("r4i_list_length_empty", "Reason",
     _P4I + "{ () list:length ?n } => { :r :val ?n } .",
     '<http://ex/r> <http://ex/val> "0"' + _I + " .", dict(_RC4)),
    ("r4i_list_iterate_binds_index_and_member", "Reason",
     _P4I + "{ (:a :b) list:iterate (?i ?m) } => { :r ?m ?i } .",
     '<http://ex/r> <http://ex/a> "0"' + _I + " .\n"
     '<http://ex/r> <http://ex/b> "1"' + _I + " .", dict(_RC4)),
    ("r4i_list_first_last_singleton", "Reason",
     _P4I + "{ (:only) list:first ?f . (:only) list:last ?l } => "
            "{ :r :fl (?f ?l) } .",
     "<http://ex/r> <http://ex/fl> (<http://ex/only> <http://ex/only>) .",
     dict(_RC4)),
    ("r4i_list_in_enumerates_then_filters", "Reason",
     _P4I + "{ ?x list:in (1 2 3) . ?x log:equalTo 2 } => "
            "{ :r :found ?x } .",
     '<http://ex/r> <http://ex/found> "2"' + _I + " .", dict(_RC4)),
    ("r4i_list_member_via_bound_var", "Reason",
     _P4I + ":d :lst (5 6) . { ?d :lst ?l . ?l list:member ?m } => "
            "{ ?d :has ?m } .",
     '<http://ex/d> <http://ex/has> "5"' + _I + " .\n"
     '<http://ex/d> <http://ex/has> "6"' + _I + " .", dict(_RC4)),
]

# --- r4j: cwm math-test composites (reasoner_spec.rb:867-990) ----------
# The reference's hardest arithmetic cases: `is ... of` inversion with
# nested `!math:` path antecedents, mixed string/number coercion in
# combinatorial rules, and the difference/sum/equalTo identity square.
_P4J = ("@prefix : <http://ex/>. "
        f"@prefix math: <{MATHNS}>. "
        f"@prefix string: <{STRNS}>. "
        f"@prefix list: <{LISTNS}>.\n")
_RC4J = {"think": False, "conclusions": True}
_D = '^^<http://www.w3.org/2001/XMLSchema#decimal>'

CASES += [
    ("r4j_math_nested_rule", "Reason",
     _P4J + '{ ?x is math:sum of (3 (8 3)!math:difference ) } '
            '=> { ?x :valueOf "3 + (8 - 3)" } .',
     '"8"' + _I + ' <http://ex/valueOf> "3 + (8 - 3)" .', dict(_RC4J)),
    ("r4j_math_big_test", "Reason",
     _P4J + '{ ( ("7" "2")!math:quotient '
            '(("7" "2")!math:remainder "10000000")!math:exponentiation '
            '("a" "b" "c" "d" "e")!list:length ) math:sum ?x } '
            '=> { ?x :valueOf "res" } .',
     '"9.5"' + _D + ' <http://ex/valueOf> "res" .', dict(_RC4J)),
    ("r4j_math_combinatorial_concat", "Reason",
     _P4J + '"3.14" a :testValue. 2 a :testValue. '
            '{ ?x a :testValue. ?y a :testValue. (?x ?y) math:sum ?z. '
            '(?x " + " ?y " = " ?z ) string:concatenation ?s } '
            '=> { ?s a :RESULT }.',
     '"2 + 2 = 4" <' + RDFNS + 'type> <http://ex/RESULT> .\n'
     '"2 + 3.14 = 5.14" <' + RDFNS + 'type> <http://ex/RESULT> .\n'
     '"3.14 + 2 = 5.14" <' + RDFNS + 'type> <http://ex/RESULT> .\n'
     '"3.14 + 3.14 = 6.28" <' + RDFNS + 'type> <http://ex/RESULT> .',
     dict(_RC4J)),
]

_4J_VALS = ['"3.14"', '"2"' + _I, '"0"' + _I]
CASES += [
    ("r4j_math_combinatorial_works_with", "Reason",
     _P4J + '"3.14" a :testValue. 2 a :testValue. 0 a :testValue. '
            '{ ?x a :testValue. ?y a :testValue. '
            '?z is math:sum of (?x (?y ?x)!math:difference). '
            '?z math:equalTo ?y } => {?x :worksWith ?y}.',
     "\n".join(f'{v} <{RDFNS}type> <http://ex/testValue> .'
               for v in _4J_VALS) + "\n" +
     "\n".join(f'{x} <http://ex/worksWith> {y} .'
               for x in _4J_VALS for y in _4J_VALS),
     {"think": False, "data": True}),
]

# --- r4k: trig-range + kill-on-stall semantics (reasoner_spec.rb
# :825-866 trig; formula.rb:180-184 "unless last_op" -> NO solutions).
# These pinned two real engine bugs: (1) an unprovable builtin
# (math:sum on a non-list subject) passed through as vacuously true;
# (2) builtin double results were rounded to 6 significant digits
# (tan(pi/4) -> "1.0E0"), flipping downstream comparisons.
_P4K = ("@prefix : <http://ex/>. "
        f"@prefix math: <{MATHNS}>. "
        f"@prefix string: <{STRNS}>.\n")
_RC4K = {"think": False, "conclusions": True}

CASES += [
    ("r4k_trig_tan_pi4_range", "Reason",
     _P4K + "{ 0.7853981633974483 math:tan _:x . "
            "_:x math:lessThan 1.0e0 . _:x math:greaterThan 0.9e0 } "
            "=> { :tan a :SUCCESS } .",
     f"<{X}tan> <{RDFNS}type> <{X}SUCCESS> .", dict(_RC4K)),
    ("r4k_trig_cos_pi3_range", "Reason",
     _P4K + "{ 1.0471975511965976 math:cos _:x . "
            "_:x math:lessThan 0.51e0 . _:x math:greaterThan 0.49e0 } "
            "=> { :cos a :SUCCESS } .",
     f"<{X}cos> <{RDFNS}type> <{X}SUCCESS> .", dict(_RC4K)),
    ("r4k_trig_cos_pi_exact", "Reason",
     _P4K + "{ 3.14159265358979323846 math:cos ?x } => { :r :cos ?x } .",
     f'<{X}r> <{X}cos> "-1.0E0"'
     '^^<http://www.w3.org/2001/XMLSchema#double> .', dict(_RC4K)),
    ("r4k_tan_result_full_precision", "Reason",
     _P4K + "{ 0.7853981633974483 math:tan ?x } => { :r :t ?x } .",
     f'<{X}r> <{X}t> "9.999999999999999E-1"'
     '^^<http://www.w3.org/2001/XMLSchema#double> .', dict(_RC4K)),
    ("r4k_unprovable_sum_falsifies", "Reason",
     _P4K + "{ 2 math:sum 4 } => { :b a :F } .",
     "", dict(_RC4K)),
    ("r4k_unprovable_sum_falsifies_even_if_equal", "Reason",
     _P4K + "{ 2 math:sum 2 } => { :a a :F } .",
     "", dict(_RC4K)),
    # string builtins take [is :p of :s] bnode arguments
    # (reasoner_spec.rb:1083-1104)
    ("r4k_startswith_ext_subject", "Reason",
     _P4K + ':abc :value "abc" . '
            '{[ is :value of :abc] string:startsWith "a"} '
            "=> {:test a :Success}.",
     f"<{X}test> <{RDFNS}type> <{X}Success> .", dict(_RC4K)),
    ("r4k_startswith_ext_object", "Reason",
     _P4K + ':a :value "a" . '
            '{"abc" string:startsWith [is :value of :a]} '
            "=> {:test a :Success}.",
     f"<{X}test> <{RDFNS}type> <{X}Success> .", dict(_RC4K)),
]

# --- r4l: log:conclusion nested-closure cases (reasoner_spec.rb:20-83)
CASES += [
    ("r4l_log_conclusion_super_simple", "Reason",
     "@prefix : <http://ex/>. "
     f"@prefix log: <{LOG}>.\n"
     "{ { {:a :b :c} => {:test a :SUCCESS} . :a :b :c. } "
     "log:conclusion ?y } => { ?y a :TestResult }.",
     f"<{X}a> <{X}b> <{X}c> _:f2 .\n"
     f"<{X}test> <{RDFNS}type> <{X}SUCCESS> _:f3 .\n"
     f"_:f2 <{LOG}implies> _:f3 _:cf .\n"
     f"<{X}a> <{X}b> <{X}c> _:cf .\n"
     f"<{X}test> <{RDFNS}type> <{X}SUCCESS> _:cf .\n"
     f"_:cf <{RDFNS}type> <{X}TestResult> .",
     {"think": True, "conclusions": True}),
]

# --- r4m: string:concatenation xs:string casts (reasoner_spec.rb
# :991-1074; concatenation.rb:21 Expression.cast) — list members
# stringify by VALUE, not raw lexical: (1 01) -> "11", 0.0 -> "0",
# 1.23E3 -> "1230", "0"^^xsd:boolean -> "false".
_P4M = ("@prefix : <http://ex/>. "
        f"@prefix string: <{STRNS}>. "
        f"@prefix xsd: <{XSD}>.\n")
_RC4M = {"think": False, "conclusions": True}
CASES += [
    ("r4m_concat_integer_canonical", "Reason",
     _P4M + "{(1 01) string:concatenation ?x} => {:test :is ?x}.",
     f'<{X}test> <{X}is> "11" .', dict(_RC4M)),
    ("r4m_concat_decimal_values", "Reason",
     _P4M + "{(0.0 1.0 2.5 -2.5) string:concatenation ?x} "
            "=> {:test :is ?x}.",
     f'<{X}test> <{X}is> "012.5-2.5" .', dict(_RC4M)),
    ("r4m_concat_boolean_normalized", "Reason",
     _P4M + '{(true false "0"^^xsd:boolean) string:concatenation ?x} '
            "=> {:test :is ?x}.",
     f'<{X}test> <{X}is> "truefalsefalse" .', dict(_RC4M)),
    ("r4m_concat_float_values", "Reason",
     _P4M + '{("0E1"^^xsd:float "1E0"^^xsd:float "1.25"^^xsd:float '
            '"-7.875"^^xsd:float) string:concatenation ?x} '
            "=> {:test :is ?x}.",
     f'<{X}test> <{X}is> "011.25-7.875" .', dict(_RC4M)),
    ("r4m_concat_double_integral", "Reason",
     _P4M + "{(0E1 1E0 1.23E3) string:concatenation ?x} "
            "=> {:test :is ?x}.",
     f'<{X}test> <{X}is> "011230" .', dict(_RC4M)),
    ("r4m_concat_empty_list_is_empty_string", "Reason",
     _P4M + f"@prefix log: <{LOG}>. "
            '{ "" log:equalTo [ is string:concatenation of () ] } '
            "=> {:t13 a :success}.",
     f"<{X}t13> <{RDFNS}type> <{X}success> .", dict(_RC4M)),
]

# --- r4n: chained list:member path (reasoner_spec.rb:495-503
# "Pythag 3 5": a path-expression member hop feeding a second member)
CASES += [
    ("r4n_member_member_path", "Reason",
     "@prefix : <http://ex/>. "
     f"@prefix list: <{LISTNS}>.\n"
     "{ ((3) (5))!list:member list:member ?z } => { ?z a :Pythagorean }.",
     '"3"' + _I + f" <{RDFNS}type> <{X}Pythagorean> .\n"
     '"5"' + _I + f" <{RDFNS}type> <{X}Pythagorean> .",
     {"think": True, "conclusions": True}),
]


# --- r4o: bulk/SLOW-shape expansion (suite_helper.rb:124-177 tags
# 1k-10k-triple documents SLOW; these pin MORE of those shapes at a
# size CI affords: deep list nesting, bulk formulae, datatype/langtag
# literal storms, long property paths, comment/whitespace floods, a
# transitive-closure Reason case over a 60-edge chain) ----------------
CASES += [
    ("bulk_deep_list_nesting_40", "PositiveSyntax",
     "@prefix : <http://ex/>. :s :p " + "(" * 40 + ":x" + ")" * 40
     + " .", None, {}),
    ("bulk_formula_300_statements", "PositiveSyntax",
     "@prefix : <http://ex/>. { "
     + " ".join(f":s{i} :p :o{i} ." for i in range(300))
     + " } :says :much .", None, {}),
    ("bulk_datatyped_literals_300", "Eval",
     "@prefix : <http://ex/>. @prefix x: <http://www.w3.org/2001/XMLSchema#>. "
     + " ".join(f':s{i} :p "v{i}"^^x:token .' for i in range(300)),
     "\n".join(f'<http://ex/s{i}> <http://ex/p> '
               f'"v{i}"^^<http://www.w3.org/2001/XMLSchema#token> .'
               for i in range(300)), {}),
    ("bulk_langtag_literals_300", "Eval",
     "@prefix : <http://ex/>. "
     + " ".join(f':s{i} :p "v{i}"@en-GB .' for i in range(300)),
     "\n".join(f'<http://ex/s{i}> <http://ex/p> "v{i}"@en-gb .'
               for i in range(300)), {}),
    ("bulk_path_chain_40", "PositiveSyntax",
     "@prefix : <http://ex/>. :a" + "!:p" * 40 + " :q :o .", None, {}),
    ("bulk_comment_flood_5k", "Eval",
     "\n".join("# filler comment line %d" % i for i in range(5000))
     + "\n@prefix : <http://ex/>. :a :b :c .",
     "<http://ex/a> <http://ex/b> <http://ex/c> .", {}),
    ("bulk_whitespace_flood", "Eval",
     "@prefix : <http://ex/>." + "\n" * 4000 + ":a\t\t:b\n\n:c\t.",
     "<http://ex/a> <http://ex/b> <http://ex/c> .", {}),
    ("bulk_mixed_quotes_200", "PositiveSyntax",
     "@prefix : <http://ex/>. "
     + " ".join(f':s{i} :p "d{i}" , \'s{i}\' , """t{i}""" .'
                for i in range(200)), None, {}),
    ("bulk_numeric_storm_300", "Eval",
     "@prefix : <http://ex/>. "
     + " ".join(f":s{i} :p {i} , {i}.5 , {i}.0e1 ." for i in range(100)),
     "\n".join(
         f'<http://ex/s{i}> <http://ex/p> "{i}"^^<http://www.w3.org/2001/XMLSchema#integer> .\n'
         f'<http://ex/s{i}> <http://ex/p> "{i}.5"^^<http://www.w3.org/2001/XMLSchema#decimal> .\n'
         f'<http://ex/s{i}> <http://ex/p> "{i}.0e1"^^<http://www.w3.org/2001/XMLSchema#double> .'
         for i in range(100)), {}),
    ("bulk_reason_chain_60", "Reason",
     "@prefix : <http://ex/>. "
     + " ".join(f":n{i} :r :n{i+1} ." for i in range(60))
     + " { ?x :r ?y . ?y :r ?z } => { ?x :r ?z } .",
     # transitive closure of a 61-node chain: every i<j pair
     "\n".join(f"<http://ex/n{i}> <http://ex/r> <http://ex/n{j}> ."
               for i in range(60) for j in range(i + 1, 61)),
     {"think": True, "data": True}),
]
