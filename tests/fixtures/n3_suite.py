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
    ("eval_has", "Eval",
     "@prefix : <http://ex/>. :a has :p :b .",
     f"<{X}a> <{X}p> <{X}b> .", {}),
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
