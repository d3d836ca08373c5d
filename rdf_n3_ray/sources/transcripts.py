"""Deterministic synthetic conversation-transcript table (FIXTURES.md §1).

Input shape per BASELINE.json input_hint:
    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp[us]

Per-turn `text` is an N3 document sampled from the parser feature matrix
(~5% deliberately malformed, ~10% plain prose with entity mentions).
Everything is a pure function of (seed, conv_id, turn_idx): the table can
be generated distributed (ray.data.range -> map_batches) at any scale and
any partitioning and always yields identical rows — which is also what
makes retries and resume safe.

conv sizes follow a Zipf-ish distribution so a few conversations are hot
(exercises the salted repartition / skew path, SURVEY.md §4).
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

_ROLES = ("user", "assistant", "tool")
_TOOLS = ("search", "calculator", "browser", "code")

ENTITY_NAMES = [
    "Alice Liddell", "Bob Dylan", "Carol Danvers", "Dave Grohl",
    "Eve Online", "Frank Ocean", "Grace Hopper", "Heidi Klum",
    "Ivan Drago", "Judy Garland", "Socrates", "Aristotle",
    "Marie Curie", "Alan Turing", "Ada Lovelace", "Tim Berners-Lee",
]

_EPOCH_US = 1_700_000_000_000_000  # fixed base epoch; never wall clock

# N3 document templates covering the reader feature matrix (FIXTURES.md §1).
# {e} = entity name literal, {k} = small int, {p} = pname-safe token.
_N3_TEMPLATES = [
    '@prefix : <http://example.org/kg#> .\n:{p}{k} a :Person ; :name "{e}" ; :age {k} .',
    '@prefix : <http://example.org/kg#> .\n:{p}{k} :knows :{p}{j} , :{p}{i} ; :score {k}.5 .',
    '@prefix : <http://example.org/kg#> .\n:msg{k} :author [ :name "{e}" ; :id {k} ] .',
    '@prefix : <http://example.org/kg#> .\n:{p}{k} :tags ( "alpha" "beta" :{p}{j} ) .',
    '@prefix : <http://example.org/kg#> .\n{{ :{p}{k} a :Man }} => {{ :{p}{k} a :Mortal }} .',
    '@prefix : <http://example.org/kg#> .\n:{p}{k} = :{p}{j} . :{p}{j} :label "{e}"@en .',
    '@prefix : <http://example.org/kg#> .\n:doc{k}!:author :name "{e}" .',
    '@prefix : <http://example.org/kg#> .\n:{p}{k} is :parent of :{p}{j} ; has :child :{p}{i} .',
    'PREFIX ex: <http://example.org/kg#>\nex:{p}{k} ex:val {k}.25 ; ex:flag true ; ex:when "2024-0{m}-01"^^<http://www.w3.org/2001/XMLSchema#date> .',
    '@prefix : <http://example.org/kg#> .\n_:x{k} :says "{e} met {f}" ; :conf {k}e-2 .',
    '@prefix : <http://example.org/kg#> .\n[ id :{p}{k} :note """multi\nline about {e}""" ] .',
    '@prefix : <http://example.org/kg#> .\n:{p}{k} :path :a^:b ; :rel ?who .',
]

_MALFORMED = [
    '@prefix : <http://example.org/kg#> .\n:{p}{k} :broken "unterminated .',
    ':{p}{k} ::: !!! .',
    '@prefix missing-iri .\n:{p}{k} :x :y .',
    '@prefix : <http://example.org/kg#> .\n:{p}{k} :open [ :q :r .',
    '@prefix : <http://example.org/kg#> .\n{{ :a :b :c . :{p}{k} :y .',
]

_PROSE = [
    "I think {e} wrote about this in the report. Can you check with {f}?",
    "Summarize what {e} said regarding the {p} project budget of {k} dollars.",
    "{e} and {f} met yesterday; the tool returned {k} results.",
    "No structured data here, just chatting about {e}.",
]


def _h(seed: int, *parts) -> int:
    data = ("|".join(str(p) for p in parts) + f"|{seed}").encode()
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "big")


def conv_sizes(n_convs: int, turns_per_conv: int, seed: int = 42) -> np.ndarray:
    """Zipf-ish (s=1.2) per-conversation turn counts normalized so the
    total is ~ n_convs * turns_per_conv; computed on the driver (cheap),
    broadcast to generator tasks."""
    ranks = np.arange(1, n_convs + 1, dtype=np.float64)
    w = ranks ** -1.2
    w /= w.sum()
    sizes = np.maximum(1, np.round(w * n_convs * turns_per_conv)).astype(np.int64)
    # deterministic shuffle so hot convs aren't all at the front
    rng = np.random.default_rng(seed)
    rng.shuffle(sizes)
    return sizes


def make_turn_text(seed: int, conv: int, turn: int) -> str:
    h = _h(seed, conv, turn)
    e = ENTITY_NAMES[h % len(ENTITY_NAMES)]
    f = ENTITY_NAMES[(h >> 8) % len(ENTITY_NAMES)]
    k = h % 97
    j, i, m = (h >> 4) % 89, (h >> 12) % 83, 1 + h % 9
    p = ["node", "item", "ent", "thing"][h % 4]
    sel = h % 100
    if sel < 5:
        tmpl = _MALFORMED[h % len(_MALFORMED)]
    elif sel < 15:
        tmpl = _PROSE[h % len(_PROSE)]
    else:
        tmpl = _N3_TEMPLATES[h % len(_N3_TEMPLATES)]
    return tmpl.format(e=e, f=f, k=k, j=j, i=i, m=m, p=p)


def gen_rows(
    global_idx: np.ndarray, offsets: np.ndarray, seed: int = 42
) -> pa.Table:
    """Generate transcript rows for the given global row indexes.

    `offsets` = cumulative conv size boundaries (len n_convs+1); turn
    assignment via searchsorted, so any index range maps to rows without
    coordination — the generator is embarrassingly parallel.
    """
    idx = np.asarray(global_idx, dtype=np.int64)
    conv = np.searchsorted(offsets, idx, side="right") - 1
    turn = (idx - offsets[conv]).astype(np.int32)
    conv_ids = [f"conv-{c:06d}" for c in conv]
    roles, texts, tools, tss = [], [], [], []
    for c, t in zip(conv, turn):
        h = _h(seed, c, t)
        role = _ROLES[t % 3]
        roles.append(role)
        texts.append(make_turn_text(seed, c, t))
        tools.append(_TOOLS[h % len(_TOOLS)] if role == "tool" else None)
        tss.append(_EPOCH_US + int(c) * 3_600_000_000 + int(t) * 30_000_000)
    return pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(tss, pa.timestamp("us")),
        }
    )


def transcripts_dataset(
    n_convs: int = 100,
    turns_per_conv: int = 10,
    seed: int = 42,
    override_num_blocks: int | None = None,
):
    """Distributed deterministic transcript Dataset.

    ray.data.range supplies the global index; a stateless map_batches
    materializes rows from it.  Boundaries are tiny (n_convs int64) and
    ship in the task closure (broadcast-once semantics via Ray's
    serialized task payload).
    """
    import ray.data as rd

    sizes = conv_sizes(n_convs, turns_per_conv, seed)
    offsets = np.concatenate([[0], np.cumsum(sizes)])
    total = int(offsets[-1])

    def gen(batch: pa.Table) -> pa.Table:
        return gen_rows(batch.column("id").to_numpy(), offsets, seed)

    ds = rd.range(total, override_num_blocks=override_num_blocks)
    return ds.map_batches(gen, batch_format="pyarrow")


def entity_table(seed: int = 42) -> pa.Table:
    """Entity-link lookup table (FIXTURES.md §5): mention_norm ->
    canonical IRI + deterministic score.  Small; broadcast via ray.put."""
    rows = []
    for i, name in enumerate(ENTITY_NAMES):
        norm = name.lower().strip()
        h = _h(seed, "entity", norm)
        rows.append(
            {
                "mention_norm": norm,
                "canonical_iri": f"http://example.org/entity/{name.replace(' ', '_')}",
                "score": round(0.5 + (h % 500) / 1000.0, 3),
            }
        )
    return pa.Table.from_pylist(rows)
