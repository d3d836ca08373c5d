"""Mention detection + entity-link scoring (north-rule stage).

No reference counterpart (SURVEY.md §2.4): this is the KG-construction
addition.  Two sub-stages:

- ``MentionDetect``: vectorized regex scan of turn text for capitalized
  surface forms -> (conv_id, turn_idx, mention, mention_norm) rows.
- ``LinkScore``: an actor-pool stage holding the (broadcast) entity
  alias index; looks up each normalized mention and emits link triples
  ``<urn:turn:conv:idx> ex:mentions <canonical_iri>`` plus a score.

The entity table is small (FIXTURES.md §5) so it is broadcast once via
``ray.put`` on the driver and fetched in each actor's ``__init__`` —
never re-shipped per batch and never shuffled (SURVEY.md §2.5).
"""
from __future__ import annotations

import re

import pyarrow as pa

MENTIONS_PRED = "<http://example.org/kg#mentions>"

_MENTION_RE = re.compile(r"\b(?:[A-Z][a-z]+(?:[ -][A-Z][a-z]+)+|[A-Z][a-z]{3,})\b")

LINK_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("graph", pa.string()),
        ("score", pa.float32()),
    ]
)


def detect_mentions(batch: pa.Table) -> pa.Table:
    conv = batch.column("conv_id").to_pylist()
    turn = batch.column("turn_idx").to_pylist()
    texts = batch.column("text").to_pylist()
    out_c, out_t, out_m, out_n = [], [], [], []
    for c, t, text in zip(conv, turn, texts):
        if not text:
            continue
        seen = set()
        for m in _MENTION_RE.findall(text):
            norm = m.lower().strip()
            if norm in seen:
                continue
            seen.add(norm)
            out_c.append(c)
            out_t.append(t)
            out_m.append(m)
            out_n.append(norm)
    return pa.table(
        {
            "conv_id": pa.array(out_c, pa.string()),
            "turn_idx": pa.array(out_t, pa.int32()),
            "mention": pa.array(out_m, pa.string()),
            "mention_norm": pa.array(out_n, pa.string()),
        }
    )


class LinkScore:
    """Actor-pool stage: alias index loaded once per actor from a
    broadcast object-store ref (or a plain table for tests)."""

    def __init__(self, entity_ref=None, entities: pa.Table | None = None):
        if entities is None:
            import ray

            entities = ray.get(entity_ref)
        self.index: dict[str, tuple[str, float]] = {
            r["mention_norm"]: (r["canonical_iri"], r["score"])
            for r in entities.to_pylist()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv = batch.column("conv_id").to_pylist()
        turn = batch.column("turn_idx").to_pylist()
        norms = batch.column("mention_norm").to_pylist()
        oc, ot, os_, op, oo, og, osc = [], [], [], [], [], [], []
        for c, t, n in zip(conv, turn, norms):
            hit = self.index.get(n)
            if hit is None:
                continue
            iri, score = hit
            oc.append(c)
            ot.append(t)
            os_.append(f"<urn:turn:{c}:{t}>")
            op.append(MENTIONS_PRED)
            oo.append(f"<{iri}>")
            og.append(None)
            osc.append(score)
        return pa.table(
            {
                "conv_id": pa.array(oc, pa.string()),
                "turn_idx": pa.array(ot, pa.int32()),
                "subj": pa.array(os_, pa.string()),
                "pred": pa.array(op, pa.string()),
                "obj": pa.array(oo, pa.string()),
                "graph": pa.array(og, pa.string()),
                "subj_kind": pa.array([0] * len(oc), pa.int8()),
                "obj_kind": pa.array([0] * len(oc), pa.int8()),
                "score": pa.array(osc, pa.float32()),
            }
        )


def link_entities(transcripts_ds, entities: pa.Table, concurrency=(1, 4), batch_size: int | None = None):
    """transcripts -> mention rows -> link triples (with scores).

    The entity table ships inside the actor constructor spec (pickled
    once per actor).  NOT via ray.put: a put ref held as a constructor
    argument outlives its owner when the dataset finishes, and actor
    restarts then wedge the next pipeline in the session
    (ray issue #53727).  For an entity table too big to pickle per
    actor, switch to a named detached owner or re-put per job instead.
    """
    mentions = transcripts_ds.map_batches(
        detect_mentions, batch_format="pyarrow", batch_size=batch_size
    )
    return mentions.map_batches(
        LinkScore,
        fn_constructor_kwargs={"entities": entities},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
