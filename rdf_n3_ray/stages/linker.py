"""Mention detection + entity-linking vocabulary (north-rule stage).

No reference counterpart (SURVEY.md §2.4): this is the KG-construction
addition.  The actual linking runs FUSED inside the extract stage
(stages/extract.py ExtractTurnKG) so the transcript is scanned exactly
once per row; this module owns the shared pieces:

- ``_MENTION_RE``: capitalized-surface-form scanner over turn text.
- ``MENTIONS_PRED``: the link predicate
  (``<urn:turn:conv:idx> ex:mentions <canonical_iri>``).
- ``entity_index_from_table`` (stages/extract.py) builds the
  mention->IRI lookup; the entity table is small, so it ships pickled
  in the actor constructor spec — once per worker, never per batch and
  never shuffled (SURVEY.md §2.5).  A ray.put ref would be the
  alternative for a larger table, but a put ref held as a constructor
  argument outlives its owner when the dataset finishes and wedges
  actor restarts in long sessions (ray issue #53727).
"""
from __future__ import annotations

import re

MENTIONS_PRED = "<http://example.org/kg#mentions>"

_MENTION_RE = re.compile(
    r"\b(?:[A-Z][a-z]+(?:[ -][A-Z][a-z]+)+|[A-Z][a-z]{3,})\b")
